import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.geometry import AnchorConfig, anchors_for_shape
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh, shard_batch
from pyrapose_tpu.train import (
    create_train_state,
    get_learning_rate,
    make_sharded_train_step,
    set_learning_rate,
    train_step,
)
from pyrapose_tpu.train.schedule import ReduceLROnPlateau

H, W = 64, 64
C = 2
CFG = ModelConfig(num_classes=C, compute_dtype="float32")
N = AnchorConfig().num_anchors((H, W))
P3 = 8 * 8


def _fake_batch(rng, batch=2):
    anchors = anchors_for_shape((H, W))
    labels = np.zeros((batch, N, C + 1), np.float32)
    reg = np.zeros((batch, N, 17), np.float32)
    mask = np.zeros((batch, P3, C + 1), np.float32)
    for b in range(batch):
        pos = rng.choice(N, 20, replace=False)
        labels[b, pos, rng.integers(0, C)] = 1.0
        labels[b, pos, -1] = 1.0
        reg[b, pos, :16] = rng.normal(0, 1, (20, 16))
        reg[b, pos, -1] = 1.0
        mpix = rng.choice(P3, 30, replace=False)
        mask[b, mpix, 0] = 1.0
        mask[b, mpix, -1] = 1.0
    del anchors
    return {
        "images": rng.normal(0, 1, (batch, H, W, 3)).astype(np.float32),
        "labels": labels,
        "regression": reg,
        "mask": mask,
    }


@pytest.fixture(scope="module")
def state():
    return create_train_state(jax.random.PRNGKey(0), CFG, image_shape=(H, W))


class TestTrainStep:
    def test_loss_decreases(self, state, rng):
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        step = jax.jit(train_step)
        s = state
        losses = []
        for _ in range(8):
            s, parts = step(s, batch)
            losses.append(float(parts["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    def test_frozen_stem_not_updated(self, state, rng):
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        s2, _ = jax.jit(train_step)(state, batch)
        stem_before = np.asarray(state.params["backbone"]["stem_conv"]["kernel"])
        stem_after = np.asarray(s2.params["backbone"]["stem_conv"]["kernel"])
        np.testing.assert_array_equal(stem_before, stem_after)
        # but a head does update
        head_before = np.asarray(state.params["cls_head"]["out"]["kernel"])
        head_after = np.asarray(s2.params["cls_head"]["out"]["kernel"])
        assert np.abs(head_after - head_before).max() > 0

    def test_clipnorm_bounds_updates(self, state, rng):
        """Per-leaf clipnorm 1e-3 with lr 1e-5 bounds each param delta."""
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        s2, _ = jax.jit(train_step)(state, batch)
        for path, before, after in [
            (
                "cls_head.out.kernel",
                state.params["cls_head"]["out"]["kernel"],
                s2.params["cls_head"]["out"]["kernel"],
            )
        ]:
            # adam step magnitude <= lr * ~1 per coordinate regardless of grad
            delta = np.abs(np.asarray(after) - np.asarray(before)).max()
            assert delta < 5e-5, f"{path} moved {delta}"

    def test_set_learning_rate(self, state):
        assert get_learning_rate(state) == pytest.approx(1e-5)
        s2 = set_learning_rate(state, 1e-6)
        assert get_learning_rate(s2) == pytest.approx(1e-6)


class TestPlateau:
    def test_reduces_after_patience(self):
        sched = ReduceLROnPlateau(patience=2, verbose=False)
        lr = 1e-5
        lr = sched.update(1.0, lr)  # best = 1.0
        lr = sched.update(1.0, lr)  # wait 1
        lr = sched.update(1.0, lr)  # wait 2
        assert lr == pytest.approx(1e-5)
        lr = sched.update(1.0, lr)  # wait 3 > patience -> reduce
        assert lr == pytest.approx(1e-6)

    def test_improvement_resets(self):
        sched = ReduceLROnPlateau(patience=2, verbose=False)
        lr = 1e-5
        lr = sched.update(1.0, lr)
        lr = sched.update(1.0, lr)
        lr = sched.update(0.5, lr)  # improvement
        lr = sched.update(0.5, lr)
        lr = sched.update(0.5, lr)
        assert lr == pytest.approx(1e-5)

    def test_min_lr_floor(self):
        sched = ReduceLROnPlateau(patience=0, min_lr=1e-7, verbose=False)
        lr = 1e-6
        for _ in range(5):
            lr = sched.update(1.0, lr)
        assert lr == pytest.approx(1e-7)


class TestCosine:
    def test_warmup_then_anneal(self):
        from pyrapose_tpu.train.schedule import cosine_lr

        base, total, warm = 3e-4, 100, 3
        # linear warmup
        assert cosine_lr(base, 0, total, warm) == pytest.approx(base / 3)
        assert cosine_lr(base, 1, total, warm) == pytest.approx(2 * base / 3)
        assert cosine_lr(base, 2, total, warm) == pytest.approx(base)
        # monotone decay after warmup, ending ~min_lr
        lrs = [cosine_lr(base, e, total, warm) for e in range(warm, total)]
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))
        assert lrs[0] == pytest.approx(base)
        assert lrs[-1] == pytest.approx(1e-7, rel=1e-3)

    def test_pure_function_of_epoch(self):
        # restart-safety: no carried state, same epoch -> same LR
        from pyrapose_tpu.train.schedule import cosine_lr

        assert cosine_lr(1e-3, 40, 80, 5) == cosine_lr(1e-3, 40, 80, 5)

    def test_no_warmup(self):
        from pyrapose_tpu.train.schedule import cosine_lr

        assert cosine_lr(1e-3, 0, 10, 0) == pytest.approx(1e-3)


# Sharded-step tests run in a SUBPROCESS with the cpu-mesh environment from
# __graft_entry__.cpu_mesh_env: N-device virtual CPU mesh, single-threaded
# Eigen, raised collective rendezvous deadlines (the root-cause fix for the
# historical single-core SIGABRT flake), CPU-feature-keyed compile cache.
# The tiny resnet10 backbone keeps the subprocess compile short; the driver
# covers the full-size model.
_SHARD_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
import jax.numpy as jnp
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh, shard_batch
from pyrapose_tpu.train import create_train_state, make_sharded_train_step

H = W = 64
C = 2
cfg = ModelConfig(num_classes=C, backbone="resnet10", compute_dtype="float32")
state = create_train_state(jax.random.PRNGKey(0), cfg, image_shape=(H, W))
batch = json.loads(open({batch_path!r}).read())
batch = {{k: np.asarray(v, np.float32) for k, v in batch.items()}}
mesh = create_mesh()
assert jax.device_count() == 8
step = make_sharded_train_step(mesh, donate=False)
s2, parts = step(state, shard_batch(batch, mesh))
leaf = s2.params["cls_head"]["out"]["kernel"]
out = {{
    "loss": float(parts["loss"]),
    "replicated": bool(leaf.sharding.is_fully_replicated),
    "kernel": np.asarray(leaf).tolist(),
}}
open({out_path!r}, "w").write(json.dumps(out))
"""


def _run_sharded_subprocess(tmp_path, batch_np) -> dict:
    import json
    import subprocess
    import sys

    import __graft_entry__ as ge

    batch_path = str(tmp_path / "batch.json")
    out_path = str(tmp_path / "out.json")
    with open(batch_path, "w") as f:
        json.dump({k: np.asarray(v).tolist() for k, v in batch_np.items()}, f)
    script = _SHARD_SCRIPT.format(batch_path=batch_path, out_path=out_path)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env = ge.cpu_mesh_env(8, base_env=env)
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert proc.returncode == 0, f"sharded subprocess failed:\n{proc.stderr[-3000:]}"
    with open(out_path) as f:
        return json.load(f)


SHARD_CFG = ModelConfig(num_classes=C, backbone="resnet10", compute_dtype="float32")


class TestShardedStep:
    def test_dp_over_8_devices_and_matches_single(self, rng, tmp_path):
        """DP over an 8-device mesh runs, keeps params replicated, and its
        gradient all-reduce reproduces the big-batch single-device step."""
        batch_np = _fake_batch(rng, batch=8)
        result = _run_sharded_subprocess(tmp_path, batch_np)
        assert np.isfinite(result["loss"])
        assert result["replicated"]

        state = create_train_state(
            jax.random.PRNGKey(0), SHARD_CFG, image_shape=(H, W)
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        s_single, parts_single = jax.jit(train_step)(state, batch)
        assert result["loss"] == pytest.approx(
            float(parts_single["loss"]), rel=1e-5
        )
        a = np.asarray(result["kernel"], np.float32)
        b = np.asarray(s_single.params["cls_head"]["out"]["kernel"])
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestFreezeStopGradient:
    def test_frozen_leaves_unchanged_others_move(self, rng):
        """freeze_stem stop-gradients stem/stage1: their params stay put,
        trainable leaves update (reference models/resnet.py:100-103)."""
        batch_np = _fake_batch(rng, batch=2)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        cfg = ModelConfig(num_classes=C, backbone="resnet10",
                          compute_dtype="float32")
        state = create_train_state(
            jax.random.PRNGKey(0), cfg, image_shape=(H, W),
            freeze_backbone_stem=True,
        )
        assert state.freeze_stem
        s2, _ = jax.jit(train_step)(state, batch)
        bb0, bb1 = state.params["backbone"], s2.params["backbone"]
        stem_keys = [k for k in bb0 if k.startswith(("stem", "stage1"))]
        assert stem_keys
        for k in stem_keys:
            np.testing.assert_array_equal(
                np.asarray(jax.tree_util.tree_leaves(bb0[k])[0]),
                np.asarray(jax.tree_util.tree_leaves(bb1[k])[0]),
            )
        later = [k for k in bb0 if not k.startswith(("stem", "stage1"))]
        moved = any(
            not np.array_equal(
                np.asarray(jax.tree_util.tree_leaves(bb0[k])[0]),
                np.asarray(jax.tree_util.tree_leaves(bb1[k])[0]),
            )
            for k in later
        )
        assert moved

    def test_freeze_backbone_freezes_whole_backbone(self, rng):
        """--freeze-backbone semantics (reference bin/train.py:72-74): EVERY
        backbone leaf stays put, heads still train. Regression test for the
        round-1 flag inversion (`not args.freeze_backbone`)."""
        batch_np = _fake_batch(rng, batch=2)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        cfg = ModelConfig(num_classes=C, backbone="resnet10",
                          compute_dtype="float32")
        state = create_train_state(
            jax.random.PRNGKey(0), cfg, image_shape=(H, W),
            freeze_backbone_stem=True, freeze_backbone=True,
        )
        assert state.freeze_backbone
        s2, _ = jax.jit(train_step)(state, batch)
        bb0 = jax.tree_util.tree_leaves(state.params["backbone"])
        bb1 = jax.tree_util.tree_leaves(s2.params["backbone"])
        for a, b in zip(bb0, bb1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        head_before = np.asarray(state.params["cls_head"]["out"]["kernel"])
        head_after = np.asarray(s2.params["cls_head"]["out"]["kernel"])
        assert np.abs(head_after - head_before).max() > 0

    def test_cli_flag_wires_full_backbone_freeze(self):
        """The train CLI passes --freeze-backbone through as a FULL backbone
        freeze on top of the always-on stem freeze (not inverted)."""
        import inspect

        from pyrapose_tpu.cli import train as cli_train

        src = inspect.getsource(cli_train.run_train)
        assert "freeze_backbone=args.freeze_backbone" in src
        # stem freeze defaults ON; only the explicit --no-freeze-stem flag
        # (from-scratch training) lifts it
        assert 'freeze_backbone_stem=not getattr(args, "no_freeze_stem"' in src
        assert "not args.freeze_backbone" not in src


class TestLiveBatchNorm:
    """--train-bn: frozen_bn=False trains with live (sync) BatchNorm."""

    def test_batch_stats_update_and_loss_finite(self, rng):
        cfg = ModelConfig(num_classes=C, compute_dtype="float32",
                          frozen_bn=False)
        s = create_train_state(jax.random.PRNGKey(0), cfg, image_shape=(H, W))
        assert s.train_bn
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        step = jax.jit(train_step)
        stats0 = jax.tree_util.tree_map(np.asarray, s.batch_stats)
        s2, parts = step(s, batch)
        assert np.isfinite(float(parts["loss"]))
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            s2.batch_stats, stats0,
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0, (
            "live BN did not update running statistics"
        )

    def test_frozen_default_keeps_stats(self, state, rng):
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        s2, _ = jax.jit(train_step)(state, batch)
        same = jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            s2.batch_stats, state.batch_stats,
        )
        assert all(jax.tree_util.tree_leaves(same))

    def test_cli_flag_wires_frozen_bn_off(self):
        from pyrapose_tpu.cli.main import build_parser

        args = build_parser().parse_args(
            ["train", "synthetic", "--train-bn"]
        )
        assert args.train_bn


class TestHeadL2:
    def test_zero_coefficient_removes_term(self, rng):
        s1 = create_train_state(jax.random.PRNGKey(0), CFG, image_shape=(H, W))
        s0 = create_train_state(jax.random.PRNGKey(0), CFG, image_shape=(H, W),
                                head_l2=0.0)
        batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
        _, p1 = jax.jit(train_step)(s1, batch)
        _, p0 = jax.jit(train_step)(s0, batch)
        # parts exclude the L2 term (it is loss-only), so both agree...
        assert float(p1["loss"]) == pytest.approx(float(p0["loss"]), rel=1e-6)
        # ...but the L2 gradient is present only with the coefficient on
        import flax.traverse_util as tu

        g1 = tu.flatten_dict(s1.params)
        # after many steps with NO positive regression targets, head_l2>0
        # shrinks the box tower while head_l2=0 leaves it (the failure mode
        # that paralyzed from-scratch training)
        empty = dict(batch)
        labels = np.asarray(batch["labels"]).copy(); labels[:] = 0
        reg = np.asarray(batch["regression"]).copy(); reg[:] = 0
        empty["labels"] = jnp.asarray(labels)
        empty["regression"] = jnp.asarray(reg)
        step = jax.jit(train_step)
        for _ in range(5):
            s1, _ = step(s1, empty)
            s0, _ = step(s0, empty)
        k = ("box3d_head", "tower", "conv0", "kernel")
        n_init = float(np.linalg.norm(np.asarray(g1[k])))
        n1 = float(np.linalg.norm(np.asarray(tu.flatten_dict(s1.params)[k])))
        n0 = float(np.linalg.norm(np.asarray(tu.flatten_dict(s0.params)[k])))
        assert n1 < n_init  # regularized: shrinking
        assert abs(n0 - n_init) < abs(n1 - n_init)  # unregularized: stabler

    def test_cli_flag(self):
        from pyrapose_tpu.cli.main import build_parser

        args = build_parser().parse_args(
            ["train", "synthetic", "--head-l2", "0"]
        )
        assert args.head_l2 == 0.0
