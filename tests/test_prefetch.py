"""Async input pipeline: host prefetcher, device prefetch, fused train step.

Round-1 VERDICT gap #5: the train loop was fully synchronous with a
device->numpy->device round trip. The pipeline contract tested here:
determinism (worker-count independent ordering), correct sharding, and the
fused on-device target generation reproducing the unfused step exactly.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrapose_tpu.data import (
    LINEMOD_SPEC,
    PipelineConfig,
    SyntheticPoseDataset,
    make_target_fn,
    preprocess_images,
)
from pyrapose_tpu.data.prefetch import HostPrefetcher, device_prefetch
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh
from pyrapose_tpu.train import create_train_state, train_step
from pyrapose_tpu.train.step import make_fused_train_step

H = W = 64
SPEC = dataclasses.replace(LINEMOD_SPEC, image_shape=(H, W))


def _dataset(n=12):
    return SyntheticPoseDataset(SPEC, num_images=n, max_instances=4, seed=0)


class TestHostPrefetcher:
    def test_order_matches_schedule_any_worker_count(self):
        ds = _dataset()
        schedule = [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]]
        direct = [ds.batch(idx) for idx in schedule]
        for workers in (1, 3):
            loader = HostPrefetcher(ds, 2, schedule=schedule,
                                    num_workers=workers)
            got = list(loader)
            assert len(got) == len(schedule)
            for (di, dg), (gi, gg) in zip(direct, got):
                np.testing.assert_array_equal(di, gi)
                np.testing.assert_array_equal(dg.labels, gg.labels)

    def test_default_schedule_covers_dataset(self):
        ds = _dataset(10)
        loader = HostPrefetcher(ds, 4)
        assert len(loader) == 2  # 10 // 4 full batches

    def test_worker_exception_propagates(self):
        class Boom:
            def __len__(self):
                return 4

            def batch(self, idx):
                raise RuntimeError("decode failed")

        loader = HostPrefetcher(Boom(), 2, schedule=[[0, 1]])
        with pytest.raises(RuntimeError, match="decode failed"):
            list(loader)


class TestDevicePrefetch:
    def test_values_and_sharding(self):
        ds = _dataset(8)
        mesh = create_mesh()
        schedule = [[0, 1, 2, 3, 4, 5, 6, 7]]
        loader = HostPrefetcher(ds, 8, schedule=schedule)
        batches = list(device_prefetch(loader, mesh, depth=2))
        assert len(batches) == 1
        images, gt = batches[0]
        assert isinstance(images, jax.Array)
        # sharded over the data axis
        assert images.sharding.spec == jax.sharding.PartitionSpec("data")
        direct_images, _ = ds.batch(schedule[0])
        np.testing.assert_array_equal(np.asarray(images), direct_images)


class TestFusedStep:
    def test_fused_matches_unfused(self):
        """Fused on-device preprocessing+targets+step == the separate
        target-fn + train_step path, bit for bit on CPU."""
        ds = _dataset(4)
        pipe = PipelineConfig(image_shape=(H, W), max_instances=4,
                              num_classes=SPEC.num_classes)
        config = ModelConfig(num_classes=SPEC.num_classes, backbone="resnet10",
                             compute_dtype="float32")
        images_u8, gt = ds.batch([0, 1])

        # unfused reference path
        state0 = create_train_state(jax.random.PRNGKey(0), config,
                                    image_shape=(H, W))
        target_fn = make_target_fn(SPEC.corners3d, pipe)
        targets = target_fn(jax.tree_util.tree_map(jnp.asarray, gt))
        batch = {
            "images": preprocess_images(jnp.asarray(images_u8)),
            "labels": targets.labels,
            "regression": targets.regression,
            "mask": targets.mask,
        }
        s_ref, parts_ref = jax.jit(train_step)(state0, batch)

        # fused path on a 1-device mesh
        state1 = create_train_state(jax.random.PRNGKey(0), config,
                                    image_shape=(H, W))
        mesh = create_mesh(jax.devices()[:1])
        fused = make_fused_train_step(mesh, SPEC.corners3d, pipe, donate=False)
        s_fused, parts_fused = fused(
            state1, jnp.asarray(images_u8),
            jax.tree_util.tree_map(jnp.asarray, gt),
        )
        assert float(parts_fused["loss"]) == pytest.approx(
            float(parts_ref["loss"]), rel=1e-6
        )
        a = np.asarray(s_fused.params["cls_head"]["out"]["kernel"])
        b = np.asarray(s_ref.params["cls_head"]["out"]["kernel"])
        np.testing.assert_allclose(a, b, atol=1e-7)


class TestTrainCli:
    def test_synthetic_train_with_eval_and_metrics(self, tmp_path):
        """pyrapose train synthetic --eval-every 1 records per-epoch loss and
        val recall to metrics.jsonl (reference per-epoch Evaluate callback +
        the TB slot it never wired, callbacks/eval.py:21-97)."""
        import json

        from pyrapose_tpu.cli.main import build_parser
        from pyrapose_tpu.cli.train import run_train

        snap = str(tmp_path / "snap")
        args = build_parser().parse_args(
            [
                "train", "synthetic",
                "--backbone", "resnet10",
                "--batch-size", "2",
                "--epochs", "1",
                "--steps-per-epoch", "2",
                "--image-min-side", "64",
                "--image-max-side", "64",
                "--snapshot-path", snap,
                "--eval-every", "1",
                "--eval-samples", "4",
                "--workers", "2",
            ]
        )
        assert run_train(args) == 0
        lines = [
            json.loads(ln)
            for ln in open(str(tmp_path / "snap" / "metrics.jsonl"))
        ]
        assert len(lines) == 1
        rec = lines[0]
        assert np.isfinite(rec["loss"])
        assert "val_recall" in rec and "img_s" in rec

    def test_custom_anchor_ini_roundtrips_through_eval(self, tmp_path):
        """--config custom.ini + --eval-every: the in-training eval must build
        the SAME anchor layout as training (round-1 regression: _run_eval
        dropped the override, so a non-default anchor count crashed/mis-decoded
        the validation pass)."""
        import json

        from pyrapose_tpu.cli.main import build_parser
        from pyrapose_tpu.cli.train import run_train

        ini = tmp_path / "anchors.ini"
        ini.write_text(
            "[anchor_parameters]\n"
            "sizes   = 32 64 128\n"
            "strides = 8 16 32\n"
            "ratios  = 0.5 2\n"
            "scales  = 1 1.3\n"
        )
        snap = str(tmp_path / "snap")
        args = build_parser().parse_args(
            [
                "train", "synthetic",
                "--backbone", "resnet10",
                "--batch-size", "2",
                "--epochs", "1",
                "--steps-per-epoch", "2",
                "--image-min-side", "64",
                "--image-max-side", "64",
                "--snapshot-path", snap,
                "--eval-every", "1",
                "--eval-samples", "2",
                "--workers", "1",
                "--config", str(ini),
            ]
        )
        assert run_train(args) == 0
        rec = json.loads(
            open(str(tmp_path / "snap" / "metrics.jsonl")).readline()
        )
        assert np.isfinite(rec["loss"]) and "val_recall" in rec

    def test_latest_checkpoint_skips_partial_saves(self, tmp_path):
        """A kill mid-save leaves an `*.orbax-checkpoint-tmp` directory;
        --auto-resume must pick the newest COMPLETE checkpoint instead
        (resuming from the partial one hangs/fails)."""
        from pyrapose_tpu.train.checkpoint import latest_checkpoint

        assert latest_checkpoint(str(tmp_path / "nope")) is None
        (tmp_path / "step_00000100").mkdir()
        (tmp_path / "step_00000200.orbax-checkpoint-tmp").mkdir()
        got = latest_checkpoint(str(tmp_path))
        assert got is not None and got.endswith("step_00000100")

    def test_restore_params_resolves_snapshot_dir(self, tmp_path):
        """`pyrapose evaluate <ds> <data> runs/ckpt` (the snapshot DIRECTORY,
        not one step) must resolve to the newest complete step."""
        import jax
        import jax.numpy as jnp

        from pyrapose_tpu.train.checkpoint import (
            restore_params,
            save_checkpoint,
        )
        from pyrapose_tpu.models import ModelConfig
        from pyrapose_tpu.train import create_train_state

        cfg = ModelConfig(
            num_classes=2, backbone="resnet10", compute_dtype="float32"
        )
        state = create_train_state(
            jax.random.PRNGKey(0), cfg, image_shape=(64, 64)
        )
        step_dir = save_checkpoint(state, str(tmp_path))
        # directory form and explicit-step form load the same tree
        p_dir, _ = restore_params(str(tmp_path))
        p_step, _ = restore_params(step_dir)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            p_dir,
            p_step,
        )

    def test_prune_checkpoints_keeps_newest(self, tmp_path):
        """--keep-checkpoints rotation: oldest complete saves go, in-progress
        orbax tmp dirs are never touched, keep<=0 is a no-op."""
        from pyrapose_tpu.train.checkpoint import prune_checkpoints

        for s in (100, 200, 300):
            (tmp_path / f"step_{s:08d}").mkdir()
        (tmp_path / "step_00000400.orbax-checkpoint-tmp").mkdir()
        assert prune_checkpoints(str(tmp_path), 0) == []
        removed = prune_checkpoints(str(tmp_path), 2)
        assert [os.path.basename(p) for p in removed] == ["step_00000100"]
        left = sorted(d for d in os.listdir(tmp_path))
        assert left == [
            "step_00000200",
            "step_00000300",
            "step_00000400.orbax-checkpoint-tmp",
        ]
        assert prune_checkpoints(str(tmp_path / "nope"), 2) == []

    def test_preemption_kill_and_resume_mid_epoch(self, tmp_path):
        """Crash-resume flow (VERDICT r1 item 9): a run stopped by
        --max-steps mid-epoch and restarted with --auto-resume reproduces
        the uninterrupted run's remaining per-step losses exactly (same
        schedule slice, same optimizer state via orbax)."""
        import json

        from pyrapose_tpu.cli.main import build_parser
        from pyrapose_tpu.cli.train import run_train

        def _args(snap, extra=()):
            return build_parser().parse_args(
                [
                    "train", "synthetic",
                    "--backbone", "resnet10",
                    "--batch-size", "2",
                    "--epochs", "1",
                    "--steps-per-epoch", "6",
                    "--image-min-side", "64",
                    "--image-max-side", "64",
                    "--snapshot-path", snap,
                    "--workers", "1",
                    *extra,
                ]
            )

        def _losses(snap):
            return [
                loss
                for ln in open(snap + "/metrics.jsonl")
                for loss in json.loads(ln)["losses"]
            ]

        # uninterrupted run: 6 steps
        full = str(tmp_path / "full")
        assert run_train(_args(full)) == 0
        ref = _losses(full)
        assert len(ref) == 6

        # preempted run: stop at step 3 (mid-epoch), then auto-resume
        pre = str(tmp_path / "pre")
        assert run_train(_args(pre, ["--max-steps", "3"])) == 0
        assert len(_losses(pre)) == 3
        assert run_train(_args(pre, ["--auto-resume"])) == 0
        got = _losses(pre)
        assert len(got) == 6
        for a, b in zip(ref, got):
            assert b == pytest.approx(a, rel=1e-4), (ref, got)

    def test_warm_start_from_finished_run_trains_full_epochs(self, tmp_path):
        """--snapshot WITHOUT --auto-resume is a warm start (reference
        bin/train.py:291 semantics: weights are a starting point, the full
        epoch count trains). Regression: the restored step leaked into the
        epoch arithmetic, so warm-starting from a finished run's checkpoint
        made range(start_epoch, epochs) empty and the run exited 0 having
        trained NOTHING."""
        import json

        from pyrapose_tpu.cli.main import build_parser
        from pyrapose_tpu.cli.train import run_train

        def _args(snap, extra=()):
            return build_parser().parse_args(
                [
                    "train", "synthetic",
                    "--backbone", "resnet10",
                    "--batch-size", "2",
                    "--epochs", "1",
                    "--steps-per-epoch", "2",
                    "--image-min-side", "64",
                    "--image-max-side", "64",
                    "--snapshot-path", snap,
                    "--workers", "1",
                    *extra,
                ]
            )

        pretrain = str(tmp_path / "pretrain")
        assert run_train(_args(pretrain)) == 0  # finishes at step 2
        ckpt = pretrain + "/step_00000002"

        warm = str(tmp_path / "warm")
        assert run_train(_args(warm, ["--snapshot", ckpt])) == 0
        recs = [json.loads(ln) for ln in open(warm + "/metrics.jsonl")]
        assert len(recs) == 1  # the requested epoch actually ran
        assert recs[0]["epoch"] == 1


class TestInitWatchdogHandover:
    def test_run_train_stops_the_import_time_watchdog(self, tmp_path):
        """cli/main.py arms a watchdog BEFORE the train-stack import (a
        wedged TPU attach hangs there, outside the loop watchdog's reach);
        run_train must stop it once the mesh is up — otherwise a slow
        staging/compile phase would be killed as a false stall."""
        from pyrapose_tpu.cli.main import build_parser
        from pyrapose_tpu.cli.train import run_train
        from pyrapose_tpu.watchdog import StallWatchdog

        args = build_parser().parse_args(
            [
                "train", "synthetic",
                "--backbone", "resnet10",
                "--batch-size", "2",
                "--epochs", "1",
                "--steps-per-epoch", "2",
                "--image-min-side", "64",
                "--image-max-side", "64",
                "--snapshot-path", str(tmp_path / "snap"),
                "--workers", "1",
            ]
        )
        wd = StallWatchdog(3600, label="backend-init").start()
        args._init_watchdog = wd
        assert run_train(args) == 0
        assert wd._thread is None  # stopped at handover
        assert not wd.fired


class TestEvalRunnerCaching:
    def test_val_batches_decoded_once_across_evals(self):
        """_EvalRunner must pay host decode + inference-program build once;
        every subsequent in-training eval reuses both (the naive per-eval
        rebuild cost ~minutes of XLA recompilation per eval)."""
        from types import SimpleNamespace

        from pyrapose_tpu.cli.train import _EvalRunner
        from pyrapose_tpu.data.spec import dataset_spec
        from pyrapose_tpu.data.synthetic import SyntheticPoseDataset
        from pyrapose_tpu.models import ModelConfig

        import dataclasses

        spec = dataclasses.replace(
            dataset_spec("linemod", None), image_shape=(64, 64)
        )
        ds = SyntheticPoseDataset(spec, num_images=4, seed=0)
        calls = []
        orig = ds.batch

        def counting_batch(idx, **kw):
            calls.append(list(idx))
            return orig(idx, **kw)

        ds.batch = counting_batch
        args = SimpleNamespace(eval_samples=4, batch_size=2,
                               dataset="synthetic")
        runner = _EvalRunner(
            args, spec, ds, None,
            ModelConfig(num_classes=spec.num_classes, backbone="resnet10"),
        )
        b1 = runner.batches()
        b2 = runner.batches()
        assert b1 is b2
        assert len(calls) == 2  # 4 samples / batch 2, decoded exactly once


def test_warmup_epochs_flag_parses():
    from pyrapose_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["train", "synthetic", "--warmup-epochs", "3", "--lr", "3e-4"]
    )
    assert args.warmup_epochs == 3 and args.lr == 3e-4
