"""End-to-end throughput benchmark: preprocess -> PFPN -> decode -> PnP.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric: img/s/chip at 480x640 with the full inference pipeline on
device (the reference's pipeline is GPU inference + host OpenCV PnP at
batch 1, utils/linemod_eval.py:264-534). Baseline for vs_baseline: the
north-star 2000 img/s on a v5e-8 == 250 img/s/chip (BASELINE.json).

Extras (same JSON object):
- breakdown: network-only vs pose-recovery img/s and the pose stage's share
  of step time (SURVEY §7.3 budget: PnP must stay <= ~10%);
- train_img_s_per_chip: fused training-step throughput (fwd+bwd+optimizer
  with on-device target generation, train/step.py make_fused_train_step);
- model_tflops + mfu_pct: per-image forward FLOPs from XLA cost analysis and
  the achieved fraction of the chip's peak (v5e bf16 = 197 TFLOP/s).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)

import jax

# honor JAX_PLATFORMS even when a sitecustomize pre-imported jax and
# registered a remote-TPU backend (then the env var alone is a no-op):
# without this, the "CPU" bench smoke subprocess actually runs on the real
# chip — and its quiesce path gracefully STOPs any live trainer it finds
# (this stopped a live flagship training run once; never again)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from pyrapose_tpu.data import LINEMOD_SPEC, PipelineConfig
from pyrapose_tpu.inference import build_inference_fn
from pyrapose_tpu.models import ModelConfig, PyraPose

BASELINE_IMG_S_PER_CHIP = 250.0  # north star: 2000 img/s on v5e-8


class _Budget(Exception):
    """Raised between optional bench arms when the wall-clock budget is
    spent; skips the remaining arms but keeps everything measured so far."""

# bf16 peak matmul throughput per chip, for the MFU estimate.
_PEAK_TFLOPS = {
    "v5 lite": 197.0,  # TPU v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,  # trillium
}


def _peak_tflops() -> float | None:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, val in _PEAK_TFLOPS.items():
        if key in kind:
            return val
    return None


def _time(fn, args, iters, warmup, ready):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(ready(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(ready(out))
    return (time.perf_counter() - t0) / iters


def _bench_host_loader(n_frames: int = 24) -> dict:
    """Decode+augment throughput of the BOP loader on noise PNGs (worst-case
    decode entropy), single-threaded, plus the --cache-images steady state."""
    import json as _json
    import tempfile

    from PIL import Image

    from pyrapose_tpu.data.augment import AugmentConfig
    from pyrapose_tpu.data.datasets import create_dataset
    from pyrapose_tpu.data.spec import dataset_spec

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        ann_dir = os.path.join(root, "annotations")
        img_dir = os.path.join(root, "images", "train")
        os.makedirs(ann_dir)
        os.makedirs(img_dir)
        info = {
            "1": dict(diameter=150.0, min_x=-50, min_y=-50, min_z=-50,
                      size_x=100, size_y=100, size_z=100)
        }
        with open(os.path.join(ann_dir, "models_info.json"), "w") as f:
            _json.dump(info, f)
        images, annotations = [], []
        for i in range(n_frames):
            stem = f"{i:06d}"
            Image.fromarray(
                rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
            ).save(os.path.join(img_dir, stem + "_rgb.png"))
            mask = np.zeros((480, 640), np.uint8)
            mask[200:280, 280:360] = 1
            Image.fromarray(mask).save(os.path.join(img_dir, stem + "_mask.png"))
            images.append(dict(
                id=i, file_name=stem + ".png", width=640, height=480,
                fx=572.4114, fy=573.57043, cx=325.2611, cy=242.04899,
            ))
            annotations.append(dict(
                id=i, image_id=i, category_id=1,
                bbox=[280, 200, 80, 80],
                pose=[0.0, 0.0, 900.0, 1.0, 0.0, 0.0, 0.0],
                mask_id=1, feature_visibility=1.0,
            ))
        with open(os.path.join(ann_dir, "instances_train.json"), "w") as f:
            _json.dump(dict(images=images, annotations=annotations), f)

        dataset_spec.cache_clear()
        out = {}
        for key, cache in (("loader_img_s_per_core", 0),
                           ("loader_cached_img_s_per_core", 1 << 32)):
            ds = create_dataset(
                "homebrewed", root, spec=None, augment=AugmentConfig(),
                cache_bytes=cache,
            )
            if cache:
                for i in range(n_frames):  # fill the cache
                    ds.load_image(i), ds.load_mask(i)
            for i in range(2):  # warm scipy/cv paths
                ds.sample(i)
            t0 = time.perf_counter()
            for i in range(n_frames):
                ds.sample(i)
            out[key] = round(n_frames / (time.perf_counter() - t0), 2)
        dataset_spec.cache_clear()
        return out


def _pid_is_trainer(pid: int) -> bool:
    """True if `pid` looks like a pyrapose trainer (guards against a stale
    /tmp/bigrun.pid whose pid was recycled by an unrelated process — we must
    neither signal nor wait on a stranger)."""
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as fh:
            cmdline = fh.read().decode("utf-8", "replace")
    except OSError:
        return True  # no /proc (non-Linux test env): keep legacy behavior
    return "pyrapose" in cmdline


def _trainer_run_dir(pid: int) -> "str | None":
    """The trainer's --snapshot-path, read from its own /proc cmdline.

    The STOP sentinel must land in the dir the trainer actually polls
    ({snapshot_path}/STOP, cli/train.py). Different drivers use different
    run dirs (bigrun: /root/data/bigrun, finalrun: /root/data/final*), so
    a hardcoded default sent STOP to the wrong dir for finalrun trainers —
    the quiesce then burned its full wait and benchmarked a contended
    chip. Deriving from the live process is stale-proof; /tmp/bigrun.run
    (written by the launch scripts) covers hosts without /proc.
    """
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as fh:
            argv = fh.read().decode("utf-8", "replace").split("\0")
        idx = argv.index("--snapshot-path")
        return argv[idx + 1] or None
    except (OSError, ValueError, IndexError):
        pass
    try:
        with open("/tmp/bigrun.run") as fh:
            path = fh.read().strip()
        return path or None
    except OSError:
        return None


def _quiesce_trainer(max_wait_s: float = 900.0) -> None:
    """Gracefully stop a live bigrun trainer before benchmarking.

    A long-running `tools/bigrun.sh` training holds ~10 GB of the chip's
    16 GB HBM; benchmarking against it would OOM or measure a contended
    chip. The trainer polls a STOP sentinel every few steps and exits 0
    after saving a checkpoint (cli/train.py stop_file), so the bench asks
    it to stop and waits for the HBM to free. A /tmp sentinel also tells
    the bigrun driver to skip its post-training eval chain (which would
    otherwise start contending the moment the trainer exits); main()
    removes that sentinel again when benchmarking finishes, and the
    bigrun/endgame scripts treat a sentinel older than 1 h as stale, so a
    killed bench cannot block eval chains forever. Engaged only on real
    accelerators — the CPU smoke test must never stop a trainer.
    """
    import sys

    if jax.default_backend() == "cpu" or os.environ.get("BENCH_NO_QUIESCE"):
        return
    pid_file = os.environ.get("BENCH_TRAINER_PID_FILE", "/tmp/bigrun.pid")
    try:
        with open(pid_file) as fh:
            pid = int(fh.read().strip())
        os.kill(pid, 0)  # raises if dead
    except (OSError, ValueError):
        return
    if not _pid_is_trainer(pid):
        print(
            f"bench: pid {pid} from {pid_file} is not a pyrapose trainer "
            "(recycled pid?); skipping quiesce",
            file=sys.stderr,
        )
        return
    run_dir = (
        os.environ.get("BENCH_TRAINER_RUN")
        or _trainer_run_dir(pid)
        or "/root/data/bigrun"
    )
    skip_file = os.environ.get(
        "BENCH_SKIP_ENDGAME_FILE", "/tmp/bigrun_skip_endgame"
    )
    try:
        # STOP first: if anything below fails we must not leave the skip
        # sentinel behind with the trainer still running (ADVICE r2)
        open(os.path.join(run_dir, "STOP"), "w").close()
        open(skip_file, "w").close()
    except OSError as exc:
        print(f"bench: cannot signal trainer stop: {exc}", file=sys.stderr)
        try:
            os.remove(skip_file)
        except OSError:
            pass
        return
    print(
        f"bench: live trainer pid {pid}; requested graceful STOP, waiting",
        file=sys.stderr,
    )
    t_end = time.monotonic() + max_wait_s
    while time.monotonic() < t_end:  # STOP is polled every few steps
        time.sleep(2)
        try:
            os.kill(pid, 0)
        except OSError:
            time.sleep(5)  # let process teardown release device memory
            print("bench: trainer stopped; chip free", file=sys.stderr)
            return
    print(
        f"bench: trainer still alive after {max_wait_s:.0f}s; "
        "benchmarking anyway",
        file=sys.stderr,
    )


def _clear_skip_sentinel() -> None:
    """Ownership transfer back: the bench is done with the chip, so later
    bigrun/endgame sessions may use it again (ADVICE r2: the sentinel was
    never cleared and permanently blocked the eval chain)."""
    skip_file = os.environ.get(
        "BENCH_SKIP_ENDGAME_FILE", "/tmp/bigrun_skip_endgame"
    )
    try:
        os.remove(skip_file)
    except OSError:
        pass


def main() -> None:
    # One overall wall-clock budget (VERDICT r2: the un-budgeted bench hit
    # the driver timeout and produced ZERO evidence). The headline JSON is
    # printed the moment it is measured; every optional arm after it is
    # gated on remaining budget, and a final JSON line re-prints the
    # headline plus whatever extras fit. Either way at least one parseable
    # line reaches stdout long before any sane driver timeout.
    t_start = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    deadline = t_start + budget

    def remaining() -> float:
        return deadline - time.monotonic()

    try:
        _main_timed(remaining)
    finally:
        _clear_skip_sentinel()


def _main_timed(remaining) -> None:
    _quiesce_trainer(max_wait_s=max(min(900.0, remaining() * 0.5), 30.0))
    # defaults from the v5e batch sweep: inference throughput still rises at
    # 64 (513 -> 529 -> 542 img/s/chip for 16/32/64); the fused train step
    # peaks at 16 (146/153/131 for 8/16/32 — HBM pressure past 16)
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    train_remat = os.environ.get("BENCH_TRAIN_REMAT", "0") != "0"
    with_train = os.environ.get("BENCH_TRAIN", "1") != "0"
    # CPU smoke-testability (tests/test_bench_smoke.py): the real bench runs
    # at the reference's 480x640; a virtual-device CPU run shrinks it
    H = int(os.environ.get("BENCH_H", "480"))
    W = int(os.environ.get("BENCH_W", "640"))

    spec = LINEMOD_SPEC
    config = ModelConfig(num_classes=spec.num_classes)
    model = PyraPose(config=config)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, H, W, 3), dtype=np.uint8)
    )
    cam = jnp.tile(jnp.asarray(spec.intrinsics, jnp.float32), (batch, 1))

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    )(jax.random.PRNGKey(0))

    infer = build_inference_fn(model, spec.corners3d, (H, W))
    net_only = build_inference_fn(
        model, spec.corners3d, (H, W), with_pose=False
    )

    n_chips = jax.device_count()

    # --- full pipeline (headline) -------------------------------------------
    dt_full = _time(
        infer, (variables, images, cam), iters, warmup,
        lambda out: (out[0].rot, out[1]["scores"]),
    )
    img_s_chip = batch / dt_full / max(n_chips, 1)

    # --- network + decode only (stage breakdown) ----------------------------
    dt_net = _time(
        net_only, (variables, images, cam), iters, warmup,
        lambda out: out[1]["scores"],
    )
    pose_share = max(dt_full - dt_net, 0.0) / dt_full

    extras: dict = {
        "breakdown": {
            "net_img_s_per_chip": round(batch / dt_net / max(n_chips, 1), 2),
            "pose_stage_pct": round(100.0 * pose_share, 2),
        },
        "batch": batch,
        # the host-loader training number below is host-CPU-bound; on this
        # sandbox's core count it is a lower bound, not the TPU-VM number
        "host_cores": os.cpu_count(),
    }

    # --- forward FLOPs + MFU -------------------------------------------------
    try:
        lowered = jax.jit(
            lambda v, im: model.apply(v, im, train=False)
        ).lower(variables, jnp.zeros((1, H, W, 3), jnp.float32))
        cost = lowered.compile().cost_analysis()
        if cost and cost.get("flops"):
            tflops_per_img = float(cost["flops"]) / 1e12
            extras["model_tflops_per_img"] = round(tflops_per_img, 4)
            achieved = tflops_per_img * (batch / dt_net) / max(n_chips, 1)
            extras["achieved_tflops_net"] = round(achieved, 2)
            peak = _peak_tflops()
            if peak:
                extras["mfu_pct"] = round(100.0 * achieved / peak, 2)
    except Exception:
        pass

    def emit(partial: bool) -> None:
        line = {
            "metric": "img_s_per_chip_e2e_480x640",
            "value": round(img_s_chip, 2),
            "unit": "img/s/chip",
            "vs_baseline": round(img_s_chip / BASELINE_IMG_S_PER_CHIP, 4),
            **extras,
        }
        if partial:
            line["partial"] = True
        print(json.dumps(line), flush=True)

    # headline out NOW — a later timeout/OOM can no longer zero the round's
    # evidence. The final emit() repeats it with every extra that fit.
    emit(partial=True)

    skipped_arms: list = []

    def arm_fits(name: str, floor_s: float = 240.0) -> bool:
        """Gate an optional arm on remaining budget. floor_s is a coarse
        worst-case (compile + measure) estimate; a cold XLA cache can still
        blow through it, which is why the headline is already printed."""
        if remaining() >= floor_s:
            return True
        skipped_arms.append(name)
        extras["skipped_arms"] = skipped_arms
        return False

    # --- int8 PTQ conv stack (models/quantize.py) ----------------------------
    if arm_fits("int8"):
        try:
            from pyrapose_tpu.models.quantize import (
                quantize_variables,
                strip_quantized_kernels,
            )

            qtable = quantize_variables(variables)
            qvars = strip_quantized_kernels(variables, qtable)
            infer_q = build_inference_fn(
                model, spec.corners3d, (H, W), qtable=qtable
            )
            dt_q = _time(
                infer_q, (qvars, images, cam), iters, warmup,
                lambda out: (out[0].rot, out[1]["scores"]),
            )
            extras["img_s_per_chip_int8"] = round(
                batch / dt_q / max(n_chips, 1), 2
            )

            # static calibration: fixed activation scales drop the per-conv
            # abs-max pass (models/quantize.calibrate_activation_scales)
            if arm_fits("int8_static"):
                from pyrapose_tpu.data.pipeline import preprocess_images
                from pyrapose_tpu.models.quantize import (
                    calibrate_activation_scales,
                )

                calib = calibrate_activation_scales(
                    model, variables, qtable,
                    preprocess_images(images[: min(batch, 8)]), train=False,
                )
                infer_qs = build_inference_fn(
                    model, spec.corners3d, (H, W), qtable=calib
                )
                dt_qs = _time(
                    infer_qs, (qvars, images, cam), iters, warmup,
                    lambda out: (out[0].rot, out[1]["scores"]),
                )
                extras["img_s_per_chip_int8_static"] = round(
                    batch / dt_qs / max(n_chips, 1), 2
                )
        except Exception as exc:
            extras["int8_error"] = str(exc)[:200]

    # --- fused training step throughput --------------------------------------
    if with_train and arm_fits("train", 360.0):
        try:
            import dataclasses

            from pyrapose_tpu.data.synthetic import SyntheticPoseDataset
            from pyrapose_tpu.parallel import create_mesh
            from pyrapose_tpu.train import create_train_state
            from pyrapose_tpu.train.step import make_fused_train_step

            tspec = dataclasses.replace(spec, image_shape=(H, W))
            pipe = PipelineConfig(
                image_shape=(H, W), num_classes=spec.num_classes
            )
            import math

            use = math.gcd(train_batch, n_chips)
            mesh = create_mesh(jax.devices()[:use])
            tconfig = (
                dataclasses.replace(config, remat=True) if train_remat
                else config
            )
            state = create_train_state(
                jax.random.PRNGKey(0), tconfig, image_shape=(H, W)
            )
            # donated state carried through the loop — the real training
            # pattern (buffer reuse, no defensive copies)
            step = make_fused_train_step(
                mesh, tspec.corners3d, pipe, donate=True
            )
            ds = SyntheticPoseDataset(tspec, num_images=train_batch, seed=0)
            imgs_u8, gt = ds.batch(list(range(train_batch)))
            imgs_j = jnp.asarray(imgs_u8)
            gt_j = jax.tree_util.tree_map(jnp.asarray, gt)
            t_iters = max(iters // 2, 5)
            for _ in range(2):  # warmup/compile
                state, parts = step(state, imgs_j, gt_j)
            jax.block_until_ready(parts["loss"])
            t0 = time.perf_counter()
            for _ in range(t_iters):
                state, parts = step(state, imgs_j, gt_j)
            jax.block_until_ready(parts["loss"])
            dt_train = (time.perf_counter() - t0) / t_iters
            extras["train_img_s_per_chip"] = round(
                train_batch / dt_train / max(use, 1), 2
            )

            # budget checkpoints between sub-arms: raising _Budget skips
            # the rest of the train arms but keeps everything measured so far
            def _arm_gate(name: str, floor_s: float = 180.0) -> None:
                if not arm_fits(name, floor_s):
                    raise _Budget

            # --- real host-loader training throughput -----------------------
            # threaded decode/augment workers + double-buffered device_put,
            # the path `pyrapose train` actually runs (cli/train.py) — shows
            # the host pipeline keeps the chip fed vs the pre-staged number
            _arm_gate("train_hostloader")
            from pyrapose_tpu.data.prefetch import HostPrefetcher, device_prefetch

            ds_h = SyntheticPoseDataset(
                tspec, num_images=train_batch * (t_iters + 4), seed=1
            )
            loader = HostPrefetcher(ds_h, train_batch, num_workers=4)
            it = device_prefetch(loader, mesh, depth=2)
            imgs0, gt0 = next(it)  # warm (already compiled above)
            state, parts = step(state, imgs0, gt0)
            jax.block_until_ready(parts["loss"])
            t0 = time.perf_counter()
            steps_done = 0
            for imgs_j, gt_j in it:
                state, parts = step(state, imgs_j, gt_j)
                steps_done += 1
                if steps_done >= t_iters:
                    break
            jax.block_until_ready(parts["loss"])
            dt_host = (time.perf_counter() - t0) / max(steps_done, 1)
            extras["train_img_s_per_chip_hostloader"] = round(
                train_batch / dt_host / max(use, 1), 2
            )

            # --- HBM-cached training throughput -----------------------------
            # the `--device-cache` path: dataset staged in HBM, minibatch
            # gathered inside the jitted step; host sends index vectors only
            _arm_gate("train_cached")
            from pyrapose_tpu.data.device_cache import DeviceCache
            from pyrapose_tpu.train.step import make_cached_train_step

            cache = DeviceCache.build(
                SyntheticPoseDataset(
                    tspec, num_images=train_batch * 4, seed=2
                ),
                mesh=mesh, verbose=False,
            )
            # measure the REAL --device-cache training config: photometric
            # + geometric augmentation fused into the step
            from pyrapose_tpu.data.augment import AugmentConfig

            cstep = make_cached_train_step(
                mesh, tspec.corners3d, pipe, donate=True,
                augment_seed=0, affine=AugmentConfig(),
            )
            crng = np.random.default_rng(0)
            idxs = [
                np.asarray(
                    crng.integers(0, len(cache), train_batch), np.int32
                )
                for _ in range(t_iters + 2)
            ]
            for k in range(2):
                state, parts = cstep(state, cache.images, cache.gt, idxs[k])
            jax.block_until_ready(parts["loss"])
            t0 = time.perf_counter()
            for k in range(t_iters):
                state, parts = cstep(
                    state, cache.images, cache.gt, idxs[k + 2]
                )
            jax.block_until_ready(parts["loss"])
            dt_cached = (time.perf_counter() - t0) / t_iters
            extras["train_img_s_per_chip_cached"] = round(
                train_batch / dt_cached / max(use, 1), 2
            )

            # --- frozen-backbone fine-tune throughput -----------------------
            # the reference's recommended workflow (--freeze-backbone,
            # bin/train.py:72-74): stop_gradient prunes the whole backbone
            # backward, so this is the FLOP-reduction lever when 250+
            # img/s/chip is needed at 480x640 (the full fwd+bwd step runs
            # at the HBM/MXU roofline already — see ARCHITECTURE.md).
            # Batch sweep: with the backbone backward pruned XLA keeps no
            # interior backbone activations alive, so batches past 16 fit
            # in HBM and lift MXU utilization (full-bwd batch 32 regresses).
            def _time_train_arm(arm_batch: int, freeze: bool,
                                remat: bool) -> float | None:
                """img/s/chip for one (batch, freeze, remat) config, or
                None if it does not fit / fails — each arm is isolated so
                an OOM cannot take down the headline numbers."""
                try:
                    acfg = dataclasses.replace(config, remat=remat)
                    st = create_train_state(
                        jax.random.PRNGKey(0), acfg, image_shape=(H, W),
                        freeze_backbone=freeze,
                    )
                    stp = make_fused_train_step(
                        mesh, tspec.corners3d, pipe, donate=True
                    )
                    ads = SyntheticPoseDataset(
                        tspec, num_images=arm_batch, seed=0
                    )
                    a_u8, a_gt = ads.batch(list(range(arm_batch)))
                    a_imgs = jnp.asarray(a_u8)
                    a_gt = jax.tree_util.tree_map(jnp.asarray, a_gt)
                    for _ in range(2):
                        st, parts = stp(st, a_imgs, a_gt)
                    jax.block_until_ready(parts["loss"])
                    t0 = time.perf_counter()
                    for _ in range(t_iters):
                        st, parts = stp(st, a_imgs, a_gt)
                    jax.block_until_ready(parts["loss"])
                    dt = (time.perf_counter() - t0) / t_iters
                    return round(arm_batch / dt / max(use, 1), 2)
                except Exception:
                    return None

            sweep_env = os.environ.get("BENCH_TRAIN_SWEEP", "1")
            if sweep_env == "0":
                sweep_batches = [train_batch]
            elif "," in sweep_env:
                sweep_batches = [int(b) for b in sweep_env.split(",")]
            else:
                sweep_batches = [train_batch, 32, 64]
            frozen_sweep = {}
            for b in dict.fromkeys(sweep_batches):
                _arm_gate(f"train_frozen_b{b}")
                r = _time_train_arm(b, freeze=True, remat=False)
                if r is not None:
                    frozen_sweep[str(b)] = r
                if frozen_sweep:
                    extras["train_img_s_per_chip_frozen_backbone"] = max(
                        frozen_sweep.values()
                    )
                    extras["train_frozen_sweep"] = frozen_sweep
            # full backward at batch 32 with block remat: trades ~1 extra
            # block forward for the activation footprint that made plain
            # batch 32 regress (131 vs 153 img/s at r1)
            if sweep_env != "0":
                rb = int(os.environ.get("BENCH_TRAIN_REMAT_BATCH",
                                        str(max(sweep_batches))
                                        if "," in sweep_env else "32"))
                _arm_gate(f"train_remat{rb}")
                r32 = _time_train_arm(rb, freeze=False, remat=True)
                if r32 is not None:
                    extras[f"train_img_s_per_chip_remat{rb}"] = r32
        except _Budget:
            pass
        except Exception as exc:  # keep the headline alive
            extras["train_error"] = str(exc)[:200]

    # --- host loader: decode+augment img/s per core ---------------------------
    # The real `pyrapose train` host path on BOP-layout data: PNG decode +
    # photometric/affine augmentation per 480x640 frame. Measured standalone
    # so the host requirement is explicit: feeding one chip at N img/s needs
    # ceil(N / loader_img_s_per_core) cores (+ the decoded-frame cache
    # variant shows the steady-state cost once --cache-images holds the set).
    if arm_fits("host_loader", 90.0):
        try:
            extras.update(_bench_host_loader())
        except Exception as exc:
            extras["loader_error"] = str(exc)[:200]

    emit(partial=False)


if __name__ == "__main__":
    main()
