"""CLI: pyrapose {train, evaluate, infer, bench}.

Keeps the reference's command surface (PyraPose-train / PyraPose-evaluate /
PyraPose-convert-model console scripts, setup.py:57-63, with per-dataset
subcommands and flags per bin/train.py:268-314, bin/evaluate.py:124-158).
convert-model has no .h5 graph-surgery equivalent here — checkpoints are
parameter trees usable by both train and inference graphs — so `infer`
subsumes it.
"""

from __future__ import annotations

import argparse
import sys

DATASETS = ("linemod", "occlusion", "ycbv", "tless", "homebrewed", "synthetic")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pyrapose", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a PyraPose model")
    t.add_argument("dataset", choices=DATASETS)
    t.add_argument("data_path", nargs="?", default=None, help="dataset root (omit for synthetic)")
    t.add_argument("--backbone", default="resnet50")
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--epochs", type=int, default=20)  # reference default, train.py:298
    t.add_argument("--steps-per-epoch", type=int, default=None)
    t.add_argument("--lr", type=float, default=1e-5)  # train.py:101
    t.add_argument("--snapshot-path", default="checkpoints")
    t.add_argument("--snapshot", default=None, help="checkpoint to resume from")
    t.add_argument(
        "--auto-resume", action="store_true",
        help="resume from the newest checkpoint in --snapshot-path if one "
        "exists (preemption recovery: restart the same command after a kill)",
    )
    t.add_argument(
        "--max-steps", type=int, default=0,
        help="stop after this many global steps with a graceful save "
        "(wall-clock-bounded / preemptible jobs); 0 = epochs only",
    )
    t.add_argument(
        "--save-every", type=int, default=0,
        help="also checkpoint every N steps (mid-epoch preemption safety); "
        "0 = per-epoch only",
    )
    t.add_argument("--image-min-side", type=int, default=480)
    t.add_argument("--image-max-side", type=int, default=640)
    t.add_argument("--no-augment", action="store_true")
    t.add_argument("--freeze-backbone", action="store_true")
    t.add_argument(
        "--no-freeze-stem", action="store_true",
        help="train the stem/stage1 too (the reference's always-frozen "
        "first ~40 layers, models/resnet.py:100-103, assume ImageNet "
        "weights; training from scratch wants them trainable)",
    )
    t.add_argument(
        "--head-l2", type=float, default=1e-3, metavar="C",
        help="L2 coefficient on the 3D-head kernels (reference "
        "kernel_regularizer=l2(1e-3), retinanet.py:108). Set 0 for "
        "from-scratch training: under Adam at higher LR the regularizer "
        "gradient dominates the immature data gradient and zeroes the "
        "regression head (train/step.py TrainState.head_l2)",
    )
    t.add_argument(
        "--plateau-patience", type=int, default=2, metavar="N",
        help="ReduceLROnPlateau patience in epochs (reference keras config, "
        "bin/train.py:144-153). From-scratch runs with heavy augmentation "
        "have noisy epoch losses — raise this (e.g. 10) so a bounce does "
        "not trigger a premature 10x LR cut",
    )
    t.add_argument(
        "--plateau-factor", type=float, default=0.1, metavar="F",
        help="LR multiplier applied when the plateau fires",
    )
    t.add_argument(
        "--cosine-decay", action="store_true",
        help="cosine-anneal the LR from --lr to ~0 over --epochs (after "
        "--warmup-epochs) instead of reduce-on-plateau. Use for "
        "from-scratch runs: augmentation-noisy epoch losses can creep "
        "down forever without ever firing the plateau, and Adam needs "
        "the final anneal to converge the corner-regression tail",
    )
    t.add_argument(
        "--warmup-epochs", type=int, default=0, metavar="N",
        help="linear LR warmup over the first N epochs (from-scratch runs "
        "at higher LR; the reference's 1e-5 fine-tune needs none)",
    )
    t.add_argument(
        "--augment-geometric-only", action="store_true",
        help="keep the geometric (affine) augmentation but skip the "
        "photometric soup. The affine warp is the regularizer the dense "
        "corner regression needs against per-view memorization "
        "(tools/corner_bias.py: no-augment overfits 8 px train / 27 px "
        "val); the photometric soup is what shifts BatchNorm batch "
        "statistics (tools/loss_probe.py), so frozen-BN warm restarts "
        "want geometry-only. Device-cache path only",
    )
    t.add_argument(
        "--box-loss-weight", type=float, default=1.0, metavar="W",
        help="extra multiplier on the 3D-box regression loss term (1.0 = "
        "the reference's equal compile, bin/train.py:95-102). On "
        "from-scratch runs classification saturates ~10x faster than the "
        "corner regression; raising this rebalances the shared-backbone "
        "gradient toward localization. Reported loss_box3d stays "
        "unweighted for cross-run comparability",
    )
    t.add_argument(
        "--train-bn", action="store_true",
        help="LIVE BatchNorm: normalize by batch statistics and update the "
        "running averages (sync-BN across the DP mesh via GSPMD). The "
        "reference always freezes BN because it fine-tunes ImageNet "
        "weights (models/resnet.py:87); training from scratch (no "
        "--imagenet-weights) wants this on",
    )
    t.add_argument(
        "--remat", action="store_true",
        help="block-level rematerialization: ~3x less activation memory per "
             "backbone block for ~1 extra block forward in the backward "
             "(for batch sizes / resolutions past HBM capacity)",
    )
    t.add_argument("--seed", type=int, default=0)
    t.add_argument(
        "--workers", type=int, default=2,
        help="host decode/augment threads (reference fit_generator workers, "
        "bin/train.py:373-390)",
    )
    t.add_argument(
        "--prefetch", type=int, default=2,
        help="batches kept resident on device ahead of compute",
    )
    t.add_argument(
        "--device-augment", action="store_true",
        help="run ALL training augmentation (photometric soup + geometric "
        "scale/translate warp with GT compensation) on device inside the "
        "jitted train step; the host loader then only decodes images "
        "(removes ~30 ms/frame of host CPU per 480x640 image)",
    )
    t.add_argument(
        "--save-epochs", type=int, default=1, metavar="N",
        help="save a checkpoint every N epochs instead of every epoch "
        "(the final epoch always saves); with --device-cache an epoch can "
        "be seconds while a save is a full device_get of the train state",
    )
    t.add_argument(
        "--stall-timeout", type=float, default=0, metavar="SECONDS",
        help="exit(17) with a full stack dump if no host-visible training "
        "progress (epoch-end loss fetch / save / eval) happens for this "
        "long — remote-attached TPUs can wedge mid-transfer and only "
        "process death releases the device; pair with --supervise or an "
        "outer --auto-resume restart loop. 0 disables. Armed after the "
        "first epoch completes (cold compiles are exempt); set it well "
        "above your epoch time",
    )
    t.add_argument(
        "--rss-restart-gb", type=float, default=0, metavar="GB",
        help="checkpoint and exit(18) for the supervisor to relaunch when "
        "this process's resident set exceeds GB — works around remote-TPU "
        "transport clients leaking every host->device transfer, which makes "
        "chunk-rotating --device-cache runs grow without bound until the "
        "kernel OOM-kills them mid-epoch. Live runs can also be tuned by "
        "writing a number to {snapshot-path}/RSS_RESTART_GB (re-read every "
        "epoch; overrides the flag). 0 disables. Single-process only",
    )
    t.add_argument(
        "--supervise", type=int, default=0, metavar="N",
        help="run training as a child process and restart it up to N times "
        "on any nonzero exit (stall watchdog, preemption, tunnel drop), "
        "forcing --auto-resume so each restart continues from the newest "
        "checkpoint",
    )
    t.add_argument(
        "--keep-checkpoints", type=int, default=0, metavar="N",
        help="keep only the newest N complete checkpoints in "
        "--snapshot-path (0 = keep all); per-epoch resnet50+Adam "
        "checkpoints are ~0.5 GB each",
    )
    t.add_argument(
        "--device-cache", action="store_true",
        help="stage the ENTIRE training set in device HBM once and gather "
        "minibatches on device (small BOP-scale sets only, ~1 GB per 1k "
        "480x640 frames). Removes the host/PCIe from the steady-state step; "
        "implies on-device photometric augmentation and disables the "
        "host-side affine warp",
    )
    t.add_argument(
        "--decoded-store", default=None, metavar="PREFIX",
        help="mmap'd pre-decoded frame store (built on first use): PNG "
        "decode is paid once ever, any set size that fits on disk; "
        "requires --device-augment. The middle ground between the "
        "HBM --device-cache (fastest, capped by device memory) and the "
        "decoding host loader",
    )
    t.add_argument(
        "--device-cache-frames", type=int, default=0, metavar="N",
        help="with --device-cache: stage at most N frames (seed-keyed "
        "deterministic subset) — for sets bigger than HBM (~1 GB per 1k "
        "480x640 frames)",
    )
    t.add_argument(
        "--device-cache-rotate", type=int, default=0, metavar="E",
        help="with --device-cache-frames: rotate the staged HBM chunk "
        "every E epochs through equal-size chunks of a seed-keyed "
        "permutation, so a set bigger than HBM still gets FULL coverage "
        "at device-cache speed. Each chunk's decoded frames are disk-"
        "cached (device_cache_c{i}.npz), so after the first cycle a "
        "rotation costs one disk read + host->HBM stage (~seconds), not "
        "a PNG decode pass. The chunk is a pure function of the epoch — "
        "restart/resume-safe",
    )
    t.add_argument(
        "--device-cache-prefetch", action="store_true",
        help="with --device-cache-rotate: decode + transfer the NEXT chunk "
        "on a background thread while the current one trains, hiding the "
        "rotation restage (a ~minute of host->HBM transfer per rotation on "
        "remote-attached chips). Both chunks are briefly HBM-resident: "
        "size --device-cache-frames at most HALF the free device memory",
    )
    t.add_argument(
        "--no-device-cache-host-ram", dest="device_cache_host_ram",
        action="store_false", default=True,
        help="disable keeping decoded rotation chunks in host RAM between "
        "visits (on by default when the decoded set fits in <45%% of "
        "MemAvailable; retention makes every rotation after the first "
        "visit a pure host->HBM transfer, removing the np.load that "
        "dominated rotation stalls on 1-core hosts)",
    )
    t.add_argument(
        "--cache-images", type=float, default=0.0, metavar="GB",
        help="decoded-frame RAM cache: after the first epoch, PNG decode "
        "cost disappears from the host loader (0 = off; the reference "
        "re-decodes every epoch, generator.py:223-226)",
    )
    t.add_argument(
        "--eval-every", type=int, default=0,
        help="run ADD(-S) eval on the val split every N epochs (reference "
        "per-epoch Evaluate callback, callbacks/eval.py:21-97); 0 = off",
    )
    t.add_argument("--eval-samples", type=int, default=64,
                   help="max validation images per train-time eval")
    t.add_argument("--val-set-name", default="val")
    t.add_argument(
        "--eval-ransac-top-k", type=int, default=128, metavar="K",
        help="--ransac-top-k used by the in-training eval (default 128: a "
        "soft mid-training model needs more vote averaging than the sharp-"
        "model default of 32 the evaluate CLI uses)",
    )
    t.add_argument(
        "--eval-score-threshold", type=float, default=0.3,
        help="score threshold for the in-training eval (default 0.3, the "
        "low end of the endgame sweep; the reference evaluates at 0.5)",
    )
    t.add_argument(
        "--eval-ransac-inlier-px", type=float, default=5.0, metavar="PX",
        help="RANSAC inlier gate for the in-training eval (the evaluate "
        "CLI's --ransac-inlier-px; default keeps the reference's 5 px)",
    )
    t.add_argument(
        "--no-eval-preflight", dest="eval_preflight",
        action="store_false", default=True,
        help="skip the launch-time one-batch eval smoke test (on by "
        "default whenever --eval-every is set: a broken eval stack then "
        "fails BEFORE epoch 1 instead of at the first epoch-boundary "
        "eval, which in round 3 cost 9 epochs)",
    )
    t.add_argument(
        "--profile-dir", default=None,
        help="write a jax.profiler trace of a steady-state step window here",
    )
    t.add_argument("--profile-steps", type=int, default=8)
    t.add_argument(
        "--config", default=None,
        help=".ini file with an [anchor_parameters] section (reference "
        "utils/config.py:23-36)",
    )
    t.add_argument(
        "--imagenet-weights", action="store_true",
        help="initialize the backbone from the fizyr ImageNet release "
        "(reference models/resnet.py:42-62; downloads + md5-checks, or use "
        "--pretrained-file)",
    )
    t.add_argument(
        "--pretrained-file", default=None,
        help="pre-downloaded ImageNet .h5 (for air-gapped environments)",
    )
    t.add_argument(
        "--coordinator", default=None, metavar="HOST:PORT",
        help="multi-host training: jax.distributed coordinator address "
        "(run the same command on every host; greenfield extension — the "
        "reference has no multi-node path, SURVEY §2.3)",
    )
    t.add_argument(
        "--num-processes", type=int, default=None,
        help="total processes in the multi-host cluster (auto-detected on "
        "Cloud TPU pods)",
    )
    t.add_argument(
        "--process-id", type=int, default=None,
        help="this process's rank (auto-detected on Cloud TPU pods)",
    )
    t.add_argument(
        "--cpu-rehearsal", action="store_true",
        help="with --coordinator: run the multi-host cluster on CPU (gloo "
        "collectives) — single-machine rehearsal of the pod layout",
    )
    t.add_argument(
        "--spatial", type=int, default=1,
        help="shard the activation grid over this many devices in addition "
        "to data parallelism (2-D data x spatial mesh; forces float32 "
        "compute — XLA SPMD miscompiles bf16 grads on mixed meshes, see "
        "tests/test_xla_bugs.py)",
    )

    e = sub.add_parser("evaluate", help="evaluate ADD(-S) on a dataset")
    # + coco: detection-only bbox mAP (reference bin/evaluate.py:51-119)
    e.add_argument("dataset", choices=DATASETS + ("coco",))
    e.add_argument("data_path", nargs="?", default=None)
    e.add_argument("snapshot", nargs="?", default=None, help="checkpoint path")
    e.add_argument("--backbone", default="resnet50")
    e.add_argument("--set-name", default="val")
    e.add_argument("--batch-size", type=int, default=8)
    e.add_argument("--score-threshold", type=float, default=0.5)  # evaluate.py:150
    e.add_argument("--image-min-side", type=int, default=480)  # evaluate.py:154
    e.add_argument("--image-max-side", type=int, default=640)
    e.add_argument(
        "--icp",
        action="store_true",
        help="refine poses with depth ICP before scoring (needs _dep images; "
        "reference ycbv_eval.py:841-870)",
    )
    e.add_argument(
        "--no-depth",
        action="store_true",
        help="skip loading depth images even when present (disables VSD/ICP)",
    )
    e.add_argument(
        "--config", default=None,
        help=".ini file with an [anchor_parameters] section (reference "
        "bin/evaluate.py:156)",
    )
    e.add_argument(
        "--max-instances",
        type=int,
        default=1,
        help="poses recovered per class per image (multi-copy scenes, e.g. "
        "T-LESS; 1 = reference per-class protocol)",
    )
    e.add_argument(
        "--int8",
        action="store_true",
        help="run the conv stack int8-quantized (PTQ, per-channel weights "
        "+ dynamic per-tensor activations; 2x MXU rate on v5e+, "
        "models/quantize.py). Head output convs stay full precision",
    )
    e.add_argument(
        "--ransac-inlier-px",
        type=float,
        default=5.0,
        metavar="PX",
        help="RANSAC inlier reprojection gate in pixels (reference "
        "hardcodes 5.0, linemod_eval.py:479-485 — the default keeps "
        "parity). The gate is a decode hyperparameter, not part of the "
        "ADD-0.1d metric: on a soft model whose corner votes sit near the "
        "gate, widening it admits enough inliers for the hypothesis "
        "tournament + GN refinement to average the noise down, at zero "
        "cost to the metric's strictness",
    )
    e.add_argument(
        "--ransac-fallback-px",
        type=float,
        default=0.0,
        metavar="PX",
        help="cascaded decode: additionally run the tournament + GN refine "
        "with this wider inlier gate and keep, per instance, whichever "
        "refined pose wins more strict-gate consensus (0 = off). Captures "
        "the wide-gate gains on near-converged votes without the wide "
        "gate's collapse on noisy votes (both measured — see USAGE.md)",
    )
    e.add_argument(
        "--exact-topk",
        action="store_true",
        help="exact top-k vote gather instead of approx_max_k "
        "(recall_target=0.95); the reference thresholds exactly "
        "(linemod_eval.py:317-334) — use this flag to A/B the recall cost",
    )
    e.add_argument(
        "--ransac-top-k",
        type=int,
        default=32,
        metavar="K",
        help="corner votes kept per class for pose recovery (each vote is "
        "one EPnP hypothesis AND 8 refinement correspondences). The "
        "reference keeps ALL votes above the score threshold and runs 300 "
        "RANSAC iterations (linemod_eval.py:479-485); larger K approaches "
        "that protocol — more noise averaging in the Gauss-Newton refine, "
        "at O(K) step cost. 32 is tuned for sharp (converged) models",
    )
    e.add_argument(
        "--eval-samples", type=int, default=None, metavar="N",
        help="cap the evaluation at the first N images of the split "
        "(rounded down to whole batches). Default: the whole split. "
        "Use for quick sanity gates, e.g. train-split recall checks",
    )
    e.add_argument(
        "--report-json", default=None, metavar="FILE",
        help="also write the evaluation report (per-class recall/precision/"
        "detection + means) as JSON — machine-readable twin of the printed "
        "report for CI gates and sweep tooling",
    )

    i = sub.add_parser("infer", help="run inference on images, write poses JSON")
    i.add_argument("dataset", choices=DATASETS)
    i.add_argument("image_dir")
    i.add_argument("snapshot")
    i.add_argument("--backbone", default="resnet50")
    i.add_argument("--data-path", default=None)
    i.add_argument("--output", default="poses.json")
    i.add_argument("--score-threshold", type=float, default=0.5)
    i.add_argument("--batch-size", type=int, default=8)
    i.add_argument("--image-min-side", type=int, default=480)
    i.add_argument("--image-max-side", type=int, default=640)
    i.add_argument(
        "--int8", action="store_true",
        help="int8-quantized conv stack (PTQ; see evaluate --int8)",
    )
    i.add_argument(
        "--save-images",
        default=None,
        metavar="DIR",
        help="write pose-wireframe overlay PNGs here (reference "
        "utils/visualization.py draw_detections debug view)",
    )

    c = sub.add_parser(
        "convert", help="import a keras .h5 checkpoint into a native checkpoint"
    )
    c.add_argument("dataset", choices=DATASETS)
    c.add_argument("h5", help="keras .h5 weight file")
    c.add_argument("output", help="output checkpoint directory")
    c.add_argument("--data-path", default=None)
    c.add_argument("--backbone", default="resnet50")
    c.add_argument(
        "--backbone-only",
        action="store_true",
        help="import only the Caffe-named ImageNet backbone weights",
    )

    a = sub.add_parser(
        "annotate-bop",
        help="convert BOP scene directories into the training layout",
    )
    a.add_argument("bop_root", help="BOP dataset root (scene dirs + models_info)")
    a.add_argument("output", help="output dataset root")
    a.add_argument("--set-name", default="train")
    a.add_argument("--scenes", nargs="*", default=None)
    a.add_argument("--min-visibility", type=float, default=0.0)
    a.add_argument("--no-depth", action="store_true")

    r = sub.add_parser(
        "render-synthetic",
        help="render a synthetic BOP-layout training set from meshes "
        "(reference annotation_scripts/render_custom_from_mesh.py)",
    )
    r.add_argument("models_dir", help="directory with obj_*.ply + models_info")
    r.add_argument("output", help="output dataset root")
    r.add_argument("--n-images", type=int, default=100)
    r.add_argument("--set-name", default="train")
    r.add_argument("--backgrounds", default=None,
                   help="directory of background images (e.g. COCO)")
    r.add_argument("--obj-ids", type=int, nargs="*", default=None)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--workers", type=int, default=1,
                   help="stripe rendering over N cooperating processes; "
                   "run N copies with --worker-index 0..N-1, then once "
                   "without --workers to assemble the index")
    r.add_argument("--worker-index", type=int, default=0)

    f = sub.add_parser(
        "fps",
        help="farthest-point-sample mesh control points -> features.json "
        "(reference FPS.py:17-99, minus the open3d viewer)",
    )
    f.add_argument("models_dir", help="directory with obj_*.ply meshes")
    f.add_argument("--output", default="features.json")
    f.add_argument("--points", type=int, default=8,
                   help="control points per object (reference default 8)")

    b = sub.add_parser("bench", help="throughput benchmark")
    b.add_argument("--batch-size", type=int, default=16)
    b.add_argument("--iters", type=int, default=20)

    s = sub.add_parser("serve", help="HTTP pose-estimation server")
    s.add_argument("dataset", choices=DATASETS)
    s.add_argument("snapshot", nargs="?", default=None)
    s.add_argument("--data-path", default=None)
    s.add_argument("--backbone", default="resnet50")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8321)
    s.add_argument("--score-threshold", type=float, default=0.5)
    s.add_argument("--icp", action="store_true", help="depth-based ICP refine")
    s.add_argument(
        "--int8", action="store_true",
        help="int8-quantized conv stack (PTQ; see evaluate --int8)",
    )
    s.add_argument("--image-min-side", type=int, default=480)
    s.add_argument("--image-max-side", type=int, default=640)
    return p


def _configure_jax() -> None:
    """Apply platform + compile-cache configuration before any tracing.

    - Re-applies JAX_PLATFORMS: some environments (including this one)
      pre-import jax at interpreter start, which makes the environment
      variable a no-op by the time user code runs; routing it through
      jax.config restores the documented behaviour.
    - Enables a persistent compilation cache so repeat CLI invocations skip
      the multi-minute XLA compile of the full train/inference programs.
    """
    import os

    import jax

    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms)
    cache_dir = os.environ.get(
        "PYRAPOSE_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pyrapose_tpu", "xla"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # `kill -USR1 <pid>` dumps every thread's stack without killing the
    # process — the first tool to reach for when a run looks wedged
    # (complements the train loop's --stall-timeout watchdog).
    import faulthandler
    import signal
    import threading

    if threading.current_thread() is threading.main_thread():
        try:
            faulthandler.register(signal.SIGUSR1, all_threads=True)
        except (AttributeError, ValueError):  # platform without SIGUSR1
            pass


def _child_command(argv: list[str]) -> list[str]:
    """The supervised child's argv: same command, --supervise stripped,
    --auto-resume forced (each restart continues from the newest
    checkpoint)."""
    import sys as _sys

    child = [_sys.executable, "-u", "-m", "pyrapose_tpu.cli.main"]
    skip_next = False
    for a in argv:
        if skip_next:
            skip_next = False
            continue
        if a == "--supervise":
            skip_next = True
            continue
        if a.startswith("--supervise="):
            continue
        child.append(a)
    if "--auto-resume" not in child:
        child.append("--auto-resume")
    return child


def _run_supervised(argv: list[str], retries: int) -> int:
    """Restart the (single-process) train child on nonzero exit.

    The child runs the identical command minus --supervise, plus
    --auto-resume, so every incarnation continues from the newest complete
    checkpoint. Used for unattended runs on remote-attached TPUs where the
    transport can wedge (exit 17 from the stall watchdog) or the host can
    preempt the job. The restart/halt/rollback-warning policy lives in
    pyrapose_tpu.supervise (crash signatures, identical-crash halt,
    truthful end-of-run summary — VERDICT r3 next-round #3).
    """
    from pyrapose_tpu.supervise import run_supervised

    return run_supervised(_child_command(argv), retries)


def main(argv: list[str] | None = None) -> int:
    _configure_jax()
    args = build_parser().parse_args(argv)
    if args.command == "train":
        if getattr(args, "supervise", 0):
            if getattr(args, "coordinator", None):
                raise SystemExit(
                    "--supervise is single-process; multi-host jobs restart "
                    "through their cluster scheduler instead"
                )
            import sys as _sys

            return _run_supervised(
                list(argv if argv is not None else _sys.argv[1:]),
                args.supervise,
            )
        if getattr(args, "coordinator", None):
            # multi-host: join the cluster BEFORE importing the train stack
            # (its flax/optax imports initialize the XLA backend, after
            # which jax.distributed.initialize refuses to run)
            import jax

            from pyrapose_tpu.parallel import multihost

            multihost.initialize_distributed(
                args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
                cpu=bool(args.cpu_rehearsal),
            )
            print(
                f"process {jax.process_index()}/{jax.process_count()}: "
                f"{jax.local_device_count()} local / {jax.device_count()} "
                "global devices"
            )
        # Arm a watchdog BEFORE the train stack imports: the first jnp call
        # during import initializes the (possibly remote) TPU backend, and a
        # wedged attach hangs there forever — outside the train loop's own
        # watchdog. run_train stops this one as soon as the mesh is up.
        init_watchdog = None
        if getattr(args, "stall_timeout", 0):
            # NOTE: pyrapose_tpu.watchdog, NOT .train.watchdog — importing
            # the train package initializes the backend, which is the very
            # hang this watchdog exists to catch
            from pyrapose_tpu.watchdog import StallWatchdog

            init_watchdog = StallWatchdog(
                args.stall_timeout, label="backend-init"
            ).start()
        args._init_watchdog = init_watchdog

        from pyrapose_tpu.cli.train import run_train

        return run_train(args)
    if args.command == "evaluate":
        from pyrapose_tpu.cli.evaluate import run_evaluate

        return run_evaluate(args)
    if args.command == "infer":
        from pyrapose_tpu.cli.infer import run_infer

        return run_infer(args)
    if args.command == "convert":
        from pyrapose_tpu.cli.convert import run_convert

        return run_convert(args)
    if args.command == "serve":
        from pyrapose_tpu.cli.serve import run_serve

        return run_serve(args)
    if args.command == "annotate-bop":
        from pyrapose_tpu.data.annotate import annotate_bop

        result = annotate_bop(
            args.bop_root,
            args.output,
            set_name=args.set_name,
            scenes=args.scenes,
            min_visib=args.min_visibility,
            copy_depth=not args.no_depth,
        )
        print(
            f"wrote {len(result['images'])} images, "
            f"{len(result['annotations'])} annotations to {args.output}"
        )
        return 0
    if args.command == "render-synthetic":
        from pyrapose_tpu.data.scene_render import generate_synthetic_dataset

        index = generate_synthetic_dataset(
            args.models_dir,
            args.output,
            n_images=args.n_images,
            set_name=args.set_name,
            obj_ids=args.obj_ids,
            backgrounds_dir=args.backgrounds,
            seed=args.seed,
            workers=args.workers,
            worker_index=args.worker_index,
        )
        if index is None:
            print(f"stripe worker {args.worker_index}/{args.workers} done")
        else:
            print(
                f"rendered {len(index['images'])} images, "
                f"{len(index['annotations'])} annotations to {args.output}"
            )
        return 0
    if args.command == "fps":
        import glob
        import os
        import re

        from pyrapose_tpu.utils.fps import write_features_json

        model_paths = {}
        for path in sorted(glob.glob(os.path.join(args.models_dir, "*.ply"))):
            m = re.search(r"obj_0*(\d+)", os.path.basename(path))
            if m:
                model_paths[int(m.group(1))] = path
        if not model_paths:
            print(f"no obj_*.ply meshes found in {args.models_dir}")
            return 1
        features = write_features_json(model_paths, args.output, k=args.points)
        print(
            f"wrote {args.points} control points for {len(features)} objects "
            f"to {args.output}"
        )
        return 0
    if args.command == "bench":
        import os

        os.environ["BENCH_BATCH"] = str(args.batch_size)
        os.environ["BENCH_ITERS"] = str(args.iters)
        import importlib.util
        import pathlib

        bench = pathlib.Path(__file__).resolve().parents[2] / "bench.py"
        spec = importlib.util.spec_from_file_location("bench", bench)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
