"""Train command: data-parallel training loop over the ICI mesh.

TPU-native pipeline shape (compare the reference's host-side target
generation in fork workers + keras queue, bin/train.py:373-390,
generator.py:344-358):

- host worker threads only decode/augment images (data/prefetch.py);
- batches are double-buffered onto the mesh with the training sharding
  (device_prefetch), overlapping H2D with compute;
- normalization + anchor-target generation are fused INTO the jitted train
  step and run on TPU (train/step.py make_fused_train_step).

Training-time evaluation (the reference's per-epoch Evaluate callback,
callbacks/eval.py:21-97) runs the ADD(-S) protocol on a validation split
every --eval-every epochs; scalars stream to {snapshot_path}/metrics.jsonl;
--profile-dir wraps a mid-training window in jax.profiler.trace.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import numpy as np

from pyrapose_tpu.data import PipelineConfig
from pyrapose_tpu.data.augment import AugmentConfig
from pyrapose_tpu.data.prefetch import HostPrefetcher, device_prefetch
from pyrapose_tpu.data.spec import dataset_spec
from pyrapose_tpu.models import ModelConfig
from pyrapose_tpu.parallel import create_mesh
from pyrapose_tpu.train import (
    ReduceLROnPlateau,
    create_train_state,
    get_learning_rate,
    make_fused_train_step,
    set_learning_rate,
)
from pyrapose_tpu.train.checkpoint import (
    prune_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)

# Mid-epoch watchdog-beat cadence: every _BEAT_EVERY dispatched steps the
# loop syncs on the loss of the step _BEAT_EVERY back (keeping that many
# steps of dispatch pipeline in flight) and beats the stall watchdog. One
# scalar fetch per cadence: ~one tunnel RTT per ~10s of steady-state
# training — noise — while giving the watchdog step-level liveness instead
# of epoch-level.
_BEAT_EVERY = 64


def _build_dataset(args, spec, augment, set_name="train"):
    store = getattr(args, "decoded_store", None)
    if store and set_name == "train" and args.dataset != "synthetic":
        # mmap'd pre-decoded frames (data/decoded_store.py): decode paid
        # once ever; requires on-device augmentation (frames are the
        # deterministic letterboxed pixels)
        from pyrapose_tpu.data.datasets import create_dataset
        from pyrapose_tpu.data.decoded_store import DecodedStore, build_store

        # --device-cache also augments on device (run_train's device_aug),
        # so it satisfies the deterministic-frames requirement
        if not (
            getattr(args, "device_augment", False)
            or getattr(args, "device_cache", False)
            or args.no_augment
        ):
            raise ValueError(
                "--decoded-store requires --device-augment, --device-cache, "
                "or --no-augment: the store holds deterministic frames"
            )
        if not DecodedStore.exists(store):
            print(f"decoded-store: building {store} (one-time decode)...")
            base = create_dataset(
                args.dataset, args.data_path, set_name=set_name, spec=spec,
                augment=None, seed=args.seed,
            )
            build_store(base, store, num_workers=max(args.workers, 2))
        return DecodedStore(store)
    if args.dataset == "synthetic":
        from pyrapose_tpu.data.synthetic import SyntheticPoseDataset

        n = (args.steps_per_epoch or 50) * args.batch_size
        seed = args.seed if set_name == "train" else args.seed + 7919
        return SyntheticPoseDataset(spec, num_images=max(n, 64), seed=seed)
    from pyrapose_tpu.data.datasets import create_dataset

    # --device-augment: BOTH augmentation stages (photometric soup +
    # geometric warp with GT compensation) move into the jitted train step
    # (data/device_augment.py + data/device_affine.py); the host loader
    # then only decodes
    host_augment = None
    if augment and set_name == "train":
        if getattr(args, "device_augment", False):
            host_augment = None
        else:
            host_augment = AugmentConfig()
    return create_dataset(
        args.dataset,
        args.data_path,
        set_name=set_name,
        spec=spec,
        augment=host_augment,
        seed=args.seed,
        cache_bytes=int(getattr(args, "cache_images", 0.0) * 2**30),
    )


class MetricsLogger:
    """Structured scalar sink: one JSON object per line (the reference's
    observability is print() + an unwired TensorBoard slot, SURVEY §5)."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, **scalars):
        if self._f is None:
            return
        self._f.write(json.dumps(scalars) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()


def _epoch_schedule(dataset_len, batch_size, steps, epoch, seed):
    """Deterministic per-epoch index schedule (shuffled without replacement,
    wrapping across the dataset).

    Seeded by (seed, epoch) — NOT a sequential stream — so a preempted run
    resumed at any global step reconstructs the exact schedule it would have
    seen, without replaying earlier epochs."""
    rng = np.random.default_rng((seed, epoch))
    order = rng.permutation(dataset_len)
    idx = [
        [int(order[(s * batch_size + j) % dataset_len]) for j in range(batch_size)]
        for s in range(steps)
    ]
    return idx


def compute_cache_chunks(
    n: int, cache_frames: int, seed: int
) -> "np.ndarray":
    """(n_chunks, cache_frames) index table for --device-cache-rotate.

    Equal-size chunks of one seed-keyed permutation; the active chunk is a
    pure function of the epoch ((epoch // rotate) % n_chunks), so
    resume/restart re-derives it with no state. The tail chunk wraps
    around to the permutation's head so every chunk has exactly
    cache_frames rows -> steps_per_epoch and the resume arithmetic stay
    constant across rotations. Shared with tools/prestage_chunks.py, which
    must reproduce the exact same tables to pre-build the decoded stores.
    """
    perm = np.random.default_rng(seed).permutation(n)
    n_chunks = -(-n // cache_frames)
    pad = n_chunks * cache_frames - n
    if pad:
        perm = np.concatenate([perm, perm[:pad]])
    return perm.reshape(n_chunks, cache_frames)


def cache_disk_key(image_shape, sub_dataset) -> str:
    """Content-identity string for a decoded-store .npz (same-SIZE but
    different-CONTENT caches — another --seed's subset, another letterbox
    geometry — must re-decode, not silently train on stale frames)."""
    import hashlib

    idx = getattr(sub_dataset, "indices", None)
    subset = (
        "full" if idx is None else hashlib.sha1(
            np.sort(np.asarray(idx, np.int64)).tobytes()
        ).hexdigest()[:16]
    )
    return f"shape={tuple(image_shape)}|n={len(sub_dataset)}|subset={subset}"


def _mem_available_bytes() -> int:
    """MemAvailable from /proc/meminfo, or 0 when unreadable (non-Linux)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


class _EvalRunner:
    """In-training ADD(-S) eval with everything reusable cached.

    Two per-call costs dominate a naive eval and are paid exactly once here:
    the jitted inference program (rebuilding `build_inference_fn` every eval
    recompiles — ~a minute of XLA per eval) and the host decode of the val
    images (sequential PNG decode on few-core hosts). Val batches are
    decoded on first use and kept as uint8 (64 frames at 480x640 is ~59 MB).

    `config` is the SAME ModelConfig training uses (incl. any --config anchor
    override) so the validation decode matches the trained anchor layout.

    Multi-host: every process evaluates its OWN slice of the val batches
    with a process-local inference program (params are replicated, so a
    host fetch detaches them from the global mesh), then the per-class
    counters are summed across processes — the report is identical
    everywhere, and no process ever dispatches a global-mesh program the
    others don't join (which would deadlock the cluster at the next
    all-reduce). `process_index`/`process_count` are injectable for tests.
    """

    def __init__(self, args, spec, val_dataset, model_points, config,
                 process_index: int | None = None,
                 process_count: int | None = None):
        from pyrapose_tpu.inference import build_inference_fn
        from pyrapose_tpu.models import PyraPose
        from pyrapose_tpu.pose import RansacConfig

        self.args = args
        self.spec = spec
        self.model_points = model_points
        self.val_dataset = val_dataset
        self.pi = jax.process_index() if process_index is None else process_index
        self.pc = jax.process_count() if process_count is None else process_count
        model = PyraPose(config=config)
        # the same decision rule the endgame sweep would use (VERDICT r2
        # weak #6): a soft mid-training model needs the low threshold /
        # large K the sweep settles on, or --eval-every under-reports it
        ransac = RansacConfig(
            score_threshold=getattr(args, "eval_score_threshold", 0.3),
            top_k=getattr(args, "eval_ransac_top_k", 128),
            inlier_px=getattr(args, "eval_ransac_inlier_px", 5.0),
        )
        self.infer = build_inference_fn(
            model, spec.corners3d, spec.image_shape, ransac
        )
        self._batches: list | None = None

    def batches(self) -> list:
        if self._batches is None:
            n = min(len(self.val_dataset), self.args.eval_samples)
            bs = self.args.batch_size
            starts = list(range(0, n - n % bs, bs))
            # round-robin batch shard: process i evaluates batches i::pc
            self._batches = [
                self.val_dataset.batch(list(range(i, i + bs)))
                for i in starts[self.pi :: self.pc]
            ]
        return self._batches

    def preflight(self, state) -> None:
        """Run ONE val batch through the exact in-training eval path.

        Launch gate for long runs (round-3 post-mortem, VERDICT r3 weak #2):
        the r3 flagship was launched from a mid-edit tree whose inference
        config didn't match the ransac module on disk; the mismatch only
        surfaced at the epoch-10 in-training eval, which — combined with
        the then eval-before-save ordering — destroyed 9 epochs. Failing
        here costs ~1 min (the inference jit, which the real evals then
        reuse from the cache) and happens BEFORE epoch 1 commits the chip,
        when auto-resume has nothing to lose.
        """
        self._run(state, self.batches()[:1], reduce=False)

    def __call__(self, state) -> dict:
        return self._run(state, self.batches(), reduce=True)

    def _run(self, state, batches, reduce: bool) -> dict:
        from pyrapose_tpu.eval.drivers import evaluate_by_name

        params, batch_stats = state.params, state.batch_stats
        if self.pc > 1:
            # replicated global-mesh arrays -> host copies, so the local
            # inference jit never sees non-addressable shards
            params = jax.device_get(params)
            batch_stats = jax.device_get(batch_stats) if batch_stats else batch_stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        name = self.args.dataset if self.args.dataset != "synthetic" else "linemod"
        out = evaluate_by_name(
            name if name in ("linemod", "occlusion", "ycbv", "homebrewed")
            else "linemod",
            self.spec, self.infer, variables, batches,
            model_points=self.model_points, verbose=False,
        )
        if reduce and self.pc > 1:
            out = self._reduce(out["accumulator"])
        return out

    def _reduce(self, acc) -> dict:
        """Sum per-process counters into the global report (all processes)."""
        from pyrapose_tpu.parallel.multihost import process_concat, process_sum

        for field in ("all_poses", "true_poses", "false_poses", "true_dets"):
            setattr(acc, field, process_sum(getattr(acc, field)))
        acc.add_rel = [float(v) for v in process_concat(
            np.asarray(acc.add_rel, np.float32)
        )]
        out = acc.report()
        out["accumulator"] = acc
        return out


def run_train(args) -> int:
    # NOTE: --coordinator (multi-host) is handled in cli/main.py BEFORE this
    # module is imported: jax.distributed.initialize must run before the
    # train stack's imports initialize the XLA backend. Programmatic users
    # call parallel.multihost.initialize_distributed first, same reason.
    image_shape = (args.image_min_side, args.image_max_side)
    spec = dataset_spec(args.dataset if args.dataset != "synthetic" else "linemod",
                        args.data_path)
    if spec.image_shape != image_shape:
        spec = dataclasses.replace(spec, image_shape=image_shape)

    anchors = None
    if getattr(args, "config", None):
        from pyrapose_tpu.utils.config import anchor_config_from_file

        anchors = anchor_config_from_file(args.config)
        print(f"anchor parameters from {args.config}: {anchors}")

    model_kwargs = dict(num_classes=spec.num_classes, backbone=args.backbone)
    if getattr(args, "remat", False):
        model_kwargs["remat"] = True
    if getattr(args, "train_bn", False):
        model_kwargs["frozen_bn"] = False
    pipe_kwargs = dict(image_shape=image_shape, num_classes=spec.num_classes)
    if anchors is not None:
        model_kwargs["anchors"] = anchors
        pipe_kwargs["anchors"] = anchors
    config = ModelConfig(**model_kwargs)
    pipe = PipelineConfig(**pipe_kwargs)

    import math

    n_dev = jax.device_count()
    n_proc = jax.process_count()
    spatial = max(getattr(args, "spatial", 1), 1)
    if n_proc > 1:
        if spatial > 1:
            raise ValueError(
                "--spatial with multi-host is not supported yet (spatial "
                "sharding assumes all row shards are process-local)"
            )
        if args.batch_size % n_dev:
            raise ValueError(
                f"--batch-size {args.batch_size} must divide over "
                f"{n_dev} global devices for multi-host DP"
            )
        mesh = create_mesh(jax.devices())
        print(
            f"devices: {n_dev} over {n_proc} processes "
            f"({jax.devices()[0].platform}, global DP mesh)"
        )
    elif spatial > 1:
        from pyrapose_tpu.parallel import create_mesh_2d

        data_dev = math.gcd(args.batch_size, n_dev // spatial)
        if data_dev * spatial > n_dev:
            raise ValueError(
                f"--spatial {spatial} needs {spatial}x devices; have {n_dev}"
            )
        # XLA SPMD miscompiles bf16 gradients under combined data x spatial
        # sharding (tests/test_xla_bugs.py); float32 is exact there.
        if "float32" not in str(getattr(config, "compute_dtype", "")):
            print("NOTE: --spatial forces float32 compute (XLA SPMD bf16 "
                  "grad bug on mixed meshes, tests/test_xla_bugs.py)")
            config = dataclasses.replace(config, compute_dtype="float32")
        mesh = create_mesh_2d(data_dev, spatial)
        print(f"devices: {data_dev}x{spatial} data x spatial "
              f"({jax.devices()[0].platform})")
    else:
        use = math.gcd(args.batch_size, n_dev)
        if use < n_dev:
            print(
                f"WARNING: batch size {args.batch_size} not divisible by "
                f"{n_dev} devices; using a {use}-device mesh"
            )
        mesh = create_mesh(jax.devices()[:use])
        print(f"devices: {use} ({jax.devices()[0].platform})")

    # backend attach succeeded: hand over from the import-time init
    # watchdog (cli/main.py) to the train loop's own (armed below) —
    # staging/compile between here and the loop may legitimately be slow
    init_wd = getattr(args, "_init_watchdog", None)
    if init_wd is not None:
        init_wd.stop()

    state = create_train_state(
        jax.random.PRNGKey(args.seed),
        config,
        image_shape=image_shape,
        learning_rate=args.lr,
        # stem/stage1 frozen by default (reference models/resnet.py:100-103);
        # --freeze-backbone freezes the whole backbone (bin/train.py:72-74);
        # --no-freeze-stem unfreezes everything (from-scratch training)
        freeze_backbone_stem=not getattr(args, "no_freeze_stem", False),
        freeze_backbone=args.freeze_backbone,
        head_l2=getattr(args, "head_l2", 1e-3),
    )
    if getattr(args, "imagenet_weights", False) or getattr(
        args, "pretrained_file", None
    ):
        from pyrapose_tpu.models.pretrained import load_imagenet_backbone

        variables = load_imagenet_backbone(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.backbone,
            local_file=getattr(args, "pretrained_file", None),
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        print("backbone initialized from ImageNet weights")
    snapshot = args.snapshot
    if getattr(args, "auto_resume", False):
        # preemption recovery: restart with identical args picks up where
        # the previous incarnation saved (extends the reference's manual
        # --snapshot restart, bin/train.py:291,336-343). An explicit
        # --snapshot (warm start) is only the starting point: once this
        # run has saved NEWER checkpoints into --snapshot-path, restarts
        # must prefer those — and a stale/typo'd --snapshot must not put a
        # supervised run into a crash loop (restore raced a rotation).
        import os as _os

        from pyrapose_tpu.train.checkpoint import latest_checkpoint

        latest = latest_checkpoint(args.snapshot_path)
        if snapshot and not _os.path.exists(snapshot):
            print(f"WARNING: --snapshot {snapshot} not found; "
                  f"auto-resume falls back to {latest or 'fresh init'}")
            snapshot = latest
        elif latest and (
            not snapshot
            or _os.path.getmtime(latest) > _os.path.getmtime(snapshot)
        ):
            snapshot = latest
        if snapshot:
            print(f"--auto-resume: using {snapshot}")
    if snapshot:
        state = restore_checkpoint(state, snapshot)
        print(f"resumed from {snapshot} at step {int(state.step)}")
        if not getattr(args, "auto_resume", False):
            # warm start (reference semantics, bin/train.py:291: --snapshot
            # loads weights, then the FULL epoch count trains): the restored
            # step must not leak into the epoch arithmetic, or a checkpoint
            # from a finished pretrain makes range(start_epoch, epochs)
            # empty and the run exits 0 having trained nothing. Resume
            # (--auto-resume) keeps the step: same run, same schedule.
            import jax.numpy as _jnp

            state = state.replace(step=_jnp.zeros_like(state.step))
            print("warm start: epoch/step counter reset to 0 "
                  "(use --auto-resume to continue a run in place)")

    use_cache = getattr(args, "device_cache", False)
    if use_cache and n_proc > 1:
        raise ValueError(
            "--device-cache with multi-host is not supported yet (each "
            "process would need its schedule shard staged locally)"
        )
    # cached mode: the host never touches pixels after staging, so BOTH
    # augmentation stages move into the jitted step — the photometric soup
    # (data/device_augment.py) and the geometric scale+translate warp with
    # its GT/pose compensation (data/device_affine.py)
    device_aug = (
        (getattr(args, "device_augment", False) or use_cache)
        and not args.no_augment
        and args.dataset != "synthetic"
    )
    box_weight = getattr(args, "box_loss_weight", 1.0) or 1.0
    if box_weight != 1.0:
        print(f"--box-loss-weight {box_weight}: 3D-box term upweighted")
    geo_only = getattr(args, "augment_geometric_only", False)
    if geo_only and not device_aug:
        print("NOTE: --augment-geometric-only has no effect "
              "(augmentation is off or on the host path)")
    if device_aug and geo_only:
        print("--augment-geometric-only: affine on, photometric off")
    if use_cache:
        from pyrapose_tpu.train.step import make_cached_train_step

        # single dispatch per step: the minibatch gather happens inside the
        # jitted program, against the HBM-resident cache
        step_fn = make_cached_train_step(
            mesh, spec.corners3d, pipe, donate=True,
            augment_seed=args.seed if device_aug else None,
            affine=AugmentConfig() if device_aug else None,
            box_weight=box_weight,
            photometric=not geo_only,
        )
    else:
        step_fn = make_fused_train_step(
            mesh, spec.corners3d, pipe, donate=True,
            augment_seed=args.seed if device_aug else None,
            affine=AugmentConfig() if device_aug else None,
            box_weight=box_weight,
            photometric=not geo_only,
        )
    dataset = _build_dataset(
        args, spec, augment=not args.no_augment and not use_cache
    )
    cache_frames = getattr(args, "device_cache_frames", 0)
    cache_rotate = getattr(args, "device_cache_rotate", 0) or 0
    subset_chunks = None  # (n_chunks, cache_frames) index table, rotation on
    full_dataset = dataset
    if use_cache and cache_frames and len(dataset) > cache_frames:
        from pyrapose_tpu.data.device_cache import SubsetDataset

        if cache_rotate > 0:
            subset_chunks = compute_cache_chunks(
                len(dataset), cache_frames, args.seed
            )
            n_chunks = len(subset_chunks)
            dataset = SubsetDataset(full_dataset, np.sort(subset_chunks[0]))
            print(
                f"--device-cache-rotate: {n_chunks} chunks x "
                f"{cache_frames} frames over {len(full_dataset)}, rotating "
                f"every {cache_rotate} epochs"
            )
        else:
            pick = np.random.default_rng(args.seed).choice(
                len(dataset), cache_frames, replace=False
            )
            pick.sort()
            dataset = SubsetDataset(dataset, pick)
            print(
                f"--device-cache-frames: staging a seed-{args.seed} subset "
                f"of {cache_frames}/{len(dataset.base)} frames"
            )
    if use_cache and device_aug:
        print("--device-cache: photometric + affine augmentation on device")
    plateau = ReduceLROnPlateau(
        factor=getattr(args, "plateau_factor", 0.1),
        patience=getattr(args, "plateau_patience", 2),
    )
    logger = MetricsLogger(
        os.path.join(args.snapshot_path, "metrics.jsonl")
        if args.snapshot_path
        else None
    )

    eval_every = getattr(args, "eval_every", 0) or 0
    val_dataset = None
    model_points = None
    if eval_every > 0:
        val_set = getattr(args, "val_set_name", "val")
        try:
            val_dataset = _build_dataset(args, spec, augment=False,
                                         set_name=val_set)
        except FileNotFoundError:
            print(f"WARNING: no '{val_set}' split; eval uses the train split")
            val_dataset = _build_dataset(args, spec, augment=False)
        if args.data_path:
            from pyrapose_tpu.eval.drivers import load_model_points

            model_points = load_model_points(args.data_path, spec)
    eval_runner = None  # built lazily at the first eval

    profile_dir = getattr(args, "profile_dir", None)
    profile_steps = getattr(args, "profile_steps", 8)
    workers = getattr(args, "workers", 2)
    prefetch_depth = getattr(args, "prefetch", 2)

    cache = None
    current_chunk = -1
    chunk_prefetch = None
    if (
        use_cache
        and subset_chunks is not None
        and len(subset_chunks) > 1
        and getattr(args, "device_cache_prefetch", False)
    ):
        from pyrapose_tpu.data.device_cache import ChunkPrefetcher

        chunk_prefetch = ChunkPrefetcher()
    if use_cache:
        from pyrapose_tpu.data.device_cache import DeviceCache, SubsetDataset

        import math as _math

        flatten_rows = int(_math.prod(mesh.devices.shape)) == 1

        # host-RAM retention of decoded rotation chunks (VERDICT r3 weak #4:
        # the ~530 s background restage was dominated by host-side work —
        # np.load of a multi-GB npz through Python's zipfile contends with
        # the dispatch loop for the one-core host's GIL — not by the H2D
        # transfer alone). The whole decoded set is small next to host RAM
        # (20k frames at 480x640 = 18.4 GB vs 125 GB), so chunks are kept
        # as numpy arrays after their first visit and rotation re-visits
        # pay only the device_put.
        host_chunks: dict = {}
        _decoded_bytes = len(full_dataset) * int(np.prod(spec.image_shape)) * 3
        _avail = _mem_available_bytes()
        retain_host = (
            getattr(args, "device_cache_host_ram", True)
            and (not _avail or _decoded_bytes < 0.45 * _avail)
        )

        def _stage(sub_dataset, disk_name, heartbeat=None):
            # decoded-set disk cache: restarts (--supervise/--auto-resume)
            # and chunk re-visits skip the minutes-long PNG decode pass
            disk_cache = None
            if args.snapshot_path and args.dataset != "synthetic":
                disk_cache = os.path.join(args.snapshot_path, disk_name)
            disk_key = cache_disk_key(spec.image_shape, sub_dataset)
            keep = (
                subset_chunks is not None
                and len(subset_chunks) > 1
                and retain_host
            )
            built = DeviceCache.build(
                sub_dataset, mesh=mesh, num_workers=workers,
                disk_cache=disk_cache,
                disk_key=disk_key,
                # lane-tiled staging feeds the Pallas row gather without
                # ever relayouting the full cache; multi-device meshes keep
                # the image layout (their gather shards by batch via GSPMD)
                flatten_rows=flatten_rows,
                heartbeat=heartbeat,
                preloaded=host_chunks.get(disk_name),
                keep_host=keep and disk_name not in host_chunks,
            )
            if built.host_arrays is not None:
                host_chunks[disk_name] = built.host_arrays
                built.host_arrays = None
            return built

        if subset_chunks is None:
            print("staging dataset to device memory (--device-cache)...")
            cache = _stage(dataset, "device_cache.npz")
        # rotation: staged lazily in the epoch loop (the resumed epoch,
        # not epoch 0, decides which chunk goes to HBM first)
        elif not retain_host:
            if getattr(args, "device_cache_host_ram", True):
                print(
                    f"device-cache: NOT retaining chunks in host RAM "
                    f"(decoded set {_decoded_bytes / 1e9:.1f} GB vs "
                    f"{_avail / 1e9:.1f} GB available)"
                )
        else:
            # launch-time preload of every prestaged chunk into host RAM:
            # the disk reads run while the chip is still idle (before the
            # first compile) instead of inside the training timeline, so
            # even the FIRST rotation cycle's background stages are
            # device_put-only. Skipped per-chunk when the npz is missing
            # (that chunk decodes + retains on first visit instead).
            import time as _time

            t0 = _time.monotonic()
            for w in range(len(subset_chunks)):
                disk_name = f"device_cache_c{w}.npz"
                if not args.snapshot_path or args.dataset == "synthetic":
                    break
                path = os.path.join(args.snapshot_path, disk_name)
                sub = SubsetDataset(
                    full_dataset, np.sort(subset_chunks[w])
                )
                key = cache_disk_key(spec.image_shape, sub)
                imgs, g = DeviceCache._load_disk(
                    path, len(sub), verbose=False, expect_key=key
                )
                if imgs is not None:
                    host_chunks[disk_name] = (imgs, g)
            if host_chunks:
                print(
                    f"device-cache: preloaded {len(host_chunks)}/"
                    f"{len(subset_chunks)} chunks to host RAM "
                    f"({_time.monotonic() - t0:.1f}s)", flush=True
                )

    steps_per_epoch = args.steps_per_epoch or max(len(dataset) // args.batch_size, 1)
    profiling = False

    max_steps = getattr(args, "max_steps", 0) or 0
    # graceful external stop: `touch {snapshot_path}/STOP` makes the loop
    # save a checkpoint and exit 0 at the next beat boundary (so a
    # --supervise parent does NOT restart it, unlike SIGKILL). Consumed
    # (deleted) at startup so the next --auto-resume run is not a no-op.
    # Single-process only: a per-host file seen by one process of a
    # multi-host job would desync the cluster's collectives.
    stop_file = (
        os.path.join(args.snapshot_path, "STOP")
        if args.snapshot_path and n_proc == 1
        else None
    )
    if stop_file and os.path.exists(stop_file):
        os.remove(stop_file)
        print(f"removed stale stop sentinel {stop_file}")
    save_every = getattr(args, "save_every", 0) or 0
    keep_checkpoints = getattr(args, "keep_checkpoints", 0) or 0
    save_epochs = max(getattr(args, "save_epochs", 1) or 1, 1)
    primary = n_proc == 1 or jax.process_index() == 0
    # stall watchdog: armed AFTER the first epoch-end fetch (cold compile
    # can legitimately take many minutes); beats at every host-visible sync
    # point. A wedged device transport turns into exit(17) + stack dump,
    # which --supervise/--auto-resume heal by restarting from the newest
    # checkpoint (pyrapose_tpu/watchdog.py).
    from pyrapose_tpu.watchdog import (
        EXIT_RESTART,
        StallWatchdog,
        host_rss_gb,
    )

    watchdog = StallWatchdog(
        getattr(args, "stall_timeout", 0) or 0, label="train"
    )
    # resume mid-training: the (seed, epoch)-keyed schedule lets us jump to
    # the exact (epoch, step-within-epoch) the previous incarnation reached
    global_step = int(state.step)
    start_epoch = min(global_step // steps_per_epoch, args.epochs)
    done = False
    warmup = max(getattr(args, "warmup_epochs", 0), 0)

    cosine = bool(getattr(args, "cosine_decay", False))

    # eval preflight: exercise the full in-training eval path on one batch
    # BEFORE the first epoch, so a broken eval stack fails at launch (cost:
    # the inference compile, which the real evals reuse) instead of at the
    # first epoch-boundary eval. ALL processes join — the runner's reduce
    # path is skipped but the inference program itself must be process-local
    # everywhere anyway. Disable with --no-eval-preflight (tiny smoke runs).
    if (
        eval_every > 0
        and start_epoch < args.epochs
        and getattr(args, "eval_preflight", True)
    ):
        if eval_runner is None:
            eval_runner = _EvalRunner(args, spec, val_dataset,
                                      model_points, config)
        t0 = time.time()
        eval_runner.preflight(state)
        if primary:
            print(f"eval preflight ok ({time.time() - t0:.1f}s)")

    for epoch in range(start_epoch, args.epochs):
        # linear per-epoch LR warmup (from-scratch runs at higher LR need
        # it; fine-tuning at the reference's 1e-5 does not). Per-epoch
        # granularity keeps the warmup resumable through the (seed, epoch)
        # schedule keying — epochs are sub-minute in cached mode.
        if cosine:
            from pyrapose_tpu.train.schedule import cosine_lr

            set_lr = cosine_lr(args.lr, epoch, args.epochs, warmup)
            if abs(get_learning_rate(state) - set_lr) > 1e-12:
                state = set_learning_rate(state, set_lr)
                if warmup and epoch < warmup:
                    print(f"warmup: lr {set_lr:.2e} ({epoch + 1}/{warmup})")
        elif warmup and epoch < warmup:
            set_lr = args.lr * (epoch + 1) / warmup
            if abs(get_learning_rate(state) - set_lr) > 1e-12:
                state = set_learning_rate(state, set_lr)
                print(f"warmup: lr {set_lr:.2e} ({epoch + 1}/{warmup})")
        if use_cache and subset_chunks is not None:
            want = (epoch // cache_rotate) % len(subset_chunks)
            if want != current_chunk:
                staged = None
                if chunk_prefetch is not None:
                    staged = chunk_prefetch.take(want, heartbeat=watchdog.beat)
                dataset = SubsetDataset(
                    full_dataset, np.sort(subset_chunks[want])
                )
                if staged is not None:
                    # overlapped rotation: the chunk was decoded+transferred
                    # on a background thread while the previous one trained;
                    # the old chunk frees on rebind
                    print(
                        f"device-cache rotation: chunk "
                        f"{want + 1}/{len(subset_chunks)} prefetched"
                    )
                    cache = staged
                else:
                    # free the old chunk's HBM BEFORE staging the next one —
                    # without prefetch, two resident chunks need not fit
                    cache = None
                    import gc as _gc

                    _gc.collect()
                    print(
                        f"device-cache rotation: staging chunk "
                        f"{want + 1}/{len(subset_chunks)}"
                    )
                    # beats flow through the whole restage (decode batches,
                    # disk load, device_put) — a multi-GB restage under host
                    # contention is slow-but-alive, not a stall
                    cache = _stage(dataset, f"device_cache_c{want}.npz",
                                   heartbeat=watchdog.beat)
                current_chunk = want
                watchdog.beat()
                if chunk_prefetch is not None:
                    # kick off the NEXT rotation's chunk (pure function of
                    # the epoch) — background staging does NOT beat the
                    # watchdog; only the foreground loop does
                    nxt_rot_epoch = (epoch // cache_rotate + 1) * cache_rotate
                    nxt = (nxt_rot_epoch // cache_rotate) % len(subset_chunks)
                    if nxt_rot_epoch < args.epochs and nxt != want:
                        chunk_prefetch.start(
                            nxt,
                            lambda w=nxt: _stage(
                                SubsetDataset(
                                    full_dataset, np.sort(subset_chunks[w])
                                ),
                                f"device_cache_c{w}.npz",
                            ),
                        )
        schedule = _epoch_schedule(
            len(dataset), args.batch_size, steps_per_epoch, epoch, args.seed
        )
        skip = global_step - epoch * steps_per_epoch
        if skip > 0:
            schedule = schedule[skip:]
            print(f"resuming epoch {epoch + 1} at step {skip}/{steps_per_epoch}")
        if not schedule:
            continue
        if cache is not None:
            # minibatches gathered in HBM; host sends only index vectors
            prefetched = (np.asarray(idx, np.int32) for idx in schedule)
        elif n_proc > 1:
            # every process derives the identical global schedule from the
            # seed, then loads only its row slice of each batch
            from pyrapose_tpu.parallel import multihost

            local_schedule = multihost.shard_schedule(schedule)
            prefetched = multihost.device_prefetch_global(
                HostPrefetcher(
                    dataset, args.batch_size // n_proc,
                    schedule=local_schedule, num_workers=workers,
                ),
                mesh, depth=prefetch_depth,
            )
        else:
            loader = HostPrefetcher(
                dataset, args.batch_size, schedule=schedule,
                num_workers=workers,
            )
            prefetched = device_prefetch(loader, mesh, depth=prefetch_depth)
        parts_list: list = []
        t0 = time.time()
        for it, item in enumerate(prefetched):
            if profile_dir and epoch == start_epoch and it == 1 and not profiling:
                # skip step 0 (compile); trace a small steady-state window
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if cache is not None:
                state, parts = step_fn(state, cache.images, cache.gt, item)
            else:
                images_u8, gt = item
                state, parts = step_fn(state, images_u8, gt)
            # keep losses on device: a float() here would sync every step,
            # stalling the dispatch pipeline (one tunnel RTT per step on
            # remote-attached TPUs); fetch the whole epoch at once below
            parts_list.append(parts)
            global_step += 1
            if profiling and it >= profile_steps:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile written to {profile_dir}")
            if save_every and global_step % save_every == 0 and primary:
                path = save_checkpoint(state, args.snapshot_path)
                prune_checkpoints(args.snapshot_path, keep_checkpoints)
                watchdog.beat()  # the save synced the device
                print(f"step {global_step}: saved {path}")
            if max_steps and global_step >= max_steps:
                print(f"reached --max-steps {max_steps}; stopping")
                done = True
                break
            if (
                stop_file
                and it % _BEAT_EVERY == 0
                and os.path.exists(stop_file)
            ):
                print(f"stop sentinel {stop_file}; saving and exiting")
                done = True
                break
            # mid-epoch liveness: every _BEAT_EVERY dispatches, fetch a
            # LAGGED step's loss (one scalar; usually already materialized,
            # so the cost is one tunnel RTT and _BEAT_EVERY steps stay in
            # flight) and beat. A genuinely wedged device blocks this fetch
            # -> no beat -> the watchdog fires. Without it the watchdog's
            # granularity is a whole epoch, and an epoch stretched past the
            # timeout by host contention misfires at the epoch-end fetch
            # (observed: pytest saturating a 1-core host pushed a 90s epoch
            # past 1250s and killed a healthy run).
            if it >= _BEAT_EVERY and it % _BEAT_EVERY == 0:
                jax.device_get(parts_list[it - _BEAT_EVERY]["loss"])
                watchdog.beat()
        host_parts = jax.device_get(parts_list)
        watchdog.beat()
        watchdog.start()  # no-op when already running or timeout <= 0
        losses = [float(p["loss"]) for p in host_parts]
        part_sums: dict = {}
        for p in host_parts:
            for k, v in p.items():
                if k.startswith("loss_"):
                    part_sums[k] = part_sums.get(k, 0.0) + float(v)
        dt = time.time() - t0
        mean_loss = float(np.mean(losses))
        imps = len(losses) * args.batch_size / dt
        lr = get_learning_rate(state)
        print(
            f"epoch {epoch + 1}/{args.epochs}: loss {mean_loss:.4f} "
            f"lr {lr:.2e} {imps:.1f} img/s"
        )
        scalars = dict(
            epoch=epoch + 1, step=int(state.step), loss=mean_loss,
            lr=lr, img_s=round(imps, 2),
            losses=[round(v, 6) for v in losses],
            **{k: round(v / max(len(losses), 1), 6) for k, v in part_sums.items()},
        )
        eval_due = (
            not done and eval_every > 0 and (epoch + 1) % eval_every == 0
        )
        # checkpoint BEFORE the epoch-boundary eval (VERDICT r3 weak #1:
        # the old eval-then-save ordering made every in-training eval a
        # --save-epochs-sized bet — the r3 epoch-10 eval crash destroyed
        # all 10 unsaved epochs). An eval epoch therefore always saves
        # first, even off the --save-epochs cadence.
        saved_this_epoch = False
        if primary and (
            (epoch + 1) % save_epochs == 0
            or eval_due
            or done
            or epoch + 1 == args.epochs
        ):
            path = save_checkpoint(state, args.snapshot_path)
            prune_checkpoints(args.snapshot_path, keep_checkpoints)
            watchdog.beat()
            print(f"saved {path}")
            saved_this_epoch = True
        if eval_due:
            # ALL processes join (the multi-host reduction is a collective
            # — a primary-only dispatch would deadlock the cluster); only
            # the primary logs the identical reduced report
            if eval_runner is None:
                eval_runner = _EvalRunner(args, spec, val_dataset,
                                          model_points, config)
            try:
                report = eval_runner(state)
            except Exception:
                # a broken eval degrades to a missing metric, not a dead
                # run (the checkpoint above already banked the epoch).
                # Single-process only in effect: multi-host runs execute
                # the same program everywhere, so a raise here is
                # symmetric and the cluster stays in step.
                import traceback

                traceback.print_exc()
                if primary:
                    scalars["val_error"] = "eval raised (see traceback above)"
                    print("  val: EVAL FAILED — continuing without metric")
            else:
                watchdog.beat()
                if primary:
                    scalars["val_recall"] = report["mean_recall"]
                    scalars["val_detection_rate"] = report["mean_detection_rate"]
                    scalars["val_median_add_rel"] = report["median_add_rel"]
                    print(
                        f"  val: recall {report['mean_recall']:.4f} "
                        f"det {report['mean_detection_rate']:.4f} "
                        f"median ADD/d {report['median_add_rel']:.3f}"
                    )
        if primary:
            logger.log(**scalars)
        # the loss is replicated, so every process computes the same plateau
        # decision without communicating
        # plateau tracking starts AFTER warmup: the fast improvement at
        # tiny warmup LRs sets a 'best' the full-LR epochs then look
        # noisy against, triggering a spurious 10x cut
        if epoch >= warmup and not cosine:
            new_lr = plateau.update(mean_loss, lr)
            if new_lr != lr:
                state = set_learning_rate(state, new_lr)
        # (the end-of-epoch save happens BEFORE the eval block above.
        # Saving pre-plateau means a crash in the same epoch window replays
        # without this epoch's LR cut; the plateau tracker re-cuts after
        # its patience — bounded staleness, vs. the unbounded loss of the
        # old eval-before-save ordering. Cosine/warmup LR is derived from
        # the saved step, so those schedules lose nothing.)
        if done:
            break
        # Voluntary restart before the host OOM-kills us: remote-TPU
        # transport clients leak every transferred byte (watchdog.EXIT_RESTART
        # doc), so chunk-rotated --device-cache runs grow without bound. A
        # graceful save + exit(18) here costs a ~2 min relaunch
        # (--supervise + --auto-resume + warm compile cache) instead of a
        # SIGKILL that loses up to --save-epochs of work. The threshold
        # file ({snapshot_path}/RSS_RESTART_GB) is read every epoch so a
        # live run can be tuned (or disarmed: delete it / write 0) without
        # a restart; the flag covers fresh launches. Single-process only —
        # one host of a multi-host job restarting alone would desync the
        # cluster's collectives.
        rss_limit = float(getattr(args, "rss_restart_gb", 0) or 0)
        if args.snapshot_path and n_proc == 1:
            limit_file = os.path.join(args.snapshot_path, "RSS_RESTART_GB")
            if os.path.exists(limit_file):
                try:
                    with open(limit_file) as f:
                        rss_limit = float(f.read().strip() or 0)
                except (OSError, ValueError):
                    pass
        if rss_limit > 0 and n_proc == 1:
            rss = host_rss_gb()
            if rss > rss_limit:
                if primary and not saved_this_epoch:
                    path = save_checkpoint(state, args.snapshot_path)
                    prune_checkpoints(args.snapshot_path, keep_checkpoints)
                    print(f"saved {path}")
                print(
                    f"host RSS {rss:.1f} GB > {rss_limit:.1f} GB "
                    f"(--rss-restart-gb): transport-leak restart — saved, "
                    f"exiting {EXIT_RESTART} for the supervisor to relaunch"
                )
                watchdog.stop()
                if profiling:
                    jax.profiler.stop_trace()
                logger.close()
                return EXIT_RESTART
    watchdog.stop()
    if profiling:
        jax.profiler.stop_trace()
    logger.close()
    return 0
