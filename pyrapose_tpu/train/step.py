"""Training step: loss, gradients, optimizer, DP sharding.

Optimization recipe matches the reference compile step (bin/train.py:95-102):
Adam(lr=1e-5, clipnorm=1e-3) over {orthogonal_l1, focal, focal-mask}; keras'
`clipnorm` clips each gradient tensor's own L2 norm, reproduced here as a
per-leaf optax transform (optax.clip_by_global_norm has different semantics).
The reference's L2(1e-3) kernel regularizer on the 3D regression head
(models/retinanet.py:108) is added explicitly to the loss over the
`box3d_head` kernel subtree.

Two reference behaviours are expressed as an optax mask instead of graph
surgery: backbone-stem freezing (reference freezes layers < 40 except BN,
models/resnet.py:100-103 -> here: zero updates for `stem_*` and `stage1_*`)
and frozen BatchNorm (handled in the module, models/resnet.py).

Parallelism: data-parallel over the mesh 'data' axis. The step is jitted with
explicit shardings — batch sharded, state replicated — so XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyrapose_tpu.losses import total_loss
from pyrapose_tpu.models import ModelConfig, PyraPose


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # static: stem/stage1 freezing ALSO stop-gradients those subtrees in the
    # loss so XLA prunes their backward convolutions entirely (the optax
    # mask alone zeroes updates but still pays for the gradients)
    freeze_stem: bool = flax.struct.field(pytree_node=False, default=False)
    # static: freeze the ENTIRE backbone (reference --freeze-backbone,
    # bin/train.py:72-74 — on top of the always-frozen first ~40 layers)
    freeze_backbone: bool = flax.struct.field(pytree_node=False, default=False)
    # static: L2 coefficient on the 3D-head kernels (reference
    # kernel_regularizer=l2(1e-3), retinanet.py:108). At the reference's
    # fine-tune setting (ImageNet features, lr 1e-5) the data gradient
    # dominates; from scratch at higher LR the L2 gradient dominates
    # Adam's per-weight normalized update and CRUSHES the head to zero
    # (measured: tower kernel norms 15.4 -> 1.2 over 11k steps while the
    # unregularized cls head grew 3x — regression paralyzed at predicting
    # 0). From-scratch recipes must set --head-l2 0.
    head_l2: float = flax.struct.field(pytree_node=False, default=1e-3)
    # static: LIVE BatchNorm (frozen_bn=False): normalize by batch stats and
    # update the running averages each step. The reference always trains
    # with freeze_bn=True because it fine-tunes ImageNet weights
    # (models/resnet.py:87); from-scratch training needs working BN.
    # Under DP sharding the batch mean/var reduce over the GLOBAL batch
    # (GSPMD turns the batch-axis mean into an all-reduce) — sync-BN for
    # free, no per-replica drift.
    train_bn: bool = flax.struct.field(pytree_node=False, default=False)


HEAD_L2 = 1e-3  # reference kernel_regularizer on the 3D head (retinanet.py:108)


def clip_by_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """keras-style clipnorm: clip each gradient tensor to L2 norm <= max_norm."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(g * g))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def _frozen_mask(params: Any, full_backbone: bool = False) -> Any:
    """True for trainable leaves. By default stem + stage1 of the backbone
    are frozen (reference freezes the first ~40 keras layers,
    models/resnet.py:100-103); with full_backbone the whole backbone subtree
    is frozen (reference --freeze-backbone flag, bin/train.py:72-74)."""

    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        frozen = path[0] == "backbone" and (
            full_backbone
            or path[1].startswith("stem")
            or path[1].startswith("stage1")
        )
        mask[path] = not frozen
    return flax.traverse_util.unflatten_dict(mask)


def make_optimizer(
    learning_rate: float = 1e-5,
    clipnorm: float = 1e-3,
    freeze_backbone_stem: bool = True,
    freeze_backbone: bool = False,
) -> optax.GradientTransformation:
    """Adam + per-leaf clipnorm with injectable lr (for plateau scheduling).

    Flat chain so opt_state is (clip, inject_adam[, freeze]): index 1 always
    holds the InjectHyperparamsState consumed by set_learning_rate.
    """
    parts = [
        clip_by_leaf_norm(clipnorm),
        optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
    ]
    if freeze_backbone_stem or freeze_backbone:
        parts.append(
            optax.masked(
                optax.set_to_zero(),
                lambda params: jax.tree_util.tree_map(
                    lambda keep: not keep,
                    _frozen_mask(params, full_backbone=freeze_backbone),
                ),
            )
        )
    return optax.chain(*parts)


def create_train_state(
    rng: jax.Array,
    config: ModelConfig,
    image_shape: tuple[int, int] = (480, 640),
    learning_rate: float = 1e-5,
    clipnorm: float = 1e-3,
    freeze_backbone_stem: bool = True,
    freeze_backbone: bool = False,
    head_l2: float = HEAD_L2,
) -> TrainState:
    model = PyraPose(config=config)
    dummy = jnp.zeros((1, image_shape[0], image_shape[1], 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(
        learning_rate, clipnorm, freeze_backbone_stem, freeze_backbone
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
        freeze_stem=freeze_backbone_stem,
        freeze_backbone=freeze_backbone,
        head_l2=head_l2,
        train_bn=not config.frozen_bn,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected Adam learning rate (ReduceLROnPlateau support)."""
    inject = state.opt_state[1]
    hyper = dict(inject.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_inject = inject._replace(hyperparams=hyper)
    new_opt_state = (state.opt_state[0], new_inject) + tuple(state.opt_state[2:])
    return state.replace(opt_state=new_opt_state)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state[1].hyperparams["learning_rate"])


def _box3d_head_l2(params: Any, coeff: float = HEAD_L2) -> jnp.ndarray:
    flat = flax.traverse_util.flatten_dict(params)
    acc = 0.0
    for path, leaf in flat.items():
        if path[0] == "box3d_head" and path[-1] == "kernel":
            acc = acc + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return coeff * acc


def train_step(
    state: TrainState, batch: dict[str, jnp.ndarray],
    box_weight: float = 1.0,
) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    """One SGD step. batch = {images, labels, regression, mask}.

    box_weight: see losses.total_loss — static multiplier on the 3D-box
    regression term (1.0 = reference loss compile)."""

    def loss_fn(params):
        if state.freeze_stem or state.freeze_backbone:
            # stop-gradient the frozen subtrees: XLA dead-code-eliminates
            # their backward convolutions (reference freezes the first ~40
            # layers, models/resnet.py:100-103; --freeze-backbone extends
            # this to the whole backbone, bin/train.py:72-74)
            mask = _frozen_mask(params, full_backbone=state.freeze_backbone)
            params = jax.tree_util.tree_map(
                lambda p, keep: p if keep else jax.lax.stop_gradient(p),
                params, mask,
            )
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if state.train_bn:
            outputs, mutated = state.apply_fn(
                variables, batch["images"], train=True,
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            outputs = state.apply_fn(variables, batch["images"], train=True)
            new_stats = state.batch_stats
        loss, parts = total_loss(outputs, batch, box_weight=box_weight)
        if state.head_l2:
            loss = loss + _box3d_head_l2(params, state.head_l2)
        return loss, (parts, new_stats)

    (loss, (parts, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=params, opt_state=opt_state,
        batch_stats=new_stats,
    )
    parts = dict(parts)
    parts["grad_norm"] = optax.global_norm(grads)
    return new_state, parts


def eval_step(state: TrainState, images: jnp.ndarray) -> dict[str, jnp.ndarray]:
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return state.apply_fn(variables, images, train=False)


def make_sharded_train_step(mesh: Mesh, donate: bool = True):
    """jit train_step with DP shardings: batch split on 'data', state replicated."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def _fused_step_body(corners3d, pipe_config, augment_seed: int | None,
                     affine: "AugmentConfig | None" = None,
                     box_weight: float = 1.0,
                     photometric: bool = True):
    """(state, images_u8, gt) -> (state, parts): normalization, optional
    on-device photometric + affine augmentation, anchor-target generation,
    and the optimizer update — one traceable body shared by the loader-fed
    and cache-fed jit wrappers.

    affine (requires augment_seed): also apply the per-sample geometric
    scale+translate augmentation on device (data/device_affine.py) — images
    are warped and the GroundTruth (boxes, poses, validity, P3 slot raster)
    is transformed to match, in host augment_sample order (photometric
    first, reference image.py semantics)."""
    import jax.numpy as jnp

    from pyrapose_tpu.data.pipeline import (
        preprocess_images,
        targets_from_poses,
    )

    if augment_seed is not None:
        # import OUTSIDE the trace (a first import during tracing would
        # create any module-level array constants as leaked tracers)
        from pyrapose_tpu.data import device_augment  # noqa: F401
    if affine is not None and augment_seed is None:
        raise ValueError("affine augmentation requires augment_seed")

    # host constant: embedded at lowering without a device round-trip
    # (see inference.build_inference_fn — remote-TPU constant fetches)
    corners = np.asarray(corners3d, np.float32)

    def fused_step(state: TrainState, images_u8, gt):
        images = images_u8.astype(jnp.float32)
        if augment_seed is not None:
            from pyrapose_tpu.data.device_augment import photometric_batch

            key = jax.random.fold_in(
                jax.random.PRNGKey(augment_seed), state.step
            )
            # split only when affine is on: keeps the photometric stream
            # bit-identical for existing affine-less runs
            if photometric:
                pkey = key if affine is None else jax.random.fold_in(key, 0)
                images = photometric_batch(pkey, images)
            if affine is not None:
                from pyrapose_tpu.data.device_affine import affine_batch

                akey = jax.random.fold_in(key, 1)
                images, gt = affine_batch(akey, images, gt, affine)
        targets = jax.vmap(
            lambda g: targets_from_poses(g, corners, pipe_config)
        )(gt)
        batch = {
            "images": preprocess_images(images),
            "labels": targets.labels,
            "regression": targets.regression,
            "mask": targets.mask,
        }
        return train_step(state, batch, box_weight=box_weight)

    return fused_step


def make_fused_train_step(
    mesh: Mesh,
    corners3d,
    pipe_config,
    donate: bool = True,
    augment_seed: int | None = None,
    affine: "AugmentConfig | None" = None,
    box_weight: float = 1.0,
    photometric: bool = True,
):
    """jit a train step that takes RAW loader output: (state, images_u8, gt).

    Image normalization and the full anchor-target generation run INSIDE the
    step on device (the reference computes targets per batch on host fork
    workers, generator.py:344-358); the host ships only uint8 images and the
    fixed-shape padded GroundTruth. Eliminates the target-fn round trip
    (device -> numpy -> device) the naive loop pays, and shrinks H2D traffic
    to images_u8 + a few KB of GT.

    augment_seed (non-None): also apply the photometric augmentation soup on
    device (data/device_augment.py), keyed by (seed, global step, sample) —
    the host loader then skips its ~25 ms/frame photometric stage entirely.
    """
    from pyrapose_tpu.parallel.mesh import image_sharding

    fused_step = _fused_step_body(corners3d, pipe_config, augment_seed,
                                  affine, box_weight, photometric)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    # On a 2-D (data x spatial) mesh the image rows are additionally split
    # over 'spatial': GSPMD partitions every conv spatially and inserts the
    # halo exchanges (the CNN analogue of sequence parallelism, SURVEY §2.3).
    images_sharded = image_sharding(mesh)

    return jax.jit(
        fused_step,
        in_shardings=(replicated, images_sharded, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_cached_train_step(
    mesh: Mesh,
    corners3d,
    pipe_config,
    donate: bool = True,
    augment_seed: int | None = None,
    affine: "AugmentConfig | None" = None,
    box_weight: float = 1.0,
    photometric: bool = True,
):
    """jit a train step that gathers its minibatch from an HBM-resident
    dataset cache INSIDE the program: fn(state, images_cache, gt_cache, idx).

    One host dispatch per step (vs. ~8 for a tree of out-of-jit gathers plus
    the step itself) — on remote-attached TPUs each dispatch pays tunnel RTT,
    which dominates once the host loader is out of the picture. The caches
    ride along as non-donated replicated args: XLA aliases the same device
    buffers every call, so there is no per-step copy of the cache.
    """
    import jax.numpy as jnp

    from pyrapose_tpu.parallel.mesh import image_sharding

    fused = _fused_step_body(corners3d, pipe_config, augment_seed, affine,
                             box_weight, photometric)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    images_sharded = image_sharding(mesh)

    # single-device mesh: the image gather goes through the Pallas DMA
    # kernel (ops/gather.py) — XLA's row gather serializes and costs ~3 ms
    # against multi-GB caches. Multi-device meshes keep the XLA path: a
    # pallas_call does not partition under GSPMD, and there each device
    # should gather only its batch shard (the sharding constraint below).
    single_dev = int(np.prod(mesh.devices.shape)) == 1

    h, w = pipe_config.image_shape

    def cached_step(state: TrainState, images_cache, gt_cache, idx):
        if single_dev:
            from pyrapose_tpu.ops.gather import gather_rows_pallas

            images_u8 = gather_rows_pallas(images_cache, idx)
        else:
            # constrain the gather OUTPUT to the data sharding: the cache
            # is replicated, so without this every device would gather
            # (and then compute) the whole batch — GSPMD has no reason to
            # split a replicated->replicated gather. With the constraint
            # each device gathers only its batch rows from its local copy.
            images_u8 = jax.lax.with_sharding_constraint(
                jnp.take(images_cache, idx, axis=0), images_sharded
            )
        if images_u8.ndim == 3:
            # cache staged as (D, rows, 128) lane tiles (DeviceCache
            # flatten_rows): relayout only the gathered BATCH (~15 MB),
            # never the multi-GB cache
            images_u8 = images_u8.reshape(images_u8.shape[0], h, w, 3)
        gt = jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                jnp.take(a, idx, axis=0), batch_sharded
            ),
            gt_cache,
        )
        return fused(state, images_u8, gt)

    return jax.jit(
        cached_step,
        in_shardings=(replicated, replicated, replicated, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )
