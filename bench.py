"""End-to-end throughput benchmark: preprocess -> PFPN -> decode -> PnP.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: img/s/chip at 480x640 with the full pipeline on device (the
reference's pipeline is GPU inference + host OpenCV PnP at batch 1,
utils/linemod_eval.py:264-534). Baseline for vs_baseline: the north-star
2000 img/s on a v5e-8 == 250 img/s/chip (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from pyrapose_tpu.data import LINEMOD_SPEC
from pyrapose_tpu.inference import build_inference_fn
from pyrapose_tpu.models import ModelConfig, PyraPose

BASELINE_IMG_S_PER_CHIP = 250.0  # north star: 2000 img/s on v5e-8


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    spec = LINEMOD_SPEC
    config = ModelConfig(num_classes=spec.num_classes)
    model = PyraPose(config=config)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 480, 640, 3), dtype=np.uint8)
    )
    cam = jnp.tile(jnp.asarray(spec.intrinsics, jnp.float32), (batch, 1))

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 480, 640, 3), jnp.float32), train=False)
    )(jax.random.PRNGKey(0))

    infer = build_inference_fn(model, spec.corners3d, (480, 640))

    # Warmup / compile.
    for _ in range(warmup):
        poses, aux = infer(variables, images, cam)
    jax.block_until_ready((poses.rot, aux["scores"]))

    t0 = time.perf_counter()
    for _ in range(iters):
        poses, aux = infer(variables, images, cam)
    jax.block_until_ready((poses.rot, aux["scores"]))
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    img_s = batch * iters / dt
    img_s_chip = img_s / max(n_chips, 1)

    print(
        json.dumps(
            {
                "metric": "img_s_per_chip_e2e_480x640",
                "value": round(img_s_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s_chip / BASELINE_IMG_S_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
