"""Device kernel library: the framework's hand-tuned compute primitives.

Most of pyrapose-tpu's compute path is plain XLA (convolutions and large
matmuls belong to the compiler). This namespace indexes the pieces where a
hand-written kernel or numeric specialization beats what XLA emits:

- `refine_pose_batched_pallas` — fused Pallas TPU kernel running every
  Gauss-Newton pose-refinement iteration in one VMEM-resident program
  (pose/pallas_refine.py; ~12% end-to-end inference speedup over the HLO
  pipeline on v5e).
- `epnp_batched_pallas` — fused lane-parallel EPnP hypothesis solver for
  the RANSAC selection stage: 26k+ solves per batch-64 step in one program
  (pose/pallas_epnp.py; pose stage 4.9% -> 2.5% of step time, +2.5% e2e
  on v5e).
- `solve_spd`, `inverse_iteration_spd`, `cholesky_unrolled` — unrolled
  small-matrix (6x6/12x12) linear algebra that vectorizes across batch
  lanes instead of lowering to per-system LU custom calls
  (utils/smallmat.py; 3x pose-stage speedup).
- `heinsum`, `hmatmul` — HIGHEST-precision contractions for numerically
  critical paths under a bf16 compute default (utils/precision.py).
- `pairwise_iou` — the vectorized anchor-assignment IoU that replaces the
  reference's Cython kernel (geometry/iou.py; C++ parity twin in
  cpp/parity_kernels.cpp).
- `refine_pose` / `refine_pose_cov` — analytic-Jacobian Gauss-Newton pose
  refinement with scalar or full symmetric 2x2 per-point weights (the Ceres
  ReprojectionErrorArray cost of the reference's uncertainty_pnp,
  pose/refine.py; C++ parity twins in cpp/parity_kernels.cpp).
"""

from pyrapose_tpu.geometry.iou import pairwise_iou
from pyrapose_tpu.pose.pallas_epnp import (
    epnp_batched_pallas,
    epnp_kernel_constants,
)
from pyrapose_tpu.pose.refine import (
    refine_pose,
    refine_pose_cov,
    scalar_weights_from_covariance,
)
from pyrapose_tpu.pose.pallas_refine import (
    refine_pose_batched,
    refine_pose_batched_pallas,
)
from pyrapose_tpu.utils.precision import heinsum, hmatmul
from pyrapose_tpu.utils.smallmat import (
    cholesky_unrolled,
    inverse_iteration_spd,
    solve_spd,
)

__all__ = [
    "pairwise_iou",
    "cholesky_unrolled",
    "epnp_batched_pallas",
    "epnp_kernel_constants",
    "heinsum",
    "hmatmul",
    "inverse_iteration_spd",
    "refine_pose",
    "refine_pose_batched",
    "refine_pose_batched_pallas",
    "refine_pose_cov",
    "scalar_weights_from_covariance",
    "solve_spd",
]
