from pyrapose_tpu.pose.epnp import epnp
from pyrapose_tpu.pose.refine import (
    refine_pose,
    refine_pose_cov,
    scalar_weights_from_covariance,
)
from pyrapose_tpu.pose.ransac import (
    MultiPoseResult,
    RansacConfig,
    class_multi_poses_from_dense,
    class_poses_from_dense,
    ransac_pnp,
)
