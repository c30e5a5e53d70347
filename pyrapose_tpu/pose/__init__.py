from pyrapose_tpu.pose.epnp import epnp
from pyrapose_tpu.pose.refine import refine_pose
from pyrapose_tpu.pose.ransac import ransac_pnp, RansacConfig, class_poses_from_dense
