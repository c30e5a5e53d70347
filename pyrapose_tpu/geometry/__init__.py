from pyrapose_tpu.geometry.anchors import (
    AnchorConfig,
    generate_base_anchors,
    shift_anchors,
    anchors_for_shape,
    pyramid_shapes,
)
from pyrapose_tpu.geometry.iou import pairwise_iou
from pyrapose_tpu.geometry.box3d import encode_box3d, decode_box3d
from pyrapose_tpu.geometry.rotation import (
    quat_to_matrix,
    matrix_to_quat,
    euler_to_matrix,
    axis_angle_to_matrix,
)
from pyrapose_tpu.geometry.projection import project_points, transform_points
from pyrapose_tpu.geometry.targets import anchor_targets, TargetConfig
