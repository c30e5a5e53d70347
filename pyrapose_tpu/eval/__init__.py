from pyrapose_tpu.eval.metrics import (
    add_metric,
    adi_metric,
    rotation_error_deg,
    translation_error,
    reprojection_error,
    visibility_mask,
    vsd_metric,
)
from pyrapose_tpu.eval.render import depth_to_dist, render_depth
from pyrapose_tpu.eval.detection import (
    DetectionConfig,
    Detections,
    clip_boxes,
    corners16_to_aabb,
    filter_detections,
)
from pyrapose_tpu.eval.map import coco_map, evaluate_detections, voc_ap
from pyrapose_tpu.eval.driver import EvalAccumulator, evaluate_dataset, make_add_fn
