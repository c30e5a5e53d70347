from pyrapose_tpu.eval.metrics import (
    add_metric,
    adi_metric,
    rotation_error_deg,
    translation_error,
    reprojection_error,
)
from pyrapose_tpu.eval.driver import EvalAccumulator, evaluate_dataset, make_add_fn
