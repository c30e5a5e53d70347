from pyrapose_tpu.serving.engine import PoseEstimator, ServingConfig
