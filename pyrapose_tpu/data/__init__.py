from pyrapose_tpu.data.spec import DatasetSpec, LINEMOD_SPEC, dataset_spec
from pyrapose_tpu.data.synthetic import SyntheticPoseDataset
from pyrapose_tpu.data.bop import BopDataset
from pyrapose_tpu.data.datasets import CocoDetectionDataset, create_dataset
from pyrapose_tpu.data.pipeline import (
    PipelineConfig,
    GroundTruth,
    targets_from_poses,
    make_target_fn,
    preprocess_images,
    CAFFE_MEAN_BGR,
)
