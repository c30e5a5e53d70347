from pyrapose_tpu.models.pyrapose import (
    ModelConfig,
    PyraPose,
    create_model,
    decode_predictions,
)
from pyrapose_tpu.models.resnet import ResNet, ResNet50, ResNet101, ResNet152
from pyrapose_tpu.models.pfpn import PFPN
from pyrapose_tpu.models.heads import (
    Box3DHead,
    ClassificationHead,
    MaskHead,
    prior_prob_bias_init,
)
