from pyrapose_tpu.train.step import (
    TrainState,
    create_train_state,
    train_step,
    eval_step,
    make_sharded_train_step,
    make_fused_train_step,
    make_optimizer,
    set_learning_rate,
    get_learning_rate,
)
from pyrapose_tpu.train.schedule import ReduceLROnPlateau
