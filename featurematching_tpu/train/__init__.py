from featurematching_tpu.train.optimizer import build_optimizer, build_lr_schedule  # noqa: F401
from featurematching_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
