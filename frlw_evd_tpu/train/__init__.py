"""Training runtime: config, schedules, train state, trainer, checkpoints."""

from .config import ExpConfig, EXP_TYPES, make_config
from .schedule import yolox_warm_cos_schedule
from .trainer import Trainer, TrainState, make_train_step, make_eval_step
from .checkpoints import (save_checkpoint, load_checkpoint,
                          import_torch_checkpoint, wait_for_checkpoints)
