from .config import (
    ExperimentConfig, EXPERIMENTS, LOSS_RECIPES, get_experiment,
    combine_loss_target,
)
from .trainer import (
    PatchTrainer, TrainState, ReduceLROnPlateau, make_loss_fn,
    make_train_step, make_epoch_scan_fn, init_train_state, init_patch,
    build_victim,
)
from .optim import scale_by_torch_amsgrad
