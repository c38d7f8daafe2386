from .checkpoint import (
    checkpoint_name,
    load_params,
    load_resume,
    save_params,
    save_resume,
)
from .loop import Trainer, TrainState, evaluate, predict_batches
from .losses import (
    cross_entropy_loss,
    ctc_loss,
    make_loss_fn,
    nll_loss,
    prepare_ctc_targets,
)
from .optim import make_optimizer, set_lr
