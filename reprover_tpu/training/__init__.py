"""Training subsystem: optimizers, train states, jitted task steps."""

from reprover_tpu.training.optim import (
    constant_warmup_schedule,
    make_optimizer,
)
from reprover_tpu.training.tasks import (
    TrainState,
    generation_loss,
    init_train_state,
    make_eval_step,
    make_train_step,
    numeric_batch,
    offload_opt_state,
    retrieval_infonce_loss,
    retrieval_loss,
)

__all__ = [
    "constant_warmup_schedule",
    "make_optimizer",
    "TrainState",
    "generation_loss",
    "init_train_state",
    "make_eval_step",
    "make_train_step",
    "numeric_batch",
    "offload_opt_state",
    "retrieval_infonce_loss",
    "retrieval_loss",
]
