"""Training loops, checkpointing, metrics (functional Keras-fit
replacement; SURVEY.md §5.4)."""

from vaemolsim_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from vaemolsim_tpu.train.loop import (  # noqa: F401
    fit,
    fit_ensemble,
    make_train_step,
    stack_models,
    unstack_model,
)
