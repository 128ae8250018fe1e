"""Training loops, checkpointing, metrics (functional Keras-fit
replacement; SURVEY.md §5.4)."""

from vaemolsim_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from vaemolsim_tpu.train.loop import fit, make_train_step  # noqa: F401
