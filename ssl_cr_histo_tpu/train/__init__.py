"""Training infrastructure: optimizers, LR schedules, train state,
checkpointing, and the epoch loop."""
