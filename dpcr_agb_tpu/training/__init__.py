"""Training stack: optimizer/schedules (optax), jitted train/eval steps over a
device mesh, checkpointing, and the Trainer orchestration."""
