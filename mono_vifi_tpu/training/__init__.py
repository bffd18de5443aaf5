"""Training runtime: model construction, fused jitted train steps, optimizer
and LR schedules, checkpointing."""
