"""Config, logging, checkpointing, visualization, torch-checkpoint import."""
