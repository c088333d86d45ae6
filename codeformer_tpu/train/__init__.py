"""Training framework: losses, optimizers/schedules, stage models."""
