# Training pipeline: losses, metrics, optimizers/schedules, step functions,
# trainer loop, stages (replaces the reference's PyTorch-Lightning stack).
