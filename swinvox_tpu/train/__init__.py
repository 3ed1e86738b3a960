"""Training subsystem: optimizers, train state, jitted steps, loops."""
