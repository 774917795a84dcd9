"""Training: optax states, EMA, losses, sharded train steps."""
