"""Core infrastructure: checkpointing, logging, configuration."""
