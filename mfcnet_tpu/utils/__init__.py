"""Infra utilities: logging, meters, checkpointing, visualization."""
