"""Utilities: trajectory alignment/ATE, logging/metrics, checkpointing."""
