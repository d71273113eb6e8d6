"""Utilities: image IO, profiling/metrics, checkpointing, logging."""
