"""Checkpoint / resume state for long-running pipelines."""
