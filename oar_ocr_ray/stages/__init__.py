"""Ray Data stage implementations for the extraction pipeline."""
