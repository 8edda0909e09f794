"""Evaluation harnesses (composability matrix, robust-accuracy sweeps)."""
