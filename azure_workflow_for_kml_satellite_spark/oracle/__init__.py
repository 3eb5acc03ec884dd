"""Sequential single-process reference pipeline (the correctness oracle)."""
