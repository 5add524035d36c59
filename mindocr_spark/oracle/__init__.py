"""Single-process reference implementation (the correctness oracle)."""
