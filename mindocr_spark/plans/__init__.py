"""Logical plans: the end-to-end extraction DataFrame pipelines."""
