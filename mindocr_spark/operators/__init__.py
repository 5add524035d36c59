"""Spark operator stages: vectorized pandas/Arrow UDFs wrapping the shared
numpy kernels, plus native-Catalyst relational glue."""
