"""Spark operators: vectorized extraction, salting, reassembly,
checkpoint/resume, metrics."""
