"""Vectorized (pandas/Arrow) scalar-function surface of crawlspark."""
