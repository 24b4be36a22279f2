"""Deterministic synthetic sources: the fake web + image documents."""
