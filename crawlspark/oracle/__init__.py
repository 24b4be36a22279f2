"""Pure-Python single-threaded reference simulator (the parity oracle)."""
