"""Driver-side plans: the BFS superstep loop + snapshot table store."""
