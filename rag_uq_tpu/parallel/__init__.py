"""Multi-chip scale-out: corpus sharding + ICI top-k merge."""
