"""Device ops: fused scoring/top-k kernels and their XLA reference paths."""
