"""Learned retrieval router: flax MLP gate + ApproxNDCG loss + optax trainer."""
