"""Hybrid retrieval: union-pool fusion of sparse and dense scores."""
