"""Data pipeline: chunking, corpus/QA loaders, synthetic generators, verifier."""
