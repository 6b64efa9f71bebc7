"""On-device retrieval indices: dense embedding matrix and sparse CSR BM25."""
