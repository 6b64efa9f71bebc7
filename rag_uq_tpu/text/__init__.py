"""Host-side text processing: tokenization, vocab, hashing."""

from rag_uq_tpu.text.tokenize import tokenize, hash_tokens, Vocab

__all__ = ["tokenize", "hash_tokens", "Vocab"]
