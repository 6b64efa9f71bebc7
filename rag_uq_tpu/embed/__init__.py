"""Embedding providers.

The reference delegates embeddings to an external Ollama service, one HTTP
call per passage (streaming_index.py:276-288), with a hash fallback
(:267-273). Here embedding is an in-framework, batched, jit-compiled device
op. Three providers behind one interface:

- Sha256Embedder: deterministic hash pseudo-embedding (test double; the
  TPU-native analogue of the reference fallback).
- NgramHashEmbedder: hashed unigram+bigram bag projected through a fixed
  random matrix on device; gives meaningful lexical cosine similarity with
  zero pretrained weights.
- TransformerEmbedder: a real flax encoder (random-init by default, weights
  loadable) — the production seam for a pretrained text encoder.
"""

from rag_uq_tpu.embed.hash_embed import Sha256Embedder, NgramHashEmbedder
from rag_uq_tpu.embed.encoder import TransformerEmbedder, EncoderConfig
from rag_uq_tpu.embed.base import Embedder, get_embedder

__all__ = [
    "Embedder",
    "get_embedder",
    "Sha256Embedder",
    "NgramHashEmbedder",
    "TransformerEmbedder",
    "EncoderConfig",
]
