"""Deterministic hash-based embedders.

TPU-native replacements for the reference's embedding fallback
(streaming_index.py:267-273): fully deterministic, no external service, and
(for NgramHashEmbedder) computed batched on device under jit.
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.text.tokenize import fnv1a_64, tokenize


class Sha256Embedder:
    """SHA-256 pseudo-embedding, extended to `dim` via counter blocks.

    Pure test double: deterministic, no semantics. (The reference fallback
    uses the first bytes of one SHA-256 digest; we fill the full dimension by
    hashing `text||block_index` so every component is informative.)
    """

    def __init__(self, dim: int = 768):
        self.dim = dim

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        n_blocks = (self.dim + 31) // 32
        for i, text in enumerate(texts):
            buf = bytearray()
            for blk in range(n_blocks):
                buf += hashlib.sha256(f"{text}\x00{blk}".encode()).digest()
            vec = np.frombuffer(bytes(buf[: self.dim]), dtype=np.uint8)
            out[i] = vec.astype(np.float32) / 255.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


@partial(jax.jit, static_argnames=())
def _bag_embed(table: jax.Array, ids: jax.Array, lengths: jax.Array) -> jax.Array:
    """Masked mean of table rows, L2-normalized. ids: [B, L], lengths: [B]."""
    vecs = table[ids]  # [B, L, D] gather
    mask = (
        jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :] < lengths[:, None]
    ).astype(vecs.dtype)
    summed = jnp.sum(vecs * mask[:, :, None], axis=1)
    denom = jnp.maximum(lengths.astype(vecs.dtype), 1.0)[:, None]
    mean = summed / denom
    mean = mean.astype(jnp.float32)
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return mean / jnp.maximum(norm, 1e-12)


class NgramHashEmbedder:
    """Hashed unigram+bigram bag -> fixed random projection, on device.

    Each token (and adjacent-bigram) hashes into one of `buckets` rows of a
    fixed N(0, 1/sqrt(dim)) table generated from `seed`; a document embeds as
    the L2-normalized masked mean of its feature rows. Cosine similarity then
    reflects lexical n-gram overlap — deterministic, trains nothing, and the
    gather + mean + normalize runs batched under jit.
    """

    def __init__(
        self,
        dim: int = 768,
        buckets: int = 1 << 15,
        seed: int = 0,
        max_len: int = 256,
        use_bigrams: bool = True,
    ):
        self.dim = dim
        self.buckets = buckets
        self.max_len = max_len
        self.use_bigrams = use_bigrams
        key = jax.random.PRNGKey(seed)
        self.table = (
            jax.random.normal(key, (buckets, dim), dtype=jnp.float32)
            / np.sqrt(dim)
        ).astype(jnp.bfloat16)

    def _features(self, text: str) -> List[int]:
        toks = tokenize(text)
        feats = [fnv1a_64(t) % self.buckets for t in toks]
        if self.use_bigrams:
            feats += [
                fnv1a_64(a + "\x1f" + b) % self.buckets
                for a, b in zip(toks, toks[1:])
            ]
        return feats[: self.max_len]

    def _hash_batch(self, texts: Sequence[str]):
        ids = np.zeros((len(texts), self.max_len), dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for i, text in enumerate(texts):
            feats = self._features(text)
            lengths[i] = len(feats)
            if feats:
                ids[i, : len(feats)] = np.asarray(feats, dtype=np.int32)
        return ids, lengths

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        ids, lengths = self._hash_batch(texts)
        out = _bag_embed(self.table, jnp.asarray(ids), jnp.asarray(lengths))
        return np.asarray(out)

    def encode_mesh(self, texts: Sequence[str], mesh) -> np.ndarray:
        """Batch embedding DP-sharded over the mesh's first axis."""
        from rag_uq_tpu.embed.base import encode_on_mesh

        ids, lengths = self._hash_batch(texts)
        return encode_on_mesh(
            lambda i, l: _bag_embed(self.table, i, l), ids, lengths, mesh
        )

    def encode_device(self, ids: jax.Array, lengths: jax.Array) -> jax.Array:
        """Device-side path for pre-hashed inputs (used inside pipelines)."""
        return _bag_embed(self.table, ids, lengths)
