"""Flax transformer text encoder (the production embedding seam).

The reference calls an external `nomic-embed-text` service per passage
(streaming_index.py:276-279). Here the encoder is an in-framework flax
transformer whose forward runs batched under jit on the MXU; weights are
random-init by default and loadable via `load_params` (e.g. converted from a
pretrained checkpoint). Inputs are hashed token ids so no tokenizer asset is
required.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.text.tokenize import hash_texts


@dataclass(frozen=True)
class EncoderConfig:
    dim: int = 768
    num_layers: int = 4
    num_heads: int = 12
    mlp_dim: int = 1536
    max_seq_len: int = 128
    vocab_buckets: int = 1 << 15
    dtype: str = "bfloat16"


class TransformerBlock(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        h = nn.LayerNorm(dtype=dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=dtype, deterministic=True
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(dtype=dtype)(x)
        h = nn.Dense(cfg.mlp_dim, dtype=dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(cfg.dim, dtype=dtype)(h)
        return x + h


class EncoderModel(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, ids: jax.Array, lengths: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        positions = jnp.arange(ids.shape[1], dtype=jnp.int32)
        valid = (positions[None, :] < lengths[:, None])  # [B, L]

        tok = nn.Embed(cfg.vocab_buckets, cfg.dim, dtype=dtype)(ids)
        pos = nn.Embed(cfg.max_seq_len, cfg.dim, dtype=dtype)(positions)
        x = tok + pos[None, :, :]

        attn_mask = nn.make_attention_mask(valid, valid, dtype=dtype)
        for _ in range(cfg.num_layers):
            x = TransformerBlock(cfg)(x, attn_mask)
        x = nn.LayerNorm(dtype=dtype)(x)

        # Masked mean pool + L2 normalize.
        m = valid.astype(jnp.float32)[:, :, None]
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled / jnp.maximum(norm, 1e-12)


class TransformerEmbedder:
    """Batched jit-compiled encoder embedder."""

    def __init__(self, config: Optional[EncoderConfig] = None, seed: int = 0):
        self.config = config or EncoderConfig()
        self.dim = self.config.dim
        self.model = EncoderModel(self.config)
        dummy_ids = jnp.zeros((1, self.config.max_seq_len), dtype=jnp.int32)
        dummy_len = jnp.ones((1,), dtype=jnp.int32)
        self.params = self.model.init(jax.random.PRNGKey(seed), dummy_ids, dummy_len)
        self._apply = jax.jit(self.model.apply)

    def load_params(self, params) -> None:
        """Swap in converted pretrained weights (same pytree structure)."""
        self.params = params

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        ids, lengths = hash_texts(
            texts, self.config.vocab_buckets, self.config.max_seq_len
        )
        out = self._apply(self.params, jnp.asarray(ids), jnp.asarray(lengths))
        return np.asarray(out, dtype=np.float32)

    def encode_mesh(self, texts: Sequence[str], mesh) -> np.ndarray:
        """Batch embedding DP-sharded over the mesh's first axis (the
        transformer forward runs on every chip's local batch rows)."""
        from rag_uq_tpu.embed.base import encode_on_mesh

        ids, lengths = hash_texts(
            texts, self.config.vocab_buckets, self.config.max_seq_len
        )
        return encode_on_mesh(
            lambda i, l: self._apply(self.params, i, l), ids, lengths, mesh
        )

    def encode_device(self, ids: jax.Array, lengths: jax.Array) -> jax.Array:
        return self._apply(self.params, ids, lengths)
