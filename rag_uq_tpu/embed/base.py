"""Embedder interface and factory."""

from __future__ import annotations

from typing import Protocol, Sequence, runtime_checkable

import numpy as np

from rag_uq_tpu.core.config import EmbedderConfig


@runtime_checkable
class Embedder(Protocol):
    """Batched text -> L2-normalized vectors."""

    dim: int

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Return [len(texts), dim] float32 L2-normalized embeddings."""
        ...


def get_embedder(config: EmbedderConfig) -> Embedder:
    from rag_uq_tpu.embed.encoder import EncoderConfig, TransformerEmbedder
    from rag_uq_tpu.embed.hash_embed import NgramHashEmbedder, Sha256Embedder

    if config.kind == "sha256":
        return Sha256Embedder(dim=config.dim)
    if config.kind == "ngram_hash":
        return NgramHashEmbedder(
            dim=config.dim,
            buckets=config.vocab_hash_buckets,
            seed=config.seed,
            max_len=config.max_seq_len,
        )
    if config.kind == "encoder":
        if config.checkpoint_path:
            from rag_uq_tpu.embed.train import load_encoder_checkpoint

            return load_encoder_checkpoint(config.checkpoint_path)
        return TransformerEmbedder(
            EncoderConfig(
                dim=config.dim,
                num_layers=config.encoder_layers,
                num_heads=config.encoder_heads,
                mlp_dim=config.encoder_mlp_dim,
                max_seq_len=config.max_seq_len,
                vocab_buckets=config.vocab_hash_buckets,
            ),
            seed=config.seed,
        )
    raise ValueError(f"Unknown embedder kind: {config.kind!r}")
