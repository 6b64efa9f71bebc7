"""Embedder interface and factory."""

from __future__ import annotations

from typing import Callable, Protocol, Sequence, runtime_checkable

import numpy as np

from rag_uq_tpu.core.config import EmbedderConfig


def encode_on_mesh(
    device_fn: Callable, ids: np.ndarray, lengths: np.ndarray, mesh
) -> np.ndarray:
    """Run an (ids [B, L], lengths [B]) -> [B, D] device encoder DP-sharded
    over the mesh's first axis.

    The batch is padded to a multiple of the axis size and committed with a
    batch-sharded NamedSharding; `device_fn` (a jitted forward with
    replicated parameters) then runs on every chip's local rows — the
    mesh-parallel ingest embedding SURVEY §2.3 row 3 calls for (the
    reference embeds one passage per HTTP call,
    streaming_index.py:286-288). Returns the un-padded [B, D] host array.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = ids.shape[0]
    nd = mesh.shape[axis]
    pad = (-n) % nd
    if pad:
        ids = np.concatenate(
            [ids, np.zeros((pad, ids.shape[1]), dtype=ids.dtype)]
        )
        lengths = np.concatenate(
            [lengths, np.ones((pad,), dtype=lengths.dtype)]
        )
    ids_d = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(axis, None)))
    len_d = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P(axis)))
    out = device_fn(ids_d, len_d)
    return np.asarray(out, dtype=np.float32)[:n]


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
