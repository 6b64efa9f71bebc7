"""TinyLM training: next-byte language modeling under jit.

The reference treats its generator as a frozen external service; this
framework owns a decoder (llm/tiny_lm.py), so it also owns the machinery to
train or fine-tune it on corpus text: a teacher-forced next-byte
cross-entropy step (forward without KV cache, full-sequence causal
attention), optax AdamW with clipping and cosine schedule, and data-parallel
sharding over a mesh (batch axis sharded, params replicated — XLA inserts
the gradient psum).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rag_uq_tpu.llm.tiny_lm import BOS, EOS, VOCAB, TinyLM, TinyLMConfig

logger = logging.getLogger(__name__)


class _TrainableDecoder(nn.Module):
    """Full-sequence causal forward (training twin of the decode-mode model).

    Shares parameter structure with llm.tiny_lm.DecoderModel so trained
    params load straight into the sampler via TinyLM.load_params.
    """

    config: TinyLMConfig

    @nn.compact
    def __call__(self, tok: jax.Array) -> jax.Array:  # tok [B, L]
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        length = tok.shape[1]
        positions = jnp.arange(length, dtype=jnp.int32)
        x = nn.Embed(VOCAB, cfg.dim, dtype=dtype)(tok)
        x = x + nn.Embed(cfg.max_total_len, cfg.dim, dtype=dtype)(positions)[None]
        mask = nn.make_causal_mask(tok, dtype=dtype)
        for _ in range(cfg.num_layers):
            h = nn.LayerNorm(dtype=dtype)(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, dtype=dtype, deterministic=True
            )(h, mask=mask)
            x = x + h
            h = nn.LayerNorm(dtype=dtype)(x)
            h = nn.Dense(cfg.mlp_dim, dtype=dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.dim, dtype=dtype)(h)
            x = x + h
        x = nn.LayerNorm(dtype=dtype)(x)
        return nn.Dense(VOCAB, dtype=jnp.float32)(x)  # [B, L, VOCAB]


def encode_corpus(texts: Sequence[str], seq_len: int) -> np.ndarray:
    """Pack texts into [n, seq_len+1] BOS-prefixed byte windows (0-padded)."""
    rows: List[np.ndarray] = []
    for text in texts:
        data = list(text.encode("utf-8"))
        for start in range(0, max(len(data), 1), seq_len):
            window = data[start : start + seq_len]
            row = np.zeros(seq_len + 1, dtype=np.int32)
            row[0] = BOS
            row[1 : 1 + len(window)] = window
            if 1 + len(window) <= seq_len:
                row[1 + len(window)] = EOS
            rows.append(row)
    return np.stack(rows) if rows else np.zeros((0, seq_len + 1), np.int32)


@dataclass
class LMTrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    grad_clip_norm: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 1000
    batch_size: int = 32
    seq_len: int = 128
    seed: int = 0


class TinyLMTrainer:
    """Next-byte LM trainer whose step is one compiled XLA program."""

    def __init__(
        self,
        model_config: Optional[TinyLMConfig] = None,
        config: Optional[LMTrainConfig] = None,
    ):
        self.model_config = model_config or TinyLMConfig()
        self.config = config or LMTrainConfig()
        self.module = _TrainableDecoder(self.model_config)

        rng = jax.random.PRNGKey(self.config.seed)
        dummy = jnp.zeros((1, self.config.seq_len), dtype=jnp.int32)
        self.params = self.module.init(rng, dummy)["params"]

        schedule = optax.warmup_cosine_decay_schedule(
            0.0, self.config.learning_rate, self.config.warmup_steps,
            self.config.total_steps,
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip_norm),
            optax.adamw(schedule, weight_decay=self.config.weight_decay),
        )
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = self.make_train_step()
        self.losses: List[float] = []

    def make_train_step(self):
        module, optimizer = self.module, self.optimizer

        def loss_fn(params, batch):  # batch [B, L+1]
            inputs, targets = batch[:, :-1], batch[:, 1:]
            logits = module.apply({"params": params}, inputs)
            mask = (targets != 0).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
            return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        @jax.jit
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def train_step(self, batch: np.ndarray) -> float:
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(batch)
        )
        loss = float(loss)
        self.losses.append(loss)
        return loss

    def fit(self, texts: Sequence[str], steps: Optional[int] = None) -> List[float]:
        data = encode_corpus(texts, self.config.seq_len)
        rng = np.random.default_rng(self.config.seed)
        steps = steps or self.config.total_steps
        for _ in range(steps):
            idx = rng.integers(0, data.shape[0], size=self.config.batch_size)
            self.train_step(data[idx])
        return self.losses

    def export_sampler(self, seed: int = 0) -> TinyLM:
        """Load the trained params into a sampling TinyLM."""
        lm = TinyLM(self.model_config, seed=seed)
        lm.load_params(self.params)
        return lm
