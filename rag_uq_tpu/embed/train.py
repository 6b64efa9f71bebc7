"""Contrastive training for the TransformerEmbedder (semantic dense retrieval).

The reference gets semantic embeddings from an external pretrained service
(nomic-embed-text over Ollama HTTP, reference: rag_uq/streaming_index.py:276-288)
and therefore has no training loop. This framework owns its encoder, so it
also owns the machinery to *make* it semantic: a symmetric in-batch-negatives
InfoNCE trainer (the standard dual-encoder recipe) whose step is one compiled
XLA program — queries and passages are encoded in a single fused forward
(one [2B, L] batch, keeping the MXU busy), the [B, B] similarity logits are
one matmul, and optax AdamW with clipping and a warmup-cosine schedule
updates the shared tower.

Data comes from (question, gold passage) pairs — e.g. data/synth_wiki.py
worlds — or, lacking QA data, from `synthesize_pairs` (noisy word-span
pseudo-queries over raw corpus text, the same trick bench.py uses).

Data-parallel scaling: `make_train_step(mesh=...)` shards the pair batch
over the mesh's data axis with params replicated; XLA inserts the gradient
psum over ICI. Exercised on the 8-device virtual mesh by
tests/test_encoder_train.py (TestContrastiveTrainer::test_dp_train_step_on_mesh).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from rag_uq_tpu.embed.encoder import EncoderConfig, TransformerEmbedder
from rag_uq_tpu.text.tokenize import hash_texts, tokenize

logger = logging.getLogger(__name__)


@dataclass
class EncoderTrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    grad_clip_norm: float = 1.0
    warmup_steps: int = 50
    total_steps: int = 1000
    batch_size: int = 256
    temperature: float = 0.05  # InfoNCE logit scale (1/tau = 20)
    seed: int = 0


def synthesize_pairs(
    texts: Sequence[str],
    n_pairs: int,
    seed: int = 0,
    min_words: int = 2,
    max_words: int = 6,
    drop_prob: float = 0.2,
) -> Tuple[List[str], List[int]]:
    """Pseudo-queries from raw corpus text: a random word span of the source
    passage with random word dropout. Returns (queries, source indices)."""
    rng = np.random.default_rng(seed)
    queries: List[str] = []
    sources: List[int] = []
    n_texts = len(texts)
    while len(queries) < n_pairs:
        i = int(rng.integers(n_texts))
        words = tokenize(texts[i])
        if len(words) < min_words:
            continue
        span = int(rng.integers(min_words, max_words + 1))
        start = int(rng.integers(0, max(len(words) - span, 0) + 1))
        picked = [
            w for w in words[start : start + span] if rng.random() > drop_prob
        ]
        if not picked:
            picked = [words[start]]
        queries.append(" ".join(picked))
        sources.append(i)
    return queries, sources


# Function words dropped by the "clipped" register; the list matters only
# insofar as it removes template scaffolding, so a small closed set is enough.
_STOPWORDS = frozenset(
    "a an the is are was were be been do does did what which who whom whose "
    "when where why how of in on at by for with from to as that this those "
    "these it its their there here can could would should will shall may "
    "might must and or not no nor so if then than about into over under "
    "out up down off again once".split()
)


def augment_registers(
    queries: Sequence[str],
    seed: int = 0,
    variants_per_query: int = 2,
) -> Tuple[List[str], List[int]]:
    """Surface-register variants of training queries (VERDICT r4 next #4).

    The contrastive pool is synth_wiki template questions, so the encoder
    learns the templates' surface scaffolding along with the content words —
    measured as handwritten dense_only MRR 0.351 vs 0.725 synthetic (the
    reference avoids this by using a general pretrained encoder,
    reference rag_uq/streaming_index.py:276-279). These variants keep the
    content words and perturb exactly the scaffolding axis:

    - "clipped": stopwords removed (the search-query register),
    - "dropout": each word kept with p=0.85 (omission/typo robustness),
    - "shuffled": adjacent-pair swaps (passive/word-order robustness),
    - "keyword": the 3 longest words only (the tersest register).

    Returns (variant_texts, source_indices); pair each variant with its
    source query's positive passage and extend the fit() pool — the
    group-by-passage batch logic already prevents a variant and its source
    landing in one batch as mutual false negatives.
    """
    rng = np.random.default_rng(seed)
    kinds = ("clipped", "dropout", "shuffled", "keyword")
    out_q: List[str] = []
    out_src: List[int] = []
    for i, q in enumerate(queries):
        words = q.split()
        if len(words) < 3:
            continue
        picks = rng.choice(len(kinds), size=min(variants_per_query, len(kinds)),
                           replace=False)
        for k in picks:
            kind = kinds[int(k)]
            if kind == "clipped":
                kept = [w for w in words
                        if w.lower().strip("?.,!'\"") not in _STOPWORDS]
            elif kind == "dropout":
                kept = [w for w in words if rng.random() < 0.85]
            elif kind == "shuffled":
                kept = list(words)
                for j in range(0, len(kept) - 1, 2):
                    if rng.random() < 0.5:
                        kept[j], kept[j + 1] = kept[j + 1], kept[j]
            else:  # keyword
                kept = sorted(words, key=len, reverse=True)[:3]
            if len(kept) >= 2 and kept != words:
                out_q.append(" ".join(kept))
                out_src.append(i)
    return out_q, out_src


class ContrastiveTrainer:
    """Symmetric InfoNCE dual-encoder trainer (shared tower)."""

    def __init__(
        self,
        encoder: Optional[TransformerEmbedder] = None,
        config: Optional[EncoderTrainConfig] = None,
        encoder_config: Optional[EncoderConfig] = None,
    ):
        self.config = config or EncoderTrainConfig()
        self.encoder = encoder or TransformerEmbedder(
            encoder_config, seed=self.config.seed
        )
        self.params = self.encoder.params

        schedule = optax.warmup_cosine_decay_schedule(
            0.0, self.config.learning_rate, self.config.warmup_steps,
            max(self.config.total_steps, self.config.warmup_steps + 1),
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip_norm),
            optax.adamw(schedule, weight_decay=self.config.weight_decay),
        )
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = self.make_train_step()
        self.losses: List[float] = []

    # -- compiled step -----------------------------------------------------------

    def make_train_step(self, mesh: Optional[jax.sharding.Mesh] = None):
        """Build the jitted train step; with `mesh`, the batch is sharded
        over the mesh's data axis (params replicated -> gradient psum)."""
        model = self.encoder.model
        optimizer = self.optimizer
        inv_tau = 1.0 / self.config.temperature

        def loss_fn(params, q_ids, q_len, p_ids, p_len):
            bsz = q_ids.shape[0]
            # One fused forward for both towers (shared parameters).
            ids = jnp.concatenate([q_ids, p_ids], axis=0)
            lens = jnp.concatenate([q_len, p_len], axis=0)
            emb = model.apply(params, ids, lens)  # [2B, D], L2-normalized
            q_emb, p_emb = emb[:bsz], emb[bsz:]
            logits = (q_emb @ p_emb.T) * inv_tau  # [B, B]
            labels = jnp.arange(bsz)
            # Symmetric InfoNCE: query->passage and passage->query.
            l_qp = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            l_pq = optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels
            ).mean()
            return (l_qp + l_pq) / 2.0

        def step(params, opt_state, q_ids, q_len, p_ids, p_len):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, q_ids, q_len, p_ids, p_len
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        if mesh is None:
            return jax.jit(step)
        # DP: shard the batch dim over the mesh's data axis; replicate
        # params/opt state. GSPMD keeps the math identical to single-device:
        # the towers' forwards run on local shards, XLA all-gathers the
        # [B/n, D] embeddings for the global [B, B] InfoNCE logits (global
        # negatives), and the parameter gradients are psum'd over ICI.
        pspec = jax.sharding.PartitionSpec(mesh.axis_names[0])
        batch_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh.axis_names[0], None)
        )
        len_sharding = jax.sharding.NamedSharding(mesh, pspec)
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        return jax.jit(
            step,
            in_shardings=(repl, repl, batch_sharding, len_sharding,
                          batch_sharding, len_sharding),
            out_shardings=(repl, repl, repl),
        )

    def train_step(self, q_ids, q_len, p_ids, p_len) -> float:
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state,
            jnp.asarray(q_ids), jnp.asarray(q_len),
            jnp.asarray(p_ids), jnp.asarray(p_len),
        )
        loss = float(loss)
        self.losses.append(loss)
        return loss

    # -- data + loop ---------------------------------------------------------------

    def encode_pairs(
        self, queries: Sequence[str], passages: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        cfg = self.encoder.config
        q_ids, q_len = hash_texts(queries, cfg.vocab_buckets, cfg.max_seq_len)
        p_ids, p_len = hash_texts(passages, cfg.vocab_buckets, cfg.max_seq_len)
        return q_ids, q_len, p_ids, p_len

    def fit(
        self,
        queries: Sequence[str],
        passages: Sequence[str],
        steps: Optional[int] = None,
        log_every: int = 50,
        on_step: Optional[Callable[[int, float], None]] = None,
    ) -> List[float]:
        """Train on aligned (query, positive passage) pairs.

        Each step samples batch_size pairs WITHOUT replacement within an
        epoch-style shuffled order; in-batch others are the negatives.
        Duplicate passages inside a batch would make the InfoNCE labels
        ambiguous, so sampling is by unique passage first come first served
        per batch.
        """
        assert len(queries) == len(passages) and queries
        q_ids, q_len, p_ids, p_len = self.encode_pairs(queries, passages)
        steps = steps or self.config.total_steps
        bsz = min(self.config.batch_size, len(queries))
        rng = np.random.default_rng(self.config.seed)

        # Pre-group indices by passage identity to avoid duplicate positives
        # in one batch (false negatives for InfoNCE).
        p_key = {}
        group_of = np.zeros(len(passages), dtype=np.int64)
        for i, p in enumerate(passages):
            group_of[i] = p_key.setdefault(p, len(p_key))

        order = rng.permutation(len(queries))
        cursor = 0
        for s in range(steps):
            picked: List[int] = []
            seen_groups: set = set()
            # Walk the shuffled order, skipping same-passage duplicates.
            attempts = 0
            while len(picked) < bsz and attempts < 4 * bsz:
                if cursor >= len(order):
                    order = rng.permutation(len(queries))
                    cursor = 0
                i = int(order[cursor])
                cursor += 1
                attempts += 1
                g = int(group_of[i])
                if g in seen_groups:
                    continue
                seen_groups.add(g)
                picked.append(i)
            idx = np.asarray(picked, dtype=np.int64)
            loss = self.train_step(q_ids[idx], q_len[idx], p_ids[idx], p_len[idx])
            if on_step is not None:
                on_step(s, loss)
            if log_every and (s + 1) % log_every == 0:
                logger.info("step %d/%d loss %.4f", s + 1, steps, loss)
        return self.losses

    # -- export / checkpointing --------------------------------------------------

    def export_embedder(self) -> TransformerEmbedder:
        """Return the encoder with the trained params swapped in."""
        self.encoder.load_params(self.params)
        return self.encoder

    def save_checkpoint(self, path: str) -> None:
        """Trained params + encoder/train config (msgpack + json sidecar)."""
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.params))
        meta = {
            "encoder_config": vars(self.encoder.config),
            "train_config": vars(self.config),
            "losses": self.losses[-20:],
            "n_steps": len(self.losses),
        }
        with open(str(path) + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        logger.info("Saved encoder checkpoint to %s", path)


def load_encoder_checkpoint(path: str) -> TransformerEmbedder:
    """Rebuild a TransformerEmbedder from a saved checkpoint."""
    with open(str(path) + ".json") as f:
        meta = json.load(f)
    enc_cfg = EncoderConfig(**meta["encoder_config"])
    embedder = TransformerEmbedder(enc_cfg)
    with open(path, "rb") as f:
        params = serialization.from_bytes(embedder.params, f.read())
    embedder.load_params(params)
    logger.info("Loaded encoder checkpoint from %s", path)
    return embedder
