"""Learned retrieval router: a flax MLP gating BM25 vs dense scores.

Parity with the reference's RetrievalRouter (rag_uq/router.py:44-232):
per-passage features [bm25_norm, dense_norm, dense_norm - bm25_norm], MLP
(num_layers-1 hidden blocks of Dense(hidden_dim)+ReLU+Dropout, final
Dense(1)+sigmoid), score normalization by EMA running mean/std (momentum
0.1, sample std with ddof=1 + 1e-6 eps) updated only in train mode, with
batch statistics used until the running stats initialize.

Beyond parity, `RouterConfig.feature_set="pool7"` extends the per-passage
features with pool-context signals (within-pool z-scores + each tower's
broadcast top1-top2 gap). Motivation: the reference's 3 features are all
derived from GLOBAL (EMA) score statistics, so the gate is blind to the
within-query pattern "one BM25 score is a far outlier above this pool" —
exactly the signature of a rare-term needle query where sparse retrieval
is decisive. Measured on the hand-written out-of-family split, the
reference3 gate misroutes such queries to dense
(runs/demo_full_r3/results/handwritten_retrieval_slices.json: hw_inverse
recall@10 = 0.0 while bare BM25 ranks gold first).

The module is pure flax (params + a mutable "stats" collection), so the
train step jits end-to-end; `RetrievalRouter` is the stateful convenience
wrapper with the reference's method surface.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.core.config import RouterConfig

_EPS = 1e-6


def normalize_towers(
    config: RouterConfig, bm25: jax.Array, dense: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-query tower normalization applied before the gate and the fuse.

    fuse_norm="none" passes raw scores through (reference parity,
    router.py:179-202). "maxnorm" divides each tower by its per-query pool
    max, so both towers land on a comparable [<=1] scale and the hybrid fuse
    w*dense+(1-w)*bm25 recovers the pure tower rankings at w=0/1 — the
    property the raw-scale fuse lacks (BM25 O(10-30) vs cosine O(1) means a
    raw fuse is BM25-dominated except at w≈1; measured as the round-5
    router train/deploy failure, capture -0.89 -> +0.48 from this change
    alone). Works under jit; rows of all-nonpositive scores keep their
    within-tower order (divide-by-eps) but are out-of-distribution."""
    if config.fuse_norm == "none":
        return bm25, dense
    if config.fuse_norm != "maxnorm":
        raise ValueError(f"Unknown fuse_norm: {config.fuse_norm!r}")
    b = bm25 / jnp.maximum(jnp.max(bm25, axis=-1, keepdims=True), 1e-12)
    d = dense / jnp.maximum(jnp.max(dense, axis=-1, keepdims=True), 1e-12)
    return b, d


def fuse_hybrid(
    config: RouterConfig,
    weights: jax.Array,
    bm25: jax.Array,
    dense: jax.Array,
) -> jax.Array:
    """Deployment fuse: gate weights + tower scores -> rankable scores.

    gate_policy="soft" is the reference fuse (router.py:199). "binary"
    reads mean(weights) per query as a routing decision and returns the
    pure winning tower's (normalized) scores — serving the arm the gate
    picked instead of a blend. Training always uses the soft fuse; binary
    only changes how a TRAINED gate is deployed (it is not differentiable).
    """
    b, d = normalize_towers(config, bm25, dense)
    if config.gate_policy == "binary":
        wq = jnp.mean(weights, axis=-1, keepdims=True)
        return jnp.where(wq > 0.5, d, b)
    if config.gate_policy != "soft":
        raise ValueError(f"Unknown gate_policy: {config.gate_policy!r}")
    return weights * d + (1.0 - weights) * b


def _sample_std(x: jax.Array) -> jax.Array:
    """Sample standard deviation (ddof=1), matching torch.Tensor.std()."""
    n = x.size
    mean = jnp.mean(x)
    var = jnp.sum((x - mean) ** 2) / jnp.maximum(n - 1, 1)
    return jnp.sqrt(var)


class RouterModule(nn.Module):
    config: RouterConfig

    @nn.compact
    def __call__(
        self,
        bm25_scores: jax.Array,  # [B, P]
        dense_scores: jax.Array,  # [B, P]
        update_stats: bool = True,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.config
        bm25_mean = self.variable("stats", "bm25_mean", lambda: jnp.float32(0.0))
        bm25_std = self.variable("stats", "bm25_std", lambda: jnp.float32(1.0))
        dense_mean = self.variable("stats", "dense_mean", lambda: jnp.float32(0.0))
        dense_std = self.variable("stats", "dense_std", lambda: jnp.float32(1.0))
        initialized = self.variable("stats", "initialized", lambda: jnp.float32(0.0))

        b = bm25_scores.astype(jnp.float32)
        d = dense_scores.astype(jnp.float32)
        # Under fuse_norm="maxnorm" the gate's features (and its EMA score
        # statistics) see the same normalized scale the fuse ranks with, so
        # train and deploy stay in one distribution.
        b, d = normalize_towers(cfg, b, d)

        batch_b_mean, batch_b_std = jnp.mean(b), _sample_std(b) + _EPS
        batch_d_mean, batch_d_std = jnp.mean(d), _sample_std(d) + _EPS

        if update_stats and train:
            m = cfg.ema_momentum
            bm25_mean.value = (1 - m) * bm25_mean.value + m * batch_b_mean
            bm25_std.value = (1 - m) * bm25_std.value + m * batch_b_std
            dense_mean.value = (1 - m) * dense_mean.value + m * batch_d_mean
            dense_std.value = (1 - m) * dense_std.value + m * batch_d_std
            initialized.value = jnp.float32(1.0)

        use_running = initialized.value > 0.5
        b_norm = jnp.where(
            use_running,
            (b - bm25_mean.value) / (bm25_std.value + _EPS),
            (b - batch_b_mean) / (batch_b_std + _EPS),
        )
        d_norm = jnp.where(
            use_running,
            (d - dense_mean.value) / (dense_std.value + _EPS),
            (d - batch_d_mean) / (batch_d_std + _EPS),
        )

        if cfg.feature_set == "pool7":
            # Pool-context features. The EMA z-scores above are GLOBAL: they
            # shift whenever corpus score statistics shift, and a pure
            # per-passage gate cannot see that this query's BM25 top-1 is an
            # outlier above its own candidate pool — the decisive signal on
            # rare-term "needle" queries (one exact match far above the
            # noise floor). Within-pool z-scores are invariant to raw score
            # scale, and the broadcast top1-top2 gap gives every passage the
            # query-level salience of each tower.
            P = b.shape[1]

            def _row_stats(x):
                mean = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.sum((x - mean) ** 2, axis=1, keepdims=True)
                var = var / jnp.maximum(P - 1, 1)
                return mean, jnp.sqrt(var) + _EPS

            bp_mean, bp_std = _row_stats(b)
            dp_mean, dp_std = _row_stats(d)
            b_pool = (b - bp_mean) / bp_std
            d_pool = (d - dp_mean) / dp_std
            if P >= 2:
                b_top2 = jax.lax.top_k(b, 2)[0]
                d_top2 = jax.lax.top_k(d, 2)[0]
                b_gap = (b_top2[:, :1] - b_top2[:, 1:2]) / bp_std
                d_gap = (d_top2[:, :1] - d_top2[:, 1:2]) / dp_std
            else:
                b_gap = jnp.zeros_like(bp_mean)
                d_gap = jnp.zeros_like(dp_mean)
            feats = jnp.stack(
                [
                    b_norm,
                    d_norm,
                    d_norm - b_norm,
                    b_pool,
                    d_pool,
                    jnp.broadcast_to(b_gap, b.shape),
                    jnp.broadcast_to(d_gap, d.shape),
                ],
                axis=-1,
            )  # [B, P, 7]
        else:
            feats = jnp.stack([b_norm, d_norm, d_norm - b_norm], axis=-1)  # [B, P, 3]
        x = feats.reshape(-1, feats.shape[-1])
        for _ in range(cfg.num_layers - 1):
            x = nn.Dense(cfg.hidden_dim)(x)
            if cfg.use_batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        x = nn.Dense(1)(x)
        weights = nn.sigmoid(x)
        return weights.reshape(bm25_scores.shape)


class RetrievalRouter:
    """Stateful wrapper with the reference's method surface (router.py:44-232)."""

    def __init__(self, config: Optional[RouterConfig] = None, seed: int = 0):
        self._rebuild(config or RouterConfig(), seed)
        self._training = False
    def _rebuild(self, config: RouterConfig, seed: int = 0) -> None:
        """(Re)initialize architecture + fresh variables IN PLACE, so callers
        holding this object see a checkpoint loaded under a different
        architecture (RouterTrainer.load_checkpoint rebuilds through here)."""
        self.config = config
        self.module = RouterModule(self.config)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 4), dtype=jnp.float32)
        variables = self.module.init(
            {"params": rng, "dropout": rng}, dummy, dummy, update_stats=False
        )
        self.params = variables["params"]
        self.stats = variables["stats"]
        self.extra = {
            k: v for k, v in variables.items() if k not in ("params", "stats")
        }
        self._dropout_rng = jax.random.PRNGKey(seed + 1)
        # Candidate-pool width the gate was trained on (set by RouterTrainer,
        # persisted in checkpoint metadata). Serving paths clamp the router's
        # scoring pool to this width so the per-column input distribution
        # matches training (advisor r3: pool_p = max(20, 2*top_k) silently
        # widened the pool for top_k > 10).
        self.trained_num_passages: Optional[int] = None

    # -- torch-style mode switches -------------------------------------------

    def train(self) -> "RetrievalRouter":
        self._training = True
        return self

    def eval(self) -> "RetrievalRouter":
        self._training = False
        return self

    @property
    def training(self) -> bool:
        return self._training

    @property
    def stats_initialized(self) -> bool:
        return bool(self.stats["initialized"] > 0.5)

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))

    def _next_dropout(self) -> jax.Array:
        self._dropout_rng, sub = jax.random.split(self._dropout_rng)
        return sub

    # -- forward ----------------------------------------------------------------

    def __call__(self, bm25_scores, dense_scores, update_stats: bool = True):
        return self.forward(bm25_scores, dense_scores, update_stats)

    def forward(self, bm25_scores, dense_scores, update_stats: bool = True):
        """Per-passage gating weights in [0, 1]; 1 favors dense retrieval."""
        bm25_scores = jnp.asarray(bm25_scores, dtype=jnp.float32)
        dense_scores = jnp.asarray(dense_scores, dtype=jnp.float32)
        variables = {"params": self.params, "stats": self.stats, **self.extra}
        if self._training:
            # All non-param collections (EMA stats, and batch_stats when
            # use_batch_norm is on) mutate during training.
            mutable = ["stats"] + list(self.extra.keys())
            weights, updated = self.module.apply(
                variables,
                bm25_scores,
                dense_scores,
                update_stats=update_stats,
                train=True,
                rngs={"dropout": self._next_dropout()},
                mutable=mutable,
            )
            self.stats = updated["stats"]
            for key in self.extra:
                if key in updated:
                    self.extra[key] = updated[key]
        else:
            weights = self.module.apply(
                variables,
                bm25_scores,
                dense_scores,
                update_stats=False,
                train=False,
            )
        return weights

    def hybrid_rerank(
        self, bm25_scores, dense_scores, top_k: int = 10
    ) -> Tuple[jax.Array, jax.Array]:
        """w*dense + (1-w)*bm25, then top-k (parity router.py:179-202).

        Under fuse_norm/gate_policy (config) the fuse is the normalized /
        binary-decision variant — see fuse_hybrid."""
        bm25_scores = jnp.asarray(bm25_scores, dtype=jnp.float32)
        dense_scores = jnp.asarray(dense_scores, dtype=jnp.float32)
        weights = self.forward(bm25_scores, dense_scores, update_stats=False)
        hybrid = fuse_hybrid(self.config, weights, bm25_scores, dense_scores)
        k = min(top_k, hybrid.shape[-1])
        return jax.lax.top_k(hybrid, k)

    def get_routing_decision(
        self, bm25_scores, dense_scores, threshold: float = 0.5
    ) -> Dict[str, Any]:
        """Interpretable routing stats (parity router.py:204-232)."""
        weights = np.asarray(
            self.forward(
                jnp.asarray(bm25_scores, dtype=jnp.float32),
                jnp.asarray(dense_scores, dtype=jnp.float32),
                update_stats=False,
            )
        )
        return {
            "avg_dense_weight": float(weights.mean()),
            "weight_std": float(weights.std(ddof=1)) if weights.size > 1 else 0.0,
            "dense_preferred_ratio": float((weights > threshold).mean()),
            "bm25_preferred_ratio": float((weights <= threshold).mean()),
            "routing_weights": weights,
        }
