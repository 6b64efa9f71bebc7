"""Router training: optax AdamW with a fully jit-compiled train step.

Capability parity with the reference's RouterTrainer (rag_uq/router.py:332-517):
AdamW(lr 1e-3, weight_decay 1e-4), grad-clip at global-norm 1.0,
ReduceLROnPlateau(factor 0.5, patience 3) on val loss, per-epoch shuffle +
minibatch steps, early stopping (patience 10), best-val checkpointing, and a
checkpoint containing model params + optimizer state + config + loss history.
Unlike the reference's per-minibatch Python forward/backward on CPU, the
whole step (forward, ApproxNDCG loss, backward, clip, AdamW update, EMA stats
update) is one compiled XLA program.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from rag_uq_tpu.core.config import TrainConfig
from rag_uq_tpu.router.loss import approx_ndcg_loss
from rag_uq_tpu.router.model import RetrievalRouter, normalize_towers

logger = logging.getLogger(__name__)

TrainData = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (bm25, dense, relevance)


class RouterTrainer:
    """Training loop for the RetrievalRouter."""

    def __init__(
        self,
        router: RetrievalRouter,
        learning_rate: float = 1e-3,
        weight_decay: float = 1e-4,
        checkpoint_dir: str = "models/router",
        config: Optional[TrainConfig] = None,
    ):
        self.router = router
        self.config = config or TrainConfig(
            learning_rate=learning_rate,
            weight_decay=weight_decay,
            checkpoint_dir=checkpoint_dir,
        )
        self.checkpoint_dir = self.config.checkpoint_dir
        self.train_losses: List[float] = []
        self.val_losses: List[float] = []

        self._lr = self.config.learning_rate
        self.optimizer = optax.inject_hyperparams(self._make_opt)(
            learning_rate=self._lr
        )
        self.opt_state = self.optimizer.init(self.router.params)
        self._plateau_best = float("inf")
        self._plateau_count = 0

        module = self.router.module
        temperature = self.router.config.temperature
        router_cfg = self.router.config
        decision_w = float(router_cfg.decision_loss_weight)

        def _label_rr(scores, rel):
            """Per-query reciprocal rank of the first relevant (>=0.5) item
            under a tower's scores — vectorized, jit-safe. rank(i) =
            1 + #{j: s_j > s_i}."""
            ranks = 1.0 + jnp.sum(
                scores[..., None, :] > scores[..., :, None], axis=-1
            )
            hit = rel >= 0.5
            return jnp.max(jnp.where(hit, 1.0 / ranks, 0.0), axis=-1)

        def _total_loss(weights, bm25, dense, rel):
            """Shared train/eval objective: ApproxNDCG on the (normalized)
            soft fuse, plus the optional per-query decision BCE. Training
            always fuses SOFT (differentiable) even when the deployment
            gate_policy is binary."""
            b, d = normalize_towers(router_cfg, bm25, dense)
            hybrid = weights * d + (1 - weights) * b
            loss = approx_ndcg_loss(hybrid, rel, None, temperature)
            if decision_w > 0.0:
                # Better-arm target from the SAME labels the rank loss uses;
                # queries where both arms tie on label-RR carry no gradient.
                rr_b = _label_rr(b, rel)
                rr_d = _label_rr(d, rel)
                target = (rr_d > rr_b).astype(jnp.float32)
                decisive = (jnp.abs(rr_d - rr_b) > 1e-9).astype(jnp.float32)
                wq = jnp.clip(jnp.mean(weights, axis=-1), 1e-6, 1.0 - 1e-6)
                bce = -(
                    target * jnp.log(wq) + (1.0 - target) * jnp.log(1.0 - wq)
                )
                loss = loss + decision_w * jnp.sum(bce * decisive) / jnp.maximum(
                    jnp.sum(decisive), 1.0
                )
            return loss

        def loss_fn(params, mutables, bm25, dense, rel, dropout_rng):
            # mutables = {"stats": ..., plus batch_stats when use_batch_norm}.
            weights, updated = module.apply(
                {"params": params, **mutables},
                bm25,
                dense,
                update_stats=True,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=list(mutables.keys()),
            )
            return _total_loss(weights, bm25, dense, rel), dict(updated)

        @jax.jit
        def train_step(params, mutables, opt_state, bm25, dense, rel, rng):
            (loss, new_mutables), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, mutables, bm25, dense, rel, rng)
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_mutables, new_opt_state, loss

        @jax.jit
        def eval_step(params, mutables, bm25, dense, rel):
            weights = module.apply(
                {"params": params, **mutables},
                bm25,
                dense,
                update_stats=False,
                train=False,
            )
            return _total_loss(weights, bm25, dense, rel)

        self._train_step = train_step
        self._eval_step = eval_step
        self._rng = jax.random.PRNGKey(self.config.seed)

    def _make_opt(self, learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip_norm),
            optax.adamw(learning_rate, weight_decay=self.config.weight_decay),
        )

    # -- steps -------------------------------------------------------------------

    def train_epoch(self, train_data: TrainData) -> float:
        """One optimizer step on the given (mini)batch (parity :370-402)."""
        bm25, dense, rel = (jnp.asarray(a, dtype=jnp.float32) for a in train_data)
        self._rng, sub = jax.random.split(self._rng)
        mutables = {"stats": self.router.stats, **self.router.extra}
        params, mutables, opt_state, loss = self._train_step(
            self.router.params, mutables, self.opt_state,
            bm25, dense, rel, sub,
        )
        self.router.params = params
        self.router.stats = mutables.pop("stats")
        self.router.extra = mutables
        self.opt_state = opt_state
        return float(loss)

    def validate(self, val_data: TrainData) -> float:
        bm25, dense, rel = (jnp.asarray(a, dtype=jnp.float32) for a in val_data)
        mutables = {"stats": self.router.stats, **self.router.extra}
        return float(
            self._eval_step(self.router.params, mutables, bm25, dense, rel)
        )

    def _plateau_step(self, val_loss: float) -> None:
        """ReduceLROnPlateau(factor, patience) on the injected lr."""
        if val_loss < self._plateau_best:
            self._plateau_best = val_loss
            self._plateau_count = 0
            return
        self._plateau_count += 1
        if self._plateau_count > self.config.plateau_patience:
            self._lr *= self.config.plateau_factor
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(self._lr)
            self._plateau_count = 0
            logger.info("Reduced learning rate to %g", self._lr)

    # -- fit ----------------------------------------------------------------------

    def fit(
        self,
        train_data: TrainData,
        val_data: Optional[TrainData] = None,
        num_epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        early_stopping_patience: Optional[int] = None,
    ) -> Dict[str, list]:
        """Shuffled-minibatch training with early stopping (parity :419-497)."""
        num_epochs = num_epochs or self.config.num_epochs
        batch_size = batch_size or self.config.batch_size
        patience = early_stopping_patience or self.config.early_stopping_patience

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        bm25_train, dense_train, rel_train = (
            np.asarray(a, dtype=np.float32) for a in train_data
        )
        # Record the candidate-pool width the gate sees during training so
        # serving can clamp its scoring pool to the same distribution.
        self.router.trained_num_passages = int(bm25_train.shape[1])
        num_samples = bm25_train.shape[0]
        shuffle_rng = np.random.default_rng(self.config.seed)

        best_val_loss = float("inf")
        patience_counter = 0

        for epoch in range(num_epochs):
            perm = shuffle_rng.permutation(num_samples)
            epoch_losses = []
            for i in range(0, num_samples, batch_size):
                sel = perm[i : i + batch_size]
                loss = self.train_epoch(
                    (bm25_train[sel], dense_train[sel], rel_train[sel])
                )
                epoch_losses.append(loss)
            avg_train = float(np.mean(epoch_losses))
            self.train_losses.append(avg_train)

            if val_data is not None:
                val_loss = self.validate(val_data)
                self.val_losses.append(val_loss)
                self._plateau_step(val_loss)
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    patience_counter = 0
                    self.save_checkpoint(
                        os.path.join(self.checkpoint_dir, "best_router.msgpack")
                    )
                else:
                    patience_counter += 1
                logger.info(
                    "Epoch %d/%d - Train Loss: %.4f, Val Loss: %.4f",
                    epoch + 1, num_epochs, avg_train, val_loss,
                )
                if patience_counter >= patience:
                    logger.info("Early stopping at epoch %d", epoch + 1)
                    break
            else:
                logger.info(
                    "Epoch %d/%d - Train Loss: %.4f", epoch + 1, num_epochs, avg_train
                )

        return {"train_losses": self.train_losses, "val_losses": self.val_losses}

    # -- checkpointing ---------------------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        """Params + EMA stats + optimizer state + config + loss history."""
        payload = {
            "params": self.router.params,
            "stats": self.router.stats,
            "opt_state": self.opt_state,
        }
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        meta = {
            "config": vars(self.router.config),
            "train_config": vars(self.config),
            "lr": self._lr,
            "trained_num_passages": self.router.trained_num_passages,
            "train_losses": self.train_losses,
            "val_losses": self.val_losses,
        }
        with open(str(path) + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        logger.info("Saved checkpoint to %s", path)

    def load_checkpoint(self, path: str) -> None:
        meta: Dict = {}
        meta_path = str(path) + ".json"
        if Path(meta_path).exists():
            with open(meta_path) as f:
                meta = json.load(f)
        stored_cfg = meta.get("config")
        if stored_cfg:
            # Checkpoints carry their architecture (e.g. feature_set,
            # hidden_dim). If it differs from the live router's, rebuild the
            # router and the jitted steps to match BEFORE deserializing, so
            # a default-constructed RetrievalRouter can load any checkpoint.
            import dataclasses

            from rag_uq_tpu.core.config import RouterConfig

            known = {f.name for f in dataclasses.fields(RouterConfig)}
            cfg = RouterConfig(
                **{k: v for k, v in stored_cfg.items() if k in known}
            )
            if vars(cfg) != vars(self.router.config):
                logger.info(
                    "Checkpoint architecture differs (%s); rebuilding router",
                    {k: v for k, v in vars(cfg).items()
                     if vars(self.router.config).get(k) != v},
                )
                # In-place rebuild: callers holding the router object keep
                # a valid reference; then refresh the trainer's jitted steps
                # and optimizer state around the new architecture.
                self.router._rebuild(cfg)
                self.__init__(self.router, config=self.config)
        target = {
            "params": self.router.params,
            "stats": self.router.stats,
            "opt_state": self.opt_state,
        }
        with open(path, "rb") as f:
            restored = serialization.from_bytes(target, f.read())
        self.router.params = restored["params"]
        self.router.stats = restored["stats"]
        self.opt_state = restored["opt_state"]
        if meta:
            self.train_losses = meta.get("train_losses", [])
            self.val_losses = meta.get("val_losses", [])
            self._lr = meta.get("lr", self._lr)
            self.router.trained_num_passages = meta.get("trained_num_passages")
        logger.info("Loaded checkpoint from %s", path)
