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


# Instruction headers matching the three production prompt templates the
# sampler will see, so QA fine-tuning covers all of them:
# cli/evaluate.py::generate_answer (reference run_evaluation.py:67-92),
# uq/conformal.py::_build_prompt (reference confidence.py:378-403), and
# uq/mc.py::build_prompt (reference confidence.py:141-147).
QA_HEADERS = (
    "Answer the question based on the context. Be concise.\n\n",
    "Answer the following question based on the provided context.\n"
    "Be concise and precise.\n\n",
    "Answer the question.\n\n",
)


def build_qa_prompt(question: str, context: str, header: str) -> str:
    return f"{header}Context: {context}\n\nQuestion: {question}\n\nAnswer:"


def encode_qa_examples(
    samples: Sequence[Dict],
    seq_len: int,
    seed: int = 0,
    distractor_texts: Optional[Sequence[str]] = None,
    max_distractors: int = 2,
    min_distractors: int = 0,
    hard_distractors: Optional[Sequence[Sequence[str]]] = None,
    hard_fraction: float = 0.5,
    fit_budget: bool = False,
    gold_first_prob: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """QA fine-tuning rows: [n, seq_len+1] byte ids + [n, seq_len] loss mask.

    Each row is BOS + prompt + " answer" + EOS (0-padded); the mask covers
    only the answer+EOS target positions, so the loss teaches answering,
    not context modeling. With `distractor_texts`,
    min_distractors..max_distractors random passages are shuffled into the
    context around the gold one — matching the evaluation-time
    top-3-passage context distribution so the model learns to SELECT the
    relevant fact, not just copy the only passage.

    Round-3 curriculum knobs (VERDICT r2 next #4 — the eval-time failure
    mode is copying from the WRONG passage):
    - `hard_distractors[i]`: a per-sample pool of confusable passages
      (e.g. same-entity-kind articles, whose sentences share the gold's
      templates and differ only in names/values); each drawn distractor
      comes from it with probability `hard_fraction`. Retrieved passages
      at eval time are similar-looking by construction, so training on
      look-alikes is the distribution match random distractors miss.
    - `fit_budget=True`: add distractors only while the full prompt still
      fits `seq_len`, so the gold passage is never truncated away (a
      middle-trimmed gold makes the example unanswerable label noise).
    - `gold_first_prob`: after the shuffle, move the gold passage to the
      FRONT with this probability — the serving-time context is ordered by
      retrieval score, where the gold leads ~recall@1 of the time. A
      uniformly shuffled curriculum denies the model that position prior,
      which is the ONLY disambiguator on alias (semantic-slice) questions:
      the query entity name appears in no passage, so same-kind confusable
      distractors are content-indistinguishable from the gold (round-4
      extraction-gap decomposition). Keeping it < 1 preserves the
      content-based selection skill on the examples where content does
      disambiguate.
    """
    rng = np.random.default_rng(seed)
    rows: List[np.ndarray] = []
    masks: List[np.ndarray] = []
    for si, s in enumerate(samples):
        question = s["question"]
        answers = s.get("answers") or [s.get("answer", "")]
        answer = answers[0] if answers else ""
        gold_ctx = s.get("context", "") or ""
        if not question or not answer:
            continue
        parts = [gold_ctx]
        if distractor_texts or hard_distractors:
            hard_pool = (
                hard_distractors[si]
                if hard_distractors is not None and len(hard_distractors[si])
                else None
            )
            n_d = int(rng.integers(min_distractors, max_distractors + 1))
            budget = None
            if fit_budget:
                base = len(
                    build_qa_prompt(question, gold_ctx, QA_HEADERS[1]).encode()
                )
                budget = seq_len - len((" " + answer).encode()) - 2 - base
            for _ in range(n_d):
                if hard_pool is not None and rng.random() < hard_fraction:
                    pool = hard_pool
                elif distractor_texts:
                    pool = distractor_texts
                elif hard_pool is not None:
                    pool = hard_pool
                else:
                    break
                # Same-kind pools are built from ALL world articles, so the
                # gold itself is a member: reject it at draw time (a gold
                # duplicate is not a distractor — it makes the example
                # easier, the opposite of the curriculum's point).
                cand = None
                for _attempt in range(4):
                    c = pool[int(rng.integers(len(pool)))]
                    if c != gold_ctx:
                        cand = c
                        break
                if cand is None:
                    continue
                if budget is not None:
                    cost = len(cand.encode()) + 1
                    if cost > budget:
                        continue
                    budget -= cost
                parts.append(cand)
            rng.shuffle(parts)
            if gold_first_prob > 0.0 and rng.random() < gold_first_prob:
                parts.insert(0, parts.pop(parts.index(gold_ctx)))
        header = QA_HEADERS[int(rng.integers(len(QA_HEADERS)))]
        target = (" " + answer).encode("utf-8")
        prompt = build_qa_prompt(question, " ".join(parts), header)
        p_bytes = list(prompt.encode("utf-8"))
        # Budget: BOS + prompt + target + EOS must fit in seq_len + 1.
        room = seq_len - len(target) - 1
        if room <= 0:
            continue
        if len(p_bytes) > room:
            # Trim context bytes from the middle-left: keep the header's
            # start and the "...Question: ... Answer:" tail intact.
            keep_tail = min(len(p_bytes), room * 3 // 4)
            keep_head = room - keep_tail
            p_bytes = p_bytes[:keep_head] + p_bytes[-keep_tail:]
        row = np.zeros(seq_len + 1, dtype=np.int32)
        row[0] = BOS
        row[1 : 1 + len(p_bytes)] = p_bytes
        a_start = 1 + len(p_bytes)
        row[a_start : a_start + len(target)] = list(target)
        row[a_start + len(target)] = EOS
        mask = np.zeros(seq_len, dtype=np.float32)
        # Targets are row[1:]; answer bytes + EOS sit at target positions
        # [a_start - 1, a_start - 1 + len(target)].
        mask[a_start - 1 : a_start + len(target)] = 1.0
        rows.append(row)
        masks.append(mask)
    if not rows:
        return (np.zeros((0, seq_len + 1), np.int32),
                np.zeros((0, seq_len), np.float32))
    return np.stack(rows), np.stack(masks)


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

        # Clip warmup so the cosine decay span stays positive (optax
        # rejects decay_steps=0; hit by e.g. a 1-step smoke fine-tune).
        warmup = min(self.config.warmup_steps,
                     max(self.config.total_steps - 1, 0))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, self.config.learning_rate, warmup,
            max(self.config.total_steps, 1),
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip_norm),
            optax.adamw(schedule, weight_decay=self.config.weight_decay),
        )
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = self.make_train_step()
        self.losses: List[float] = []
        # Explicit lifetime step counter: survives restore_state (which only
        # keeps a 50-entry losses tail), so a save after a restore persists
        # the TRUE step count rather than len(self.losses) — advisor finding
        # r2 (a second restart would otherwise resume from the wrong step
        # and re-run already-completed steps with wrong per-step seeds).
        self.step = 0

    def make_train_step(self):
        module, optimizer = self.module, self.optimizer

        def loss_fn(params, batch, mask):  # batch [B, L+1], mask [B, L]
            inputs, targets = batch[:, :-1], batch[:, 1:]
            logits = module.apply({"params": params}, inputs)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
            return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        @jax.jit
        def step(params, opt_state, batch, mask):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def train_step(self, batch: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
        if mask is None:
            mask = (batch[:, 1:] != 0).astype(np.float32)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(batch), jnp.asarray(mask)
        )
        loss = float(loss)
        self.losses.append(loss)
        self.step += 1
        return loss

    def fit(self, texts: Sequence[str], steps: Optional[int] = None) -> List[float]:
        data = encode_corpus(texts, self.config.seq_len)
        rng = np.random.default_rng(self.config.seed)
        steps = steps or self.config.total_steps
        for _ in range(steps):
            idx = rng.integers(0, data.shape[0], size=self.config.batch_size)
            self.train_step(data[idx])
        return self.losses

    def fit_qa(
        self,
        samples: Sequence[Dict],
        steps: Optional[int] = None,
        seq_len: Optional[int] = None,
        distractor_texts: Optional[Sequence[str]] = None,
    ) -> List[float]:
        """Fine-tune on QA samples ({question, answers, context}) with the
        loss masked to the answer span (see encode_qa_examples)."""
        seq_len = seq_len or self.config.seq_len
        if seq_len > self.model_config.max_total_len:
            raise ValueError(
                f"seq_len {seq_len} exceeds position table "
                f"max_total_len {self.model_config.max_total_len}"
            )
        data, masks = encode_qa_examples(
            samples, seq_len, seed=self.config.seed,
            distractor_texts=distractor_texts,
        )
        if data.shape[0] == 0:
            raise ValueError("no usable QA samples (need question+answer)")
        rng = np.random.default_rng(self.config.seed)
        steps = steps or self.config.total_steps
        for _ in range(steps):
            idx = rng.integers(0, data.shape[0], size=self.config.batch_size)
            self.train_step(data[idx], masks[idx])
        return self.losses

    def export_sampler(self, seed: int = 0) -> TinyLM:
        """Load the trained params into a sampling TinyLM."""
        lm = TinyLM(self.model_config, seed=seed)
        lm.load_params(self.params)
        return lm

    # -- checkpointing ---------------------------------------------------------------

    def save_state(self, path: str) -> None:
        """Full resumable training state: params + opt_state + step count.

        Unlike `save_checkpoint` (inference params only), this lets a long
        run continue across process restarts with the optimizer moments and
        LR schedule position intact.
        """
        import json
        from pathlib import Path

        from flax import serialization

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": self.params, "opt_state": self.opt_state}
            ))
        import os

        os.replace(tmp, path)
        with open(str(path) + ".json", "w") as f:
            json.dump({
                "model_config": vars(self.model_config),
                "train_config": vars(self.config),
                "n_steps": self.step,
                "losses_tail": self.losses[-50:],
            }, f)

    def restore_state(self, path: str) -> int:
        """Restore params/opt_state saved by `save_state`; returns the step
        count to resume from (0 if no checkpoint exists)."""
        import json
        import os

        from flax import serialization

        if not os.path.exists(path):
            return 0
        with open(str(path) + ".json") as f:
            meta = json.load(f)
        with open(path, "rb") as f:
            restored = serialization.from_bytes(
                {"params": self.params, "opt_state": self.opt_state}, f.read()
            )
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.losses = list(meta.get("losses_tail", []))
        self.step = int(meta["n_steps"])
        logger.info("Restored training state from %s at step %d",
                    path, self.step)
        return self.step

    def save_checkpoint(self, path: str) -> None:
        """Trained params + model/train config (msgpack + json sidecar)."""
        import json
        from pathlib import Path

        from flax import serialization

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.params))
        meta = {
            "model_config": vars(self.model_config),
            "train_config": vars(self.config),
            "losses": self.losses[-20:],
            "n_steps": self.step,
        }
        with open(str(path) + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        logger.info("Saved TinyLM checkpoint to %s", path)


def load_lm_checkpoint(path: str, seed: int = 0) -> TinyLM:
    """Rebuild a sampling TinyLM from a saved trainer checkpoint."""
    import json

    from flax import serialization

    with open(str(path) + ".json") as f:
        meta = json.load(f)
    model_config = TinyLMConfig(**meta["model_config"])
    lm = TinyLM(model_config, seed=seed)
    with open(path, "rb") as f:
        lm.load_params(serialization.from_bytes(lm.params, f.read()))
    logger.info("Loaded TinyLM checkpoint from %s", path)
    return lm
