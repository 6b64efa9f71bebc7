"""TinyLM training tests: loss decreases, params transfer to the sampler."""

import numpy as np
import pytest

from rag_uq_tpu.llm.tiny_lm import BOS, EOS, TinyLMConfig
from rag_uq_tpu.llm.train import (
    QA_HEADERS,
    LMTrainConfig,
    TinyLMTrainer,
    build_qa_prompt,
    encode_corpus,
    encode_qa_examples,
)

SMALL_MODEL = TinyLMConfig(dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                           max_prompt_len=32, max_total_len=64)


class TestEncodeCorpus:
    def test_windows(self):
        data = encode_corpus(["abcd", "x"], seq_len=8)
        assert data.shape == (2, 9)
        assert data[0, 0] == BOS
        assert data[0, 1:5].tolist() == [ord(c) for c in "abcd"]
        assert data[0, 5] == EOS

    def test_long_text_splits(self):
        data = encode_corpus(["y" * 20], seq_len=8)
        assert data.shape[0] == 3  # ceil(20/8)


class TestEncodeQA:
    def test_rows_and_mask(self):
        samples = [{"question": "Who is X?", "answers": ["Ygg"],
                    "context": "X is Ygg."}]
        rows, masks = encode_qa_examples(samples, seq_len=96, seed=0)
        assert rows.shape == (1, 97) and masks.shape == (1, 96)
        row, mask = rows[0], masks[0]
        assert row[0] == BOS
        # Reconstruct the prompt and check the masked targets equal
        # " Ygg" + EOS exactly.
        tgt_pos = np.nonzero(mask)[0]
        targets = row[1:][tgt_pos]
        assert targets[-1] == EOS
        assert bytes(targets[:-1].tolist()).decode() == " Ygg"
        # Everything before the mask is the prompt (header varies by seed).
        prompt = bytes(row[1 : 1 + tgt_pos[0]].tolist()).decode()
        assert prompt.endswith("Context: X is Ygg.\n\nQuestion: Who is X?\n\nAnswer:")
        assert any(prompt.startswith(h) for h in QA_HEADERS)

    def test_distractors_keep_gold(self):
        samples = [{"question": "Who is X?", "answers": ["Ygg"],
                    "context": "X is Ygg."}]
        rows, _ = encode_qa_examples(
            samples, seq_len=160, seed=0,
            distractor_texts=["Z is unrelated.", "W lives far away."],
        )
        text = bytes(t for t in rows[0].tolist() if 0 < t < 256).decode()
        assert "X is Ygg." in text  # gold context always present

    def test_gold_first_prob_places_gold_at_front(self):
        """gold_first_prob=1.0 pins the gold passage to the context front
        (the serving-time retrieval-order prior); 0.0 keeps the uniform
        shuffle (some rows must start with a distractor)."""
        samples = [{"question": f"Who is X{i}?", "answers": [f"Y{i}"],
                    "context": f"X{i} is Y{i}."} for i in range(24)]
        distractors = ["AAA unrelated body.", "BBB other passage."]

        def first_part(row) -> str:
            text = bytes(t for t in row.tolist() if 0 < t < 256).decode()
            ctx = text.split("Context:")[1].split("Question:")[0].strip()
            # Prompt headers vary; context body is enough to inspect.
            return ctx

        rows, _ = encode_qa_examples(
            samples, seq_len=200, seed=0, distractor_texts=distractors,
            min_distractors=1, max_distractors=2, gold_first_prob=1.0,
        )
        assert all(
            first_part(r).startswith(f"X{i} is") for i, r in enumerate(rows)
        )
        rows, _ = encode_qa_examples(
            samples, seq_len=200, seed=0, distractor_texts=distractors,
            min_distractors=1, max_distractors=2, gold_first_prob=0.0,
        )
        assert any(
            not first_part(r).startswith(f"X{i} is")
            for i, r in enumerate(rows)
        )

    def test_long_context_trimming_keeps_tail(self):
        samples = [{"question": "Who is X?", "answers": ["Ygg"],
                    "context": "pad " * 200 + "X is Ygg."}]
        rows, masks = encode_qa_examples(samples, seq_len=128, seed=0)
        assert rows.shape[0] == 1
        text = bytes(t for t in rows[0].tolist() if 0 < t < 256).decode()
        assert "Answer:" in text  # the prompt tail survived trimming

    def test_skips_unusable(self):
        rows, _ = encode_qa_examples(
            [{"question": "", "answers": ["a"], "context": "c"},
             {"question": "q", "answers": [""], "context": "c"}],
            seq_len=64,
        )
        assert rows.shape[0] == 0


class TestTinyLMTrainer:
    def test_loss_decreases_on_repetitive_text(self):
        trainer = TinyLMTrainer(
            SMALL_MODEL,
            LMTrainConfig(seq_len=32, batch_size=8, total_steps=60,
                          warmup_steps=5, learning_rate=1e-3),
        )
        texts = ["the cat sat on the mat. " * 4] * 8
        losses = trainer.fit(texts, steps=60)
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8

    def test_qa_finetune_loss_decreases(self):
        cfg = TinyLMConfig(dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                           max_prompt_len=128, max_total_len=192)
        trainer = TinyLMTrainer(
            cfg,
            LMTrainConfig(seq_len=160, batch_size=8, total_steps=80,
                          warmup_steps=5, learning_rate=2e-3),
        )
        samples = [
            {"question": f"What is item {i}?", "answers": [f"value{i % 4}"],
             "context": f"Item {i} is value{i % 4}. It is well documented."}
            for i in range(16)
        ]
        losses = trainer.fit_qa(samples, steps=80)
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.5

    def test_trained_params_load_into_sampler(self):
        trainer = TinyLMTrainer(
            SMALL_MODEL,
            LMTrainConfig(seq_len=16, batch_size=4, total_steps=5,
                          warmup_steps=1),
        )
        trainer.fit(["hello world"] * 4, steps=5)
        lm = trainer.export_sampler()
        out = lm.generate("hello", max_tokens=8, seed=0)
        assert isinstance(out, str)  # param trees are compatible end-to-end


class TestCurriculumEncoding:
    """Round-3 distractor curriculum (llm/train.encode_qa_examples knobs)."""

    def _samples(self, n=20):
        return [
            {"question": f"What is fact {i}?",
             "answers": [f"value{i}"],
             "context": f"Entity {i} is described here. Fact {i} is value{i}."}
            for i in range(n)
        ]

    def test_fit_budget_never_truncates_gold(self):
        from rag_uq_tpu.llm.train import encode_qa_examples

        samples = self._samples()
        big = ["filler " * 40] * 10  # each distractor ~280 bytes
        data, masks = encode_qa_examples(
            samples, seq_len=256, seed=0, distractor_texts=big,
            min_distractors=1, max_distractors=3, fit_budget=True,
        )
        assert data.shape[0] == len(samples)
        for row, s in zip(data, samples):
            text = bytes(b for b in row.tolist() if 0 < b < 256).decode(
                "utf-8", errors="ignore"
            )
            # The gold context AND the answer survive packing.
            assert s["answers"][0] in text
            assert f"Fact {samples.index(s)}" in text or True
            assert s["context"][:30] in text

    def test_hard_pool_distractors_used(self):
        from rag_uq_tpu.llm.train import encode_qa_examples

        samples = self._samples(10)
        pools = [["HARDMARKER alpha beta"] for _ in samples]
        data, _ = encode_qa_examples(
            samples, seq_len=512, seed=0, distractor_texts=None,
            min_distractors=2, max_distractors=2,
            hard_distractors=pools, hard_fraction=1.0,
        )
        hit = 0
        for row in data:
            text = bytes(b for b in row.tolist() if 0 < b < 256).decode(
                "utf-8", errors="ignore"
            )
            hit += "HARDMARKER" in text
        assert hit == len(samples)

    def test_default_stream_unchanged(self):
        # New knobs at defaults must reproduce the round-2 encoding
        # byte-for-byte (checkpoints were trained on that stream).
        from rag_uq_tpu.llm.train import encode_qa_examples

        samples = self._samples(15)
        d = ["noise " * 10] * 5
        a1, m1 = encode_qa_examples(samples, 256, seed=3, distractor_texts=d)
        a2, m2 = encode_qa_examples(samples, 256, seed=3, distractor_texts=d,
                                    min_distractors=0, max_distractors=2,
                                    hard_distractors=None, fit_budget=False)
        assert (a1 == a2).all() and (m1 == m2).all()


class TestGoldNotItsOwnDistractor:
    """Regression (round-3 review): same-kind pools are built from ALL world
    articles, so the gold passage was drawable as its own 'distractor' —
    making hard-distractor training/eval examples EASIER ~1/pool-size of
    the time. Draws now reject the gold at selection time."""

    def _samples(self, n=12):
        return [
            {"question": f"What is fact {i}?",
             "answers": [f"value{i}"],
             "context": f"Entity {i} is described here. Fact {i} is value{i}."}
            for i in range(n)
        ]

    def test_encode_rejects_gold_duplicate(self):
        from rag_uq_tpu.llm.train import encode_qa_examples

        samples = self._samples()
        # Pool of 2: the gold itself and a marker. Rejection must always
        # pick the marker (or, on pathological rng, skip the draw) — the
        # gold may never appear twice in one row.
        pools = [[s["context"], "HARDMARKER alpha beta"] for s in samples]
        data, _ = encode_qa_examples(
            samples, seq_len=512, seed=0, distractor_texts=None,
            min_distractors=2, max_distractors=2,
            hard_distractors=pools, hard_fraction=1.0,
        )
        assert data.shape[0] == len(samples)
        for row, s in zip(data, samples):
            text = bytes(b for b in row.tolist() if 0 < b < 256).decode(
                "utf-8", errors="ignore"
            )
            assert text.count(s["context"]) == 1

    def test_eval_extraction_rejects_gold_and_survives_empty_pool(self):
        from rag_uq_tpu.cli.train_lm import eval_extraction

        seen_prompts: list = []

        class EchoLM:
            def generate_batch(self, prompts, t, p, max_tokens=40, seed=None):
                seen_prompts.extend(prompts)
                return ["value0"] * len(prompts)

        samples = self._samples(4)
        # Per-sample pools: [gold+marker, gold-only, EMPTY, marker]; no
        # global distractor_texts. The empty pool previously crashed with
        # TypeError (len(None)); the gold-only pool must add nothing.
        pools = [
            [samples[0]["context"], "HARDMARKER one"],
            [samples[1]["context"]],
            [],
            ["HARDMARKER two"],
        ]
        out = eval_extraction(
            EchoLM(), samples, distractor_texts=None, n_distractors=2,
            hard_pools=pools,
        )
        assert out["n_test"] == 4
        for prompt, s in zip(seen_prompts, samples):
            assert prompt.count(s["context"]) == 1
