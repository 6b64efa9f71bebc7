"""TinyLM training tests: loss decreases, params transfer to the sampler."""

import numpy as np
import pytest

from rag_uq_tpu.llm.tiny_lm import BOS, EOS, TinyLMConfig
from rag_uq_tpu.llm.train import LMTrainConfig, TinyLMTrainer, encode_corpus

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
