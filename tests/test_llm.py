"""TinyLM decoder tests: determinism, prompt forcing, batching, top-p."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_uq_tpu.llm.tiny_lm import (
    BOS,
    EOS,
    TinyLM,
    TinyLMConfig,
    sample_top_p,
)

CFG = TinyLMConfig(dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                   max_prompt_len=32, max_total_len=64)


@pytest.fixture(scope="module")
def lm():
    return TinyLM(CFG, seed=0)


class TestSampleTopP:
    def test_greedy_limit(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 50)).astype(np.float32))
        # Tiny temperature + tiny top_p -> argmax.
        out = sample_top_p(
            jax.random.PRNGKey(0), logits,
            jnp.full((4,), 1e-4), jnp.full((4,), 1e-6),
        )
        np.testing.assert_array_equal(np.asarray(out), np.argmax(logits, -1))

    def test_top_p_restricts_support(self, rng):
        logits = jnp.asarray(
            np.log(np.array([[0.6, 0.3, 0.05, 0.05]], dtype=np.float32))
        )
        samples = set()
        for i in range(50):
            s = sample_top_p(
                jax.random.PRNGKey(i), logits,
                jnp.ones((1,)), jnp.full((1,), 0.85),
            )
            samples.add(int(np.asarray(s)[0]))
        assert samples <= {0, 1}  # nucleus = top-2 tokens


class TestTinyLM:
    def test_deterministic_given_seed(self, lm):
        a = lm.generate("hello world", temperature=0.8, seed=42, max_tokens=12)
        b = lm.generate("hello world", temperature=0.8, seed=42, max_tokens=12)
        assert a == b

    def test_seed_changes_output(self, lm):
        outs = {
            lm.generate("hello", temperature=1.0, seed=s, max_tokens=16)
            for s in range(4)
        }
        assert len(outs) > 1  # stochastic across seeds

    def test_batch_matches_interface(self, lm):
        outs = lm.generate_batch(
            ["prompt one", "prompt two", "three"],
            temperatures=[0.5, 1.0, 1.2],
            top_ps=[0.9, 0.8, 0.95],
            max_tokens=8,
            seed=0,
        )
        assert len(outs) == 3
        assert all(isinstance(o, str) for o in outs)

    def test_prompt_encoding(self, lm):
        batch, lens, plen = lm._encode_prompts(["ab", "a"])
        assert batch[0, 0] == BOS and batch[1, 0] == BOS
        assert lens.tolist() == [3, 2]
        assert batch[0, 1] == ord("a") and batch[0, 2] == ord("b")

    def test_long_prompt_truncated(self, lm):
        long_prompt = "x" * 500
        out = lm.generate(long_prompt, max_tokens=4, seed=0)
        assert isinstance(out, str)  # no crash; prompt clipped to max_prompt_len

    def test_long_prompt_keeps_head_and_tail(self, lm):
        # Over-budget prompts must keep the START (where the top-ranked
        # retrieved passage sits) as well as the question tail — the same
        # 1/4 head + 3/4 tail trim the QA trainer applies.
        max_bytes = lm.config.max_prompt_len - 1  # 31 with the test CFG
        keep_tail = max_bytes * 3 // 4
        keep_head = max_bytes - keep_tail
        head = "H" * keep_head
        tail = "T" * keep_tail
        prompt = head + "m" * (2 * max_bytes) + tail
        batch, lens, plen = lm._encode_prompts([prompt])
        kept = bytes(int(b) for b in batch[0, 1:lens[0]]).decode()
        assert kept.startswith(head)
        assert kept.endswith(tail)
        assert lens[0] == max_bytes + 1  # BOS + exactly the byte budget

    def test_decode_stops_at_eos(self):
        toks = np.array([104, 105, EOS, 106, 107])
        assert TinyLM._decode(toks) == "hi"
