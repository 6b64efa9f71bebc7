"""Pallas fused top-k kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_uq_tpu.ops.pallas_topk import pallas_cosine_topk
from rag_uq_tpu.ops.topk import cosine_topk


def _mk(rng, cap, dim, bsz):
    emb = rng.normal(size=(cap, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.normal(size=(bsz, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(emb), jnp.asarray(q)


class TestPallasCosineTopK:
    @pytest.mark.parametrize("fan", [1, 2, 3, 4, 8])
    def test_matches_oracle(self, rng, fan):
        emb, q = _mk(rng, cap=512, dim=32, bsz=6)
        size = 450
        pv, pi = pallas_cosine_topk(emb, q, jnp.int32(size), k=8, block=128,
                                    fan=fan, interpret=True)
        ov, oi = cosine_topk(emb, q, jnp.int32(size), 8, block=128)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(oi))
        np.testing.assert_allclose(np.asarray(pv), np.asarray(ov), rtol=1e-5)

    @pytest.mark.parametrize("fan", [2, 4])
    def test_ties_deterministic_fan(self, fan):
        # Duplicate rows force score ties ACROSS candidates extracted in
        # the same iteration; lowest index must still win, as in lax.top_k.
        emb = np.tile(np.eye(4, dtype=np.float32), (8, 1))
        q = np.eye(4, dtype=np.float32)[:2]
        pv, pi = pallas_cosine_topk(
            jnp.asarray(emb), jnp.asarray(q), jnp.int32(32), k=6, block=16,
            fan=fan, interpret=True,
        )
        ov, oi = cosine_topk(jnp.asarray(emb), jnp.asarray(q), jnp.int32(32),
                             6, block=16)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(oi))

    def test_fewer_live_rows_than_k(self, rng):
        emb, q = _mk(rng, cap=256, dim=16, bsz=3)
        pv, pi = pallas_cosine_topk(emb, q, jnp.int32(5), k=8, block=128,
                                    interpret=True)
        pi = np.asarray(pi)
        assert (pi[:, 5:] == -1).all()
        assert (pi[:, :5] >= 0).all()

    def test_empty_index(self, rng):
        emb, q = _mk(rng, cap=128, dim=16, bsz=2)
        pv, pi = pallas_cosine_topk(emb, q, jnp.int32(0), k=4, block=128,
                                    interpret=True)
        assert (np.asarray(pi) == -1).all()

    def test_ties_deterministic(self):
        # Duplicate rows force score ties; lowest index must win, as in
        # lax.top_k.
        emb = np.tile(np.eye(4, dtype=np.float32), (8, 1))  # rows repeat
        q = np.eye(4, dtype=np.float32)[:2]
        pv, pi = pallas_cosine_topk(
            jnp.asarray(emb), jnp.asarray(q), jnp.int32(32), k=4, block=16,
            interpret=True,
        )
        ov, oi = cosine_topk(jnp.asarray(emb), jnp.asarray(q), jnp.int32(32),
                             4, block=16)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(oi))

    def test_bf16_storage(self, rng):
        emb, q = _mk(rng, cap=256, dim=32, bsz=4)
        emb16 = emb.astype(jnp.bfloat16)
        pv, pi = pallas_cosine_topk(emb16, q, jnp.int32(256), k=6, block=128,
                                    interpret=True)
        ov, oi = cosine_topk(emb16, q, jnp.int32(256), 6, block=128)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(oi))
        np.testing.assert_allclose(np.asarray(pv), np.asarray(ov), rtol=1e-2)
