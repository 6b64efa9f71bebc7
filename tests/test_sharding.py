"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that corpus-sharded search (per-shard top-k + ICI merge) is
bit-identical to the single-chip path — the distributed-correctness contract
(SURVEY.md §7 hard part 5: deterministic tie-breaks and global-id mapping).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_uq_tpu.core.mesh import make_mesh
from rag_uq_tpu.core.types import Document
from rag_uq_tpu.index.sparse import BM25Index
from rag_uq_tpu.ops.topk import cosine_topk
from rag_uq_tpu.parallel.sharding import (
    make_sharded_bm25_topk,
    make_sharded_dense_topk,
    shard_bm25_state,
    shard_corpus_matrix,
)

from tests.oracles import make_synthetic_corpus

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


class TestShardedDense:
    def test_matches_single_chip(self, rng):
        mesh = make_mesh(8)
        cap, dim, k = 1024, 64, 10
        emb = rng.normal(size=(cap, dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.normal(size=(5, dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        size = 900

        single_v, single_i = cosine_topk(
            jnp.asarray(emb), jnp.asarray(q), jnp.int32(size), k, block=128
        )
        sharded = make_sharded_dense_topk(mesh, k=k, block=128)
        emb_sharded = shard_corpus_matrix(jnp.asarray(emb), mesh)
        sv, si = sharded(emb_sharded, jnp.asarray(q), jnp.int32(size))

        np.testing.assert_array_equal(np.asarray(si), np.asarray(single_i))
        np.testing.assert_allclose(np.asarray(sv), np.asarray(single_v), rtol=1e-6)

    def test_partial_shard_occupancy(self, rng):
        """Live rows end mid-shard; dead shards must contribute nothing."""
        mesh = make_mesh(8)
        cap, dim, k = 1024, 32, 5
        emb = rng.normal(size=(cap, dim)).astype(np.float32)
        q = rng.normal(size=(2, dim)).astype(np.float32)
        size = 200  # spans less than 2 of 8 shards

        single_v, single_i = cosine_topk(
            jnp.asarray(emb), jnp.asarray(q), jnp.int32(size), k, block=128
        )
        sharded = make_sharded_dense_topk(mesh, k=k, block=128)
        sv, si = sharded(
            shard_corpus_matrix(jnp.asarray(emb), mesh),
            jnp.asarray(q),
            jnp.int32(size),
        )
        np.testing.assert_array_equal(np.asarray(si), np.asarray(single_i))


class TestShardedBM25:
    def test_matches_single_chip(self):
        mesh = make_mesh(8)
        corpus = make_synthetic_corpus(np.random.default_rng(7), 100)
        idx = BM25Index()
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        dev = idx._sync()

        queries = ["w1 w2 the", "w10 w3", "the is a"]
        qtids = jnp.asarray(idx.encode_queries(queries))

        # Single chip exhaustive.
        from rag_uq_tpu.ops import bm25 as bm25_ops

        scores = bm25_ops.score_all(
            dev["indptr"], dev["post_doc"], dev["post_w"],
            qtids, dev["n_docs_cap"], dev["max_df"],
        )
        sv, si = bm25_ops.topk_from_scores(scores, 10)

        # Sharded: 8 shards over the (padded) doc capacity.
        n_docs_cap = dev["n_docs_cap"]
        state = {
            "indptr": dev["indptr"],
            "post_doc": dev["post_doc"],
            "post_w": dev["post_w"],
            "docs_per_shard": n_docs_cap // 8,
        }
        sharded_state = shard_bm25_state(state, mesh)
        fn = make_sharded_bm25_topk(mesh, k=10, max_df=dev["max_df"],
                                    n_docs_cap=n_docs_cap)
        mv, mi = fn(
            sharded_state["indptr"],
            sharded_state["post_doc"],
            sharded_state["post_w"],
            qtids,
        )
        live = np.asarray(sv) > 0
        np.testing.assert_allclose(
            np.asarray(mv)[live], np.asarray(sv)[live], rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(mi)[live], np.asarray(si)[live])


class TestPoolExceedsShardCap:
    def test_pool_larger_than_shard(self, rng):
        """pool > per-shard capacity must not crash and stays exact."""
        mesh = make_mesh(8)
        cap, dim = 1024, 32  # shard_cap = 128 < pool 200
        emb = rng.normal(size=(cap, dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.normal(size=(3, dim)).astype(np.float32)
        size = 1000
        sharded = make_sharded_dense_topk(mesh, k=200, block=128)
        sv, si = sharded(
            shard_corpus_matrix(jnp.asarray(emb), mesh),
            jnp.asarray(q), jnp.int32(size),
        )
        ov, oi = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                             jnp.int32(size), 200, block=256)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(oi))


class TestMultihostSeam:
    """DCN seam (core/mesh.py): single-process no-op behavior — the
    multi-host path needs real multi-host hardware and is documented as
    untestable in this environment."""

    def test_initialize_noop_without_coordinator(self, monkeypatch):
        from rag_uq_tpu.core.mesh import initialize_distributed

        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert initialize_distributed() is False

    def test_multihost_mesh_falls_back_single_process(self):
        import jax
        from rag_uq_tpu.core.mesh import CORPUS_AXIS, make_multihost_mesh

        mesh = make_multihost_mesh()
        assert mesh.shape[CORPUS_AXIS] == len(jax.devices())


class TestTieAwareAgreement:
    """Exactness-comparison contract (cli/bench_sharded.tie_aware_agreement)."""

    def _mk(self, scores, pos):
        return np.asarray(scores, np.float32), np.asarray(pos, np.int32)

    def test_identical_results_agree(self):
        from rag_uq_tpu.cli.bench_sharded import tie_aware_agreement

        v, p = self._mk([[3.0, 2.0, 1.0]], [[5, 7, 9]])
        out = tie_aware_agreement(v, p, v.copy(), p.copy())
        assert out["raw_idx_agreement"] == 1.0
        assert out["tie_aware_agreement"] == 1.0
        assert not out["violations"]

    def test_equal_score_swap_is_benign(self):
        from rag_uq_tpu.cli.bench_sharded import tie_aware_agreement

        fv, fp = self._mk([[3.0, 2.0, 2.0, 1.0]], [[5, 7, 9, 2]])
        uv, up = self._mk([[3.0, 2.0, 2.0, 1.0]], [[5, 9, 7, 2]])
        out = tie_aware_agreement(fv, fp, uv, up)
        assert out["raw_idx_agreement"] < 1.0
        assert out["tie_aware_agreement"] == 1.0
        assert not out["violations"]

    def test_storage_resolution_near_tie(self):
        # The diagnosed 1M case: two docs within bf16 resolution swap order
        # because the fused path reads bf16 impacts — benign at rtol=2^-8,
        # a violation at f32 resolution.
        from rag_uq_tpu.cli.bench_sharded import tie_aware_agreement

        fv, fp = self._mk([[0.5, 0.47466, 0.47445]], [[1, 20, 30]])
        uv, up = self._mk([[0.5, 0.47445, 0.47423]], [[1, 30, 20]])
        ok = tie_aware_agreement(fv, fp, uv, up, rtol=2.0 ** -8)
        assert ok["tie_aware_agreement"] == 1.0 and not ok["violations"]
        bad = tie_aware_agreement(fv, fp, uv, up, rtol=1e-6)
        assert bad["tie_aware_agreement"] == 0.0
        assert bad["violations"][0]["kind"] == "rankwise_score_mismatch"

    def test_real_divergence_is_flagged(self):
        from rag_uq_tpu.cli.bench_sharded import tie_aware_agreement

        fv, fp = self._mk([[3.0, 2.0, 1.0]], [[5, 7, 9]])
        uv, up = self._mk([[3.0, 2.5, 1.0]], [[5, 4, 9]])
        out = tie_aware_agreement(fv, fp, uv, up)
        assert out["tie_aware_agreement"] == 0.0
        assert out["violations"][0]["kind"] == "rankwise_score_mismatch"


class TestMeshEmbed:
    """DP ingest embedding (embed/base.py::encode_on_mesh)."""

    def test_matches_single_device_uneven_batch(self):
        from rag_uq_tpu.embed.hash_embed import NgramHashEmbedder

        mesh = make_mesh(8)
        emb = NgramHashEmbedder(dim=64, buckets=1024)
        texts = [f"doc number {i} about topic {i % 5}" for i in range(11)]
        np.testing.assert_allclose(
            emb.encode_mesh(texts, mesh), emb.encode(texts), atol=1e-5
        )

    def test_transformer_encoder_mesh(self):
        from rag_uq_tpu.embed.encoder import EncoderConfig, TransformerEmbedder

        mesh = make_mesh(8)
        emb = TransformerEmbedder(
            EncoderConfig(dim=32, num_layers=1, num_heads=2, mlp_dim=64,
                          max_seq_len=16, vocab_buckets=512)
        )
        texts = [f"short text {i}" for i in range(9)]
        np.testing.assert_allclose(
            emb.encode_mesh(texts, mesh), emb.encode(texts), atol=2e-2
        )
