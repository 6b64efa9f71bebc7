"""Router, ApproxNDCG loss, trainer, and pseudo-label tests.

Mirrors the reference's test coverage (tests/test_router.py) plus
convergence and EMA-stat semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_uq_tpu.core.config import RouterConfig, TrainConfig
from rag_uq_tpu.data.loaders import synthetic_router_data
from rag_uq_tpu.router.labels import create_pseudo_labels
from rag_uq_tpu.router.loss import ApproxNDCGLoss, approx_ndcg_loss
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer


class TestRetrievalRouter:
    def test_output_shape_and_bounds(self, rng):
        router = RetrievalRouter()
        bm25 = rng.normal(size=(4, 20)).astype(np.float32)
        dense = rng.normal(size=(4, 20)).astype(np.float32)
        w = np.asarray(router(bm25, dense))
        assert w.shape == (4, 20)
        assert ((w >= 0) & (w <= 1)).all()

    def test_config_defaults(self):
        cfg = RouterConfig()
        assert cfg.hidden_dim == 64
        assert cfg.dropout == 0.1
        assert cfg.temperature == 1.0
        assert cfg.num_layers == 2

    def test_param_count(self):
        # 3->64 (+bias) -> 1 (+bias): 3*64+64 + 64+1 = 321
        assert RetrievalRouter().num_params() == 321

    def test_rerank_shapes_and_topk_clamp(self, rng):
        router = RetrievalRouter()
        bm25 = rng.normal(size=(2, 5)).astype(np.float32)
        dense = rng.normal(size=(2, 5)).astype(np.float32)
        vals, idx = router.hybrid_rerank(bm25, dense, top_k=10)
        assert vals.shape == (2, 5)  # clamped to num_passages
        vals, idx = router.hybrid_rerank(bm25, dense, top_k=3)
        assert vals.shape == (2, 3)
        v = np.asarray(vals)
        assert (v[:, :-1] >= v[:, 1:]).all()  # sorted descending

    def test_routing_decision_dict(self, rng):
        router = RetrievalRouter()
        d = router.get_routing_decision(
            rng.normal(size=(2, 8)).astype(np.float32),
            rng.normal(size=(2, 8)).astype(np.float32),
        )
        assert set(d) >= {
            "avg_dense_weight", "weight_std",
            "dense_preferred_ratio", "bm25_preferred_ratio", "routing_weights",
        }
        assert d["dense_preferred_ratio"] + d["bm25_preferred_ratio"] == pytest.approx(1.0)

    def test_ema_stats_update_only_in_train_mode(self, rng):
        router = RetrievalRouter()
        bm25 = rng.normal(size=(4, 8)).astype(np.float32)
        dense = rng.normal(size=(4, 8)).astype(np.float32)
        assert not router.stats_initialized
        router.eval()
        router(bm25, dense, update_stats=True)
        assert not router.stats_initialized  # eval mode: no update
        router.train()
        router(bm25, dense, update_stats=True)
        assert router.stats_initialized
        mean_after = float(router.stats["bm25_mean"])
        assert mean_after != 0.0

    def test_eval_deterministic_train_stochastic(self, rng):
        router = RetrievalRouter()
        bm25 = rng.normal(size=(4, 8)).astype(np.float32)
        dense = rng.normal(size=(4, 8)).astype(np.float32)
        router.eval()
        w1 = np.asarray(router(bm25, dense))
        w2 = np.asarray(router(bm25, dense))
        np.testing.assert_array_equal(w1, w2)  # no dropout in eval
        router.train()
        w3 = np.asarray(router(bm25, dense, update_stats=False))
        w4 = np.asarray(router(bm25, dense, update_stats=False))
        assert not np.array_equal(w3, w4)  # dropout active


class TestApproxNDCGLoss:
    def test_perfect_ranking_low_loss(self):
        loss_fn = ApproxNDCGLoss()
        predicted = jnp.array([[4.0, 3.0, 2.0, 1.0]])
        relevance = jnp.array([[3.0, 2.0, 1.0, 0.0]])
        assert float(loss_fn(predicted, relevance)) < 0

    def test_inverted_worse_than_perfect(self):
        loss_fn = ApproxNDCGLoss()
        relevance = jnp.array([[3.0, 2.0, 1.0, 0.0]])
        good = float(loss_fn(jnp.array([[4.0, 3.0, 2.0, 1.0]]), relevance))
        bad = float(loss_fn(jnp.array([[1.0, 2.0, 3.0, 4.0]]), relevance))
        assert bad > good

    def test_batch_scalar_finite(self, rng):
        loss = approx_ndcg_loss(
            jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32)),
            jnp.asarray(rng.uniform(size=(8, 10)).astype(np.float32)),
        )
        assert np.asarray(loss).shape == ()
        assert np.isfinite(float(loss))

    def test_mask_finite(self, rng):
        """The reference's -inf masking NaNs out (verified vs torch); ours
        must stay finite and match the unmasked value on the valid prefix."""
        predicted = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
        relevance = jnp.asarray(rng.uniform(size=(2, 5)).astype(np.float32))
        mask = jnp.array([[True, True, True, False, False],
                          [True, True, True, True, False]])
        loss = approx_ndcg_loss(predicted, relevance, mask)
        assert np.isfinite(float(loss))

    def test_mask_equals_truncation(self, rng):
        """Masked loss == loss on just the valid items (same mask per row)."""
        predicted = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
        relevance = jnp.asarray(rng.uniform(size=(3, 6)).astype(np.float32))
        mask = jnp.ones((3, 6), dtype=bool).at[:, 4:].set(False)
        masked = float(approx_ndcg_loss(predicted, relevance, mask))
        # Note: IDCG ranks differ (padding occupies rank slots 5,6 with zero
        # gain), so values match exactly.
        truncated = float(approx_ndcg_loss(predicted[:, :4], relevance[:, :4]))
        assert masked == pytest.approx(truncated, rel=1e-5)

    def test_temperature_effect_finite(self, rng):
        p = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
        r = jnp.asarray(rng.uniform(size=(4, 10)).astype(np.float32))
        assert np.isfinite(float(ApproxNDCGLoss(2.0)(p, r)))
        assert np.isfinite(float(ApproxNDCGLoss(0.5)(p, r)))


class TestRouterTrainer:
    def test_single_step_loss_negative(self):
        bm25, dense, rel = synthetic_router_data(32, 10)
        router = RetrievalRouter()
        trainer = RouterTrainer(router, checkpoint_dir="/tmp/router_test")
        loss = trainer.train_epoch((bm25, dense, rel))
        assert loss < 0

    def test_convergence_on_synthetic(self, tmp_path):
        """Loss must improve over training on seeded learnable data
        (reference tests/test_router.py:254-278 analogue)."""
        bm25, dense, rel = synthetic_router_data(200, 12, seed=1)
        router = RetrievalRouter()
        trainer = RouterTrainer(
            router, checkpoint_dir=str(tmp_path),
            config=TrainConfig(num_epochs=15, batch_size=32,
                               checkpoint_dir=str(tmp_path)),
        )
        history = trainer.fit(
            (bm25[:160], dense[:160], rel[:160]),
            (bm25[160:], dense[160:], rel[160:]),
        )
        assert history["train_losses"][-1] < history["train_losses"][0]

    def test_checkpoint_roundtrip(self, tmp_path):
        bm25, dense, rel = synthetic_router_data(32, 10)
        router = RetrievalRouter()
        trainer = RouterTrainer(router, checkpoint_dir=str(tmp_path))
        trainer.train_epoch((bm25, dense, rel))
        trainer.train_losses = [-0.5]
        path = str(tmp_path / "ckpt.msgpack")
        trainer.save_checkpoint(path)

        router2 = RetrievalRouter(seed=99)
        trainer2 = RouterTrainer(router2, checkpoint_dir=str(tmp_path))
        trainer2.load_checkpoint(path)
        router.eval(), router2.eval()
        w1 = np.asarray(router(bm25, dense, update_stats=False))
        w2 = np.asarray(router2(bm25, dense, update_stats=False))
        np.testing.assert_allclose(w1, w2, rtol=1e-6)
        assert trainer2.train_losses == [-0.5]

    def test_plateau_reduces_lr(self, tmp_path):
        router = RetrievalRouter()
        trainer = RouterTrainer(
            router, checkpoint_dir=str(tmp_path),
            config=TrainConfig(plateau_patience=1, checkpoint_dir=str(tmp_path)),
        )
        lr0 = trainer._lr
        trainer._plateau_step(1.0)
        trainer._plateau_step(2.0)
        trainer._plateau_step(2.0)  # patience exceeded -> reduce
        assert trainer._lr == pytest.approx(lr0 * 0.5)


class TestPool7FeatureSet:
    def test_output_shape_bounds_and_determinism(self):
        rng = np.random.default_rng(0)
        bm25 = rng.normal(2.0, 1.5, (4, 20)).astype(np.float32)
        dense = rng.normal(0.5, 0.2, (4, 20)).astype(np.float32)
        router = RetrievalRouter(RouterConfig(feature_set="pool7"))
        router.eval()
        w = np.asarray(router(bm25, dense, update_stats=False))
        assert w.shape == (4, 20)
        assert np.all(w >= 0) and np.all(w <= 1)
        w2 = np.asarray(router(bm25, dense, update_stats=False))
        np.testing.assert_array_equal(w, w2)

    def test_single_passage_pool(self):
        # P=1: top1-top2 gap undefined -> zeros, no NaNs.
        router = RetrievalRouter(RouterConfig(feature_set="pool7"))
        router.eval()
        w = np.asarray(router(
            np.array([[3.0]], np.float32), np.array([[0.5]], np.float32),
            update_stats=False,
        ))
        assert w.shape == (1, 1) and np.isfinite(w).all()

    def test_trains_and_converges(self, tmp_path):
        bm25, dense, rel = synthetic_router_data(200, 12, seed=1)
        router = RetrievalRouter(RouterConfig(feature_set="pool7"))
        trainer = RouterTrainer(
            router, checkpoint_dir=str(tmp_path),
            config=TrainConfig(num_epochs=15, batch_size=32,
                               checkpoint_dir=str(tmp_path)),
        )
        history = trainer.fit(
            (bm25[:160], dense[:160], rel[:160]),
            (bm25[160:], dense[160:], rel[160:]),
        )
        assert history["train_losses"][-1] < history["train_losses"][0]

    def test_checkpoint_loads_into_default_router(self, tmp_path):
        """A pool7 checkpoint must load through a default-constructed
        RetrievalRouter/RouterTrainer pair (the cli scripts' pattern), with
        the caller's router object rebuilt IN PLACE to the stored
        architecture."""
        bm25, dense, rel = synthetic_router_data(32, 10)
        router = RetrievalRouter(RouterConfig(feature_set="pool7"))
        trainer = RouterTrainer(router, checkpoint_dir=str(tmp_path))
        trainer.train_epoch((bm25, dense, rel))
        path = str(tmp_path / "ckpt.msgpack")
        trainer.save_checkpoint(path)

        plain = RetrievalRouter()  # reference3 by default
        trainer2 = RouterTrainer(plain, checkpoint_dir=str(tmp_path))
        trainer2.load_checkpoint(path)
        assert plain.config.feature_set == "pool7"
        assert trainer2.router is plain
        router.eval(), plain.eval()
        w1 = np.asarray(router(bm25, dense, update_stats=False))
        w2 = np.asarray(plain(bm25, dense, update_stats=False))
        np.testing.assert_allclose(w1, w2, rtol=1e-6)

    def test_pool_context_features_are_live(self):
        """The pool7 gate must RESPOND to pool context that the reference3
        features cannot see. Column 0 carries identical (b, d) scores in a
        needle pool (one outlier over a flat floor) and a crowded pool
        (many near-ties at the top): reference3's per-passage features for
        that column are therefore identical (frozen EMA stats, same raw
        scores), so its weight must not move — while pool7's within-pool
        z-score and top1-top2 gap differ, so its weight must. A zeroed
        _row_stats / gap regression makes the pool7 assertion fail.
        (Replaces a vacuous cross-architecture comparison whose outputs
        differed by random init alone — review r4.)"""
        import jax.numpy as jnp

        needle = np.full((1, 10), 1.0, np.float32)
        needle[0, 0] = 9.0  # lone rare-term needle
        crowded = np.linspace(9.0, 8.1, 10, dtype=np.float32)[None, :]
        dense = np.full((1, 10), 0.5, np.float32)

        def _freeze(router):
            # Freeze the EMA stats (as after training): otherwise a fresh
            # router falls back to BATCH normalization, which already sees
            # the pool and would confound the comparison.
            router.stats = dict(
                router.stats,
                initialized=jnp.float32(1.0),
                bm25_mean=jnp.float32(2.0), bm25_std=jnp.float32(3.0),
                dense_mean=jnp.float32(0.5), dense_std=jnp.float32(0.2),
            )
            return router

        r3 = _freeze(RetrievalRouter(RouterConfig()).eval())
        w3_needle = np.asarray(r3(needle, dense, update_stats=False))
        w3_crowd = np.asarray(r3(crowded, dense, update_stats=False))
        assert np.allclose(w3_needle[0, 0], w3_crowd[0, 0], atol=1e-6), (
            "reference3 is per-passage: column 0 sees identical inputs"
        )

        r7 = _freeze(RetrievalRouter(RouterConfig(feature_set="pool7")).eval())
        w7_needle = np.asarray(r7(needle, dense, update_stats=False))
        w7_crowd = np.asarray(r7(crowded, dense, update_stats=False))
        assert not np.allclose(w7_needle[0, 0], w7_crowd[0, 0], atol=1e-6), (
            "pool7's pool-context features are dead: same weight for a "
            "needle top-1 and a crowded top-1"
        )


class TestPseudoLabels:
    def test_exact_substring(self):
        labels = create_pseudo_labels(
            ["the answer is paris today", "unrelated text"], [], "Paris",
            num_passages=4,
        )
        assert labels[0] == 1.0
        assert labels[1] == 0.0

    def test_partial_overlap(self):
        labels = create_pseudo_labels(
            ["george lives here"], [], "george orwell", num_passages=2
        )
        assert labels[0] == pytest.approx(0.5)

    def test_padding(self):
        labels = create_pseudo_labels(["a"], ["b"], "x", num_passages=6)
        assert labels.shape == (6,)
        assert (labels[2:] == 0).all()

    def test_dedup_preserves_order(self):
        labels = create_pseudo_labels(
            ["paris here", "other"], ["paris here", "third"], "paris",
            num_passages=3,
        )
        # unique order: ["paris here", "other", "third"]
        assert labels[0] == 1.0 and labels[1] == 0.0 and labels[2] == 0.0


class TestBatchNorm:
    def test_batch_norm_trains(self):
        """use_batch_norm=True must train without crashing (batch_stats is
        threaded through the mutable collections)."""
        from rag_uq_tpu.data.loaders import synthetic_router_data

        router = RetrievalRouter(RouterConfig(use_batch_norm=True))
        assert "batch_stats" in router.extra
        bm25, dense, rel = synthetic_router_data(32, 10)
        router.train()
        w = np.asarray(router(bm25, dense))
        assert ((w >= 0) & (w <= 1)).all()

        trainer = RouterTrainer(router, checkpoint_dir="/tmp/bn_router")
        loss1 = trainer.train_epoch((bm25, dense, rel))
        loss2 = trainer.train_epoch((bm25, dense, rel))
        assert np.isfinite(loss1) and np.isfinite(loss2)
        router.eval()
        w = np.asarray(router(bm25, dense))
        assert np.isfinite(w).all()


class TestRecipeV2:
    """Round-5 router recipe: max-norm fuse, binary gate policy, auxiliary
    decision loss. Motivation: the reference fuses RAW tower scores
    (router.py:179-202) where BM25 is O(10-30) vs dense cosine O(1) — the
    measured train/deploy failure behind runs/demo_full_r4/results/
    router_balanced_probe.json (deployed capture -0.89)."""

    def _opposed_towers(self, n=160, p=12, seed=0):
        """Two query types with opposed best arms on REALISTIC raw scales:
        type A (bm25-decisive): gold has a big BM25 score, dense is noise;
        type B (dense-decisive): gold tops cosine, bm25 is flat noise."""
        rng = np.random.default_rng(seed)
        bm25 = rng.uniform(0.5, 4.0, size=(n, p)).astype(np.float32)
        dense = rng.uniform(0.05, 0.45, size=(n, p)).astype(np.float32)
        rel = np.zeros((n, p), dtype=np.float32)
        is_b = np.arange(n) % 2 == 1
        gold = rng.integers(0, p, size=n)
        for i in range(n):
            rel[i, gold[i]] = 1.0
            if is_b[i]:
                dense[i, gold[i]] = rng.uniform(0.7, 0.9)
            else:
                bm25[i, gold[i]] = rng.uniform(18.0, 30.0)
        return bm25, dense, rel, is_b, gold

    def test_maxnorm_fuse_recovers_pure_arm_rankings(self):
        """With fuse_norm=maxnorm, w=0 must reproduce the BM25 pool ranking
        and w=1 the dense one — the property the raw-scale fuse lacks."""
        from rag_uq_tpu.router.model import fuse_hybrid

        bm25, dense, _rel, _isb, _g = self._opposed_towers(8, 10)
        cfg = RouterConfig(fuse_norm="maxnorm")
        w0 = jnp.zeros_like(jnp.asarray(bm25))
        w1 = jnp.ones_like(jnp.asarray(bm25))
        h0 = np.asarray(fuse_hybrid(cfg, w0, bm25, dense))
        h1 = np.asarray(fuse_hybrid(cfg, w1, bm25, dense))
        assert (np.argsort(-h0, axis=1) == np.argsort(-bm25, axis=1)).all()
        assert (np.argsort(-h1, axis=1) == np.argsort(-dense, axis=1)).all()

    def test_binary_policy_serves_pure_winning_arm(self):
        """gate_policy=binary must rank by the pure winning tower (per-query
        mean gate > 0.5 -> dense, else bm25)."""
        from rag_uq_tpu.router.model import fuse_hybrid

        bm25, dense, _rel, _isb, _g = self._opposed_towers(6, 10)
        cfg = RouterConfig(fuse_norm="maxnorm", gate_policy="binary")
        w = np.full((6, 10), 0.2, dtype=np.float32)
        w[0::2] = 0.9
        h = np.asarray(fuse_hybrid(cfg, jnp.asarray(w), bm25, dense))
        ord_h = np.argsort(-h, axis=1)
        ord_b = np.argsort(-bm25, axis=1)
        ord_d = np.argsort(-dense, axis=1)
        for i in range(6):
            expect = ord_d[i] if w[i].mean() > 0.5 else ord_b[i]
            assert (ord_h[i] == expect).all()

    def test_recipe_v2_beats_raw_fuse_on_opposed_towers(self, tmp_path):
        """End-to-end: on opposed-arm data at realistic raw scales, the v2
        recipe (trained via RouterTrainer, deployed via hybrid_rerank) must
        place gold top-1 on >=80% of held-out queries of BOTH types; the
        reference raw fuse is structurally unable to serve the bm25-decisive
        type at w near 1 (regression anchor, not asserted)."""
        from rag_uq_tpu.core.config import router_recipe_v2

        bm25, dense, rel, is_b, gold = self._opposed_towers(240, 12, seed=3)
        tr_n = 200
        router = RetrievalRouter(router_recipe_v2())
        trainer = RouterTrainer(
            router, checkpoint_dir=str(tmp_path),
            config=TrainConfig(num_epochs=30, batch_size=32,
                               checkpoint_dir=str(tmp_path)),
        )
        trainer.fit(
            (bm25[:tr_n], dense[:tr_n], rel[:tr_n]),
            (bm25[tr_n:], dense[tr_n:], rel[tr_n:]),
        )
        router.eval()
        _vals, idx = router.hybrid_rerank(
            bm25[tr_n:], dense[tr_n:], top_k=1)
        top1 = np.asarray(idx)[:, 0]
        hit = top1 == gold[tr_n:]
        hit_a = hit[~is_b[tr_n:]].mean()
        hit_b = hit[is_b[tr_n:]].mean()
        assert hit_a >= 0.8, f"bm25-decisive type hit@1 {hit_a}"
        assert hit_b >= 0.8, f"dense-decisive type hit@1 {hit_b}"

    def test_recipe_fields_roundtrip_in_checkpoint(self, tmp_path):
        from rag_uq_tpu.core.config import router_recipe_v2

        bm25, dense, rel, _isb, _g = self._opposed_towers(32, 10)
        router = RetrievalRouter(router_recipe_v2())
        trainer = RouterTrainer(
            router, checkpoint_dir=str(tmp_path),
            config=TrainConfig(num_epochs=1, checkpoint_dir=str(tmp_path)),
        )
        trainer.train_epoch((bm25, dense, rel))
        path = str(tmp_path / "r.msgpack")
        trainer.save_checkpoint(path)
        fresh = RetrievalRouter()  # parity default config
        RouterTrainer(fresh).load_checkpoint(path)
        assert fresh.config.fuse_norm == "maxnorm"
        assert fresh.config.gate_policy == "binary"
        assert fresh.config.decision_loss_weight == 2.0
        assert fresh.config.temperature == 0.1
        w_a = np.asarray(router.eval().forward(bm25, dense, update_stats=False))
        w_b = np.asarray(fresh.eval().forward(bm25, dense, update_stats=False))
        np.testing.assert_allclose(w_a, w_b, rtol=1e-6)

    def test_parity_default_unchanged(self):
        """The parity default (fuse_norm=none, soft, no decision loss) must
        fuse raw scores exactly as before this round."""
        from rag_uq_tpu.router.model import fuse_hybrid

        bm25, dense, _rel, _isb, _g = self._opposed_towers(4, 8)
        cfg = RouterConfig()
        w = np.random.default_rng(0).uniform(size=(4, 8)).astype(np.float32)
        h = np.asarray(fuse_hybrid(cfg, jnp.asarray(w), bm25, dense))
        np.testing.assert_allclose(h, w * dense + (1 - w) * bm25, rtol=1e-6)
