"""Environment tooling: doctor, warmup, config tree, embedders, mesh helpers."""

import numpy as np
import pytest

from rag_uq_tpu.cli.doctor import diagnose
from rag_uq_tpu.core.config import Config
from rag_uq_tpu.core.mesh import make_mesh, pad_to_multiple
from rag_uq_tpu.embed.base import get_embedder
from rag_uq_tpu.core.config import EmbedderConfig


class TestDoctor:
    def test_diagnose_ok(self, tmp_path):
        report = diagnose(create_dirs=True, workdir=str(tmp_path))
        assert report["ok"]
        assert "jax" in report["required"]
        assert report["devices"]
        assert (tmp_path / "data/raw").is_dir()
        assert (tmp_path / "models/router").is_dir()


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = Config()
        assert cfg.router.hidden_dim == 64
        assert cfg.router.dropout == 0.1
        assert cfg.bm25.k1 == 1.5 and cfg.bm25.b == 0.75
        assert cfg.uq.alpha == 0.1 and cfg.uq.n_samples == 10
        assert cfg.chunk.chunk_size == 200 and cfg.chunk.overlap == 50
        assert cfg.train.learning_rate == 1e-3

    def test_override(self):
        cfg = Config().override({"router.hidden_dim": 32, "uq.alpha": 0.05})
        assert cfg.router.hidden_dim == 32
        assert cfg.uq.alpha == 0.05
        assert Config().router.hidden_dim == 64  # original untouched

    def test_override_unknown_key(self):
        with pytest.raises(KeyError):
            Config().override({"router.nope": 1})

    def test_to_dict_roundtrippable(self):
        d = Config().to_dict()
        assert d["bm25"]["dense_tier_threshold"] == 64


class TestEmbedders:
    @pytest.mark.parametrize("kind", ["sha256", "ngram_hash", "encoder"])
    def test_factory_and_contract(self, kind):
        cfg = EmbedderConfig(
            kind=kind, dim=64, vocab_hash_buckets=2048, max_seq_len=32,
            encoder_layers=1, encoder_heads=4, encoder_mlp_dim=64,
        )
        emb = get_embedder(cfg)
        out = emb.encode(["hello world", "another text here"])
        assert out.shape == (2, 64)
        norms = np.linalg.norm(out, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_deterministic(self):
        cfg = EmbedderConfig(kind="ngram_hash", dim=32, vocab_hash_buckets=1024)
        a = get_embedder(cfg).encode(["same text"])
        b = get_embedder(cfg).encode(["same text"])
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_similar_texts_closer(self):
        emb = get_embedder(EmbedderConfig(kind="ngram_hash", dim=64,
                                          vocab_hash_buckets=4096))
        vecs = emb.encode([
            "the capital of france is paris",
            "paris is the capital of france",
            "quantum chromodynamics lattice simulations",
        ])
        sim_close = float(vecs[0] @ vecs[1])
        sim_far = float(vecs[0] @ vecs[2])
        assert sim_close > sim_far + 0.2


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh(4)
        assert mesh.shape["corpus"] == 4

    def test_too_many_shards(self):
        import jax

        with pytest.raises(ValueError):
            make_mesh(len(jax.devices()) + 1)

    def test_pad_to_multiple(self):
        assert pad_to_multiple(100, 128) == 128
        assert pad_to_multiple(128, 128) == 128
        assert pad_to_multiple(129, 128) == 256
