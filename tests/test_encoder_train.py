"""Contrastive encoder training tests (embed/train.py, cli/train_encoder.py).

Runs at toy scale on the CPU test platform; the full-scale training and
recall evaluation run on TPU via cli/train_encoder.py (artifact:
models/encoder/, runs/encoder/).
"""

import json

import numpy as np
import pytest

from rag_uq_tpu.data.synth_wiki import generate_world
from rag_uq_tpu.embed.encoder import EncoderConfig, TransformerEmbedder
from rag_uq_tpu.embed.train import (
    ContrastiveTrainer,
    EncoderTrainConfig,
    augment_registers,
    load_encoder_checkpoint,
    synthesize_pairs,
)

TINY = EncoderConfig(
    dim=32, num_layers=1, num_heads=2, mlp_dim=64,
    max_seq_len=32, vocab_buckets=2048,
)


@pytest.fixture(scope="module")
def world():
    return generate_world(60, seed=0)


class TestContrastiveTrainer:
    def test_loss_decreases(self, world):
        trainer = ContrastiveTrainer(
            config=EncoderTrainConfig(
                total_steps=60, batch_size=32, warmup_steps=5, seed=0
            ),
            encoder_config=TINY,
        )
        qa = world.qas
        losses = trainer.fit(
            [q.question for q in qa], [q.context for q in qa], log_every=0
        )
        assert len(losses) == 60
        assert losses[-1] < losses[0] * 0.5  # clear convergence

    def test_training_improves_retrieval(self, world):
        from rag_uq_tpu.cli.train_encoder import dense_recall_at_k, split_by_entity

        qa_rows = world.qa_rows()
        train_qa, held_qa = split_by_entity(qa_rows, 0.15)
        assert train_qa and held_qa
        held_golds = {q["gold_doc_ids"][0] for q in held_qa}
        assert not held_golds & {q["gold_doc_ids"][0] for q in train_qa}

        cfg = EncoderTrainConfig(
            total_steps=120, batch_size=32, warmup_steps=10, seed=0
        )
        trainer = ContrastiveTrainer(config=cfg, encoder_config=TINY)
        before = dense_recall_at_k(
            TransformerEmbedder(TINY, seed=0), world.corpus_rows(), held_qa, 10
        )
        trainer.fit(
            [q["question"] for q in train_qa],
            [q["context"] for q in train_qa],
            log_every=0,
        )
        after = dense_recall_at_k(
            trainer.export_embedder(), world.corpus_rows(), held_qa, 10
        )
        assert after > before + 0.1  # semantic gain on unseen entities

    def test_no_duplicate_passages_in_batch(self, world):
        # Duplicate positives inside a batch are false negatives for
        # InfoNCE; fit() must never put two pairs with the same passage in
        # one batch.
        trainer = ContrastiveTrainer(
            config=EncoderTrainConfig(total_steps=3, batch_size=16, seed=0),
            encoder_config=TINY,
        )
        # Each synth entity yields 2 QAs against the SAME article text.
        qa = world.qas[:40]
        batches = []
        orig = trainer.train_step

        def spy(q_ids, q_len, p_ids, p_len):
            batches.append(np.asarray(p_ids))
            return orig(q_ids, q_len, p_ids, p_len)

        trainer.train_step = spy
        trainer.fit([q.question for q in qa], [q.context for q in qa],
                    log_every=0)
        for b in batches:
            uniq = {row.tobytes() for row in b}
            assert len(uniq) == b.shape[0]

    def test_checkpoint_roundtrip(self, world, tmp_path):
        trainer = ContrastiveTrainer(
            config=EncoderTrainConfig(total_steps=5, batch_size=16, seed=0),
            encoder_config=TINY,
        )
        qa = world.qas
        trainer.fit([q.question for q in qa], [q.context for q in qa],
                    log_every=0)
        path = str(tmp_path / "enc.msgpack")
        trainer.save_checkpoint(path)
        loaded = load_encoder_checkpoint(path)
        texts = ["where was Kolim born?", "the river flows north"]
        np.testing.assert_allclose(
            loaded.encode(texts), trainer.export_embedder().encode(texts),
            atol=1e-6,
        )
        meta = json.loads(open(path + ".json").read())
        assert meta["encoder_config"]["dim"] == 32

    def test_get_embedder_loads_checkpoint(self, world, tmp_path):
        from rag_uq_tpu.core.config import EmbedderConfig
        from rag_uq_tpu.embed.base import get_embedder

        trainer = ContrastiveTrainer(
            config=EncoderTrainConfig(total_steps=2, batch_size=8, seed=0),
            encoder_config=TINY,
        )
        qa = world.qas[:20]
        trainer.fit([q.question for q in qa], [q.context for q in qa],
                    log_every=0)
        path = str(tmp_path / "enc.msgpack")
        trainer.save_checkpoint(path)
        emb = get_embedder(EmbedderConfig(kind="encoder", checkpoint_path=path))
        assert emb.dim == 32
        out = emb.encode(["hello world"])
        assert out.shape == (1, 32)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)

    def test_dp_train_step_on_mesh(self, world):
        # The DP step must run sharded over the 8-device CPU mesh and agree
        # with the single-device step result (same params after one step).
        import jax

        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        trainer = ContrastiveTrainer(
            config=EncoderTrainConfig(total_steps=1, batch_size=16, seed=0),
            encoder_config=TINY,
        )
        qa = world.qas[:16]
        q_ids, q_len, p_ids, p_len = trainer.encode_pairs(
            [q.question for q in qa], [q.context for q in qa]
        )
        single = trainer.make_train_step()
        dp = trainer.make_train_step(mesh=mesh)
        import jax.numpy as jnp

        args = (jnp.asarray(q_ids), jnp.asarray(q_len),
                jnp.asarray(p_ids), jnp.asarray(p_len))
        p1, _, l1 = single(trainer.params, trainer.opt_state, *args)
        p2, _, l2 = dp(trainer.params, trainer.opt_state, *args)
        # GSPMD preserves semantics: the sharded step computes the same
        # global-negatives loss and the same update (up to float
        # reassociation in the collectives).
        assert np.isfinite(float(l1))
        assert abs(float(l1) - float(l2)) < 1e-3
        flat1 = jax.tree_util.tree_leaves(p1)[0]
        flat2 = jax.tree_util.tree_leaves(p2)[0]
        np.testing.assert_allclose(
            np.asarray(flat1), np.asarray(flat2), atol=1e-4
        )


class TestSynthesizePairs:
    def test_pairs_from_raw_text(self):
        texts = [f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}" for i in range(20)]
        queries, sources = synthesize_pairs(texts, 50, seed=0)
        assert len(queries) == 50 == len(sources)
        for q, s in zip(queries, sources):
            for w in q.split():
                assert w in texts[s].lower()
        # Deterministic.
        q2, s2 = synthesize_pairs(texts, 50, seed=0)
        assert q2 == queries and s2 == sources


class TestAugmentRegisters:
    QUERIES = [
        "What is the capital of the Republic of Vandoria?",
        "Who wrote the celebrated novel Starfall Harvest?",
        "In what year was the Grand Museum of Kethport founded?",
        "hi",  # < 3 words: skipped
    ]

    def test_variants_preserve_content_words_and_sources(self):
        variants, sources = augment_registers(self.QUERIES, seed=0,
                                              variants_per_query=4)
        assert variants and len(variants) == len(sources)
        assert all(0 <= s < 3 for s in sources)  # "hi" never a source
        for v, s in zip(variants, sources):
            src_words = set(self.QUERIES[s].split())
            # Every variant word comes from its source query (registers
            # perturb scaffolding, never invent content).
            assert set(v.split()) <= src_words
            assert v != self.QUERIES[s]
            assert len(v.split()) >= 2

    def test_clipped_register_drops_stopwords(self):
        variants, sources = augment_registers(self.QUERIES[:1], seed=0,
                                              variants_per_query=4)
        # With all 4 kinds requested, some variant removes "the"/"of".
        assert any("the" not in v.split() and "of" not in v.split()
                   for v in variants)

    def test_deterministic(self):
        a = augment_registers(self.QUERIES, seed=7, variants_per_query=2)
        b = augment_registers(self.QUERIES, seed=7, variants_per_query=2)
        assert a == b
