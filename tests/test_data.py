"""Data pipeline tests: chunker, loaders, synthetic generators, verifier."""

import json

import numpy as np
import pytest

from rag_uq_tpu.core.config import ChunkConfig
from rag_uq_tpu.data.chunk import chunk_text
from rag_uq_tpu.data.loaders import (
    create_synthetic_nq,
    load_qa_jsonl,
    prepare_passages,
    read_jsonl,
    synthetic_router_data,
    write_jsonl,
)
from rag_uq_tpu.data.verify import (
    file_sha256,
    generate_report,
    verify_jsonl_dataset,
    verify_nq_dataset,
)


class TestChunker:
    def test_short_text_passthrough(self):
        cfg = ChunkConfig(chunk_size=200, overlap=50, min_chunk_size=10)
        text = "short text " * 5  # < 100 words
        assert chunk_text(text, cfg) == [text.strip()]

    def test_too_short_dropped(self):
        cfg = ChunkConfig(min_chunk_size=50)
        assert chunk_text("tiny", cfg) == []

    def test_window_and_overlap(self):
        cfg = ChunkConfig(chunk_size=10, overlap=4, min_chunk_size=1,
                          max_chunk_chars=2000)
        words = [f"w{i}" for i in range(30)]
        chunks = chunk_text(" ".join(words), cfg)
        # step = 6; windows at 0, 6, 12, 18, 24
        assert len(chunks) == 5
        assert chunks[0].split() == words[:10]
        assert chunks[1].split() == words[6:16]
        # Overlapping region shared between consecutive chunks.
        assert chunks[0].split()[-4:] == chunks[1].split()[:4]

    def test_max_chars_truncation(self):
        cfg = ChunkConfig(chunk_size=10, overlap=0, min_chunk_size=1,
                          max_chunk_chars=20)
        chunks = chunk_text(" ".join(["word"] * 20), cfg)
        assert all(len(c) <= 20 for c in chunks)

    def test_whitespace_normalized(self):
        cfg = ChunkConfig(min_chunk_size=1)
        assert chunk_text("a \t b\n\nc", cfg) == ["a b c"]


class TestLoaders:
    def test_jsonl_roundtrip_skips_bad(self, tmp_path):
        path = tmp_path / "x.jsonl"
        write_jsonl(str(path), [{"a": 1}, {"a": 2}])
        with open(path, "a") as f:
            f.write("not json\n")
        rows = list(read_jsonl(str(path)))
        assert rows == [{"a": 1}, {"a": 2}]

    def test_prepare_passages(self, tmp_path):
        articles = tmp_path / "articles.jsonl"
        write_jsonl(
            str(articles),
            [
                {"page_id": 7, "title": "T", "extract": "word " * 300},
                {"title": "Empty", "extract": ""},
            ],
        )
        out = tmp_path / "passages.jsonl"
        n = prepare_passages(str(articles), str(out),
                             ChunkConfig(chunk_size=100, overlap=20,
                                         min_chunk_size=10))
        rows = list(read_jsonl(str(out)))
        assert n == len(rows) > 1
        assert rows[0]["id"] == "7_0"
        assert rows[0]["metadata"]["chunk_index"] == 0

    def test_synthetic_nq_deterministic(self, tmp_path):
        p1, p2 = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
        n1 = create_synthetic_nq(str(p1), 40, seed=3)
        n2 = create_synthetic_nq(str(p2), 40, seed=3)
        assert n1 == n2 == 40
        assert p1.read_text() == p2.read_text()
        rows = load_qa_jsonl(str(p1))
        assert all({"question", "answers", "context"} <= set(r) for r in rows)

    def test_synthetic_router_data_regimes(self):
        bm25, dense, rel = synthetic_router_data(n_queries=10, num_passages=8)
        assert bm25.shape == dense.shape == rel.shape == (10, 8)
        # Even queries: top-relevance passage is the bm25 argmax.
        assert np.argmax(rel[0]) == np.argmax(bm25[0])
        assert np.argmax(rel[1]) == np.argmax(dense[1])


class TestVerifier:
    def test_verify_jsonl(self, tmp_path):
        path = tmp_path / "d.jsonl"
        write_jsonl(
            str(path),
            [
                {"id": "1", "text": "hello world"},
                {"id": "2", "text": "more text here"},
                {"id": "1", "text": "duplicate id"},
            ],
        )
        with open(path, "a") as f:
            f.write("garbage\n")
        results = verify_jsonl_dataset(str(path))
        assert results["total_lines"] == 4
        assert results["valid_records"] == 3
        assert results["invalid_records"] == 1
        assert results["duplicate_ids"] == 1
        assert results["sha256"] == file_sha256(str(path))

    def test_verify_nq_and_report(self, tmp_path):
        path = tmp_path / "nq.jsonl"
        create_synthetic_nq(str(path), 20)
        results = verify_nq_dataset(str(path))
        assert results["nq"]["avg_answers_per_question"] == 1.0
        report = generate_report(results, str(tmp_path / "report.txt"))
        assert "DATASET VERIFICATION REPORT" in report
        assert (tmp_path / "report.txt").exists()
