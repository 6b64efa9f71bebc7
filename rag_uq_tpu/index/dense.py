"""Dense index: HBM-resident embedding matrix with streaming append.

TPU-native replacement for the reference's `DenseIndex`
(rag_uq/streaming_index.py:228-373), which delegates to ChromaDB's HNSW over
HTTP with one Ollama embedding call per passage. Here:

- the corpus lives on device as a preallocated, L2-normalized `[capacity, D]`
  bf16 matrix (capacity doubles by watermark, so appends never retrace);
- embedding is batched and jit-compiled (rag_uq_tpu.embed);
- search is *exact* brute-force cosine via the block-streamed fused
  matmul+top-k op (rag_uq_tpu.ops.topk), not ANN — exactness ≥ HNSW recall;
- scores are cosine similarity in [-1, 1], matching the reference's
  `1 - distance` convention (:361-368).
"""

from __future__ import annotations

import json
import logging
from functools import partial
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.core.config import DenseIndexConfig, EmbedderConfig
from rag_uq_tpu.core.types import DocStore, Document
from rag_uq_tpu.embed.base import Embedder, get_embedder
from rag_uq_tpu.text.tokenize import TOKENIZER_VERSION
from rag_uq_tpu.ops.topk import cosine_topk, gather_scores

logger = logging.getLogger(__name__)


@partial(jax.jit, donate_argnums=(0,))
def _append(emb: jax.Array, batch: jax.Array, offset: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(emb, batch.astype(emb.dtype), (offset, 0))


class DenseIndex:
    """Exact dense retrieval over an on-device embedding matrix."""

    def __init__(
        self,
        embedder: Optional[Embedder] = None,
        config: Optional[DenseIndexConfig] = None,
        embedder_config: Optional[EmbedderConfig] = None,
        persist_directory: Optional[str] = None,
    ):
        self.config = config or DenseIndexConfig()
        self.embedder = embedder or get_embedder(
            embedder_config or EmbedderConfig(dim=self.config.embedding_dim)
        )
        if self.embedder.dim != self.config.embedding_dim:
            self.config.embedding_dim = self.embedder.dim
        self.persist_directory = Path(persist_directory) if persist_directory else None

        self.store = DocStore()
        cap = max(self.config.initial_capacity, self.config.score_block)
        cap = self._round_cap(cap)
        self._emb = jnp.zeros(
            (cap, self.config.embedding_dim), dtype=jnp.dtype(self.config.dtype)
        )
        self._size = 0

        if self.persist_directory and (self.persist_directory / "meta.json").exists():
            self._load()

    def _round_cap(self, cap: int) -> int:
        block = self.config.score_block
        return ((cap + block - 1) // block) * block

    def __len__(self) -> int:
        return self._size

    @property
    def capacity(self) -> int:
        return int(self._emb.shape[0])

    @property
    def embeddings(self) -> jax.Array:
        """The live [size, D] slice (device array view of the corpus matrix)."""
        return self._emb[: self._size]

    # -- build -----------------------------------------------------------------

    def _grow(self, needed: int) -> None:
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        if new_cap == self.capacity:
            return
        old = self._emb
        self._emb = jnp.zeros((new_cap, old.shape[1]), dtype=old.dtype)
        self._emb = _append(self._emb, old, jnp.int32(0))
        logger.info("Grew dense index capacity to %d rows", new_cap)

    def add_documents(
        self, documents: Sequence[Document], batch_size: int = 256
    ) -> int:
        """Embed and append new documents (dedup by id). Returns count added."""
        seen = {}
        for doc in documents:
            if doc.id not in self.store and doc.id not in seen:
                seen[doc.id] = doc
        new_docs = list(seen.values())
        if not new_docs:
            logger.info("No new documents to add")
            return 0
        # Every batch is PADDED to batch_size so ingest compiles exactly one
        # encode program and one append program, regardless of corpus size
        # or tail length: on the relayed TPU each distinct program shape is
        # a ~60-90 s remote compile, which once made a 20k-doc ingest spend
        # ~15 of its 16 minutes compiling tail-shaped programs. Padded rows
        # land beyond _size (capacity covers them) and are dead by the
        # size-mask everywhere.
        n_pad_total = -(-len(new_docs) // batch_size) * batch_size
        self._grow(self._size + n_pad_total)
        for i in range(0, len(new_docs), batch_size):
            batch = new_docs[i : i + batch_size]
            texts = [d.text for d in batch]
            texts += [""] * (batch_size - len(batch))
            vecs = self.embedder.encode(texts)
            if self.config.normalize:
                norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                vecs = vecs / np.maximum(norms, 1e-12)
            self._emb = _append(
                self._emb, jnp.asarray(vecs), jnp.int32(self._size)
            )
            for d in batch:
                self.store.append(d)
            self._size += len(batch)
        logger.info("Dense index: added %d docs, total %d", len(new_docs), self._size)
        return len(new_docs)

    def add_precomputed(
        self, documents: Sequence[Document], vectors: np.ndarray
    ) -> int:
        """Append documents with externally computed embeddings."""
        keep = [i for i, d in enumerate(documents) if d.id not in self.store]
        if not keep:
            return 0
        vecs = np.asarray(vectors, dtype=np.float32)[keep]
        if self.config.normalize:
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-12)
        self._grow(self._size + len(keep))
        self._emb = _append(self._emb, jnp.asarray(vecs), jnp.int32(self._size))
        for i in keep:
            self.store.append(documents[i])
        self._size += len(keep)
        return len(keep)

    # -- queries -----------------------------------------------------------------

    def embed_queries(self, queries: Sequence[str]) -> jax.Array:
        vecs = self.embedder.encode(queries)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        return jnp.asarray(vecs / np.maximum(norms, 1e-12))

    def search_batch(
        self, queries: Sequence[str], top_k: int = 10, q_vecs=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched exact top-k: (scores [B, k], doc positions [B, k])."""
        q = self.embed_queries(queries) if q_vecs is None else q_vecs
        vals, idx = cosine_topk(
            self._emb, q, jnp.int32(self._size), top_k, self.config.score_block
        )
        return np.asarray(vals), np.asarray(idx)

    def search(self, query: str, top_k: int = 10) -> List[Tuple[str, float, str]]:
        """Single-query search -> [(doc_id, cosine score, text)] (parity :338-370)."""
        if self._size == 0:
            return []
        vals, idx = self.search_batch([query], top_k=min(top_k, self._size))
        out = []
        for score, pos in zip(vals[0], idx[0]):
            if pos >= 0:
                out.append(
                    (self.store.ids[int(pos)], float(score), self.store.texts[int(pos)])
                )
        return out

    def score_positions_batch(
        self, queries: Sequence[str], positions: np.ndarray, q_vecs=None
    ) -> np.ndarray:
        """Cosine scores for specific doc positions [B, P] (-1 -> 0.0)."""
        q = self.embed_queries(queries) if q_vecs is None else q_vecs
        return np.asarray(
            gather_scores(self._emb, q, jnp.asarray(positions.astype(np.int32)))
        )

    # -- persistence ----------------------------------------------------------------

    def save(self, directory: Optional[str] = None) -> None:
        out = Path(directory) if directory else self.persist_directory
        if out is None:
            raise ValueError("No persist directory configured")
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / "embeddings.npy", np.asarray(self.embeddings, dtype=np.float32))
        docs = [
            {
                "id": self.store.ids[i],
                "text": self.store.texts[i],
                "title": self.store.titles[i],
                "metadata": self.store.metadatas[i],
            }
            for i in range(len(self.store))
        ]
        with open(out / "docs.jsonl", "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        with open(out / "meta.json", "w") as f:
            json.dump({
                "size": self._size,
                "dim": self.config.embedding_dim,
                # Stored vectors bake in the build-time tokenization (hash
                # embedder buckets / encoder token ids); queries embedded
                # under a different tokenizer silently lose recall — same
                # guard as BM25Index (index/sparse.py).
                "tokenizer": TOKENIZER_VERSION,
            }, f)
        logger.info("Saved dense index (%d rows) to %s", self._size, out)

    def _load(self) -> None:
        out = self.persist_directory
        with open(out / "meta.json") as f:
            meta = json.load(f)
        saved_tok = meta.get("tokenizer", "v1-bare-split")
        if saved_tok != TOKENIZER_VERSION:
            msg = (
                f"Dense index {out} was built with tokenizer {saved_tok} "
                f"(current: {TOKENIZER_VERSION}); query embeddings will not "
                "match the stored document vectors — rebuild the index"
            )
            # Strict by default: a version mismatch is always a correctness
            # problem (advisor r4), not a tuning choice.
            if not self.config.allow_tokenizer_mismatch:
                raise ValueError(
                    msg + " (or set DenseIndexConfig."
                    "allow_tokenizer_mismatch=True to load anyway)"
                )
            logger.warning("%s", msg)
        vecs = np.load(out / "embeddings.npy")
        docs = []
        with open(out / "docs.jsonl") as f:
            for line in f:
                d = json.loads(line)
                docs.append(Document(d["id"], d["text"], d.get("title"), d.get("metadata")))
        self.add_precomputed(docs, vecs)
        assert self._size == meta["size"]
        logger.info("Loaded dense index with %d rows", self._size)
