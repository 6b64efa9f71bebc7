"""rag_uq_tpu — TPU-native hybrid retrieval with learned routing and uncertainty quantification.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
system "Efficient RAG with Learned Retrieval and Uncertainty Quantification"
(see /root/reference, public API at rag_uq/__init__.py:11-24), redesigned
TPU-first:

- Dense retrieval: HBM-resident embedding matrix queried by a fused
  cosine-matmul + top-k path (Pallas kernel + XLA fallback) instead of an
  external ChromaDB/HNSW service.
- Sparse retrieval: on-device CSR postings with Okapi BM25 scoring instead of
  a pure-Python full-corpus scan (rank_bm25).
- Learned routing: flax MLP gate + differentiable ApproxNDCG listwise loss,
  trained end-to-end under jit with optax.
- Uncertainty: vmapped K-sample MC generation + split conformal prediction
  with the finite-sample quantile computed on device.
- Evaluation: Recall@K / MRR / NDCG / EM / F1 / ROUGE-L / ECE / MCE / Brier /
  latency percentiles, bootstrap CIs, reliability and routing plots.
- Scale-out: corpus sharding over a `jax.sharding.Mesh`, per-shard top-k
  merged with XLA collectives over ICI.
"""

from rag_uq_tpu.core.types import Document, RetrievalResult
from rag_uq_tpu.core.config import (
    RouterConfig,
    BM25Config,
    DenseIndexConfig,
    UQConfig,
    EvalConfig,
)
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.loss import ApproxNDCGLoss, approx_ndcg_loss
from rag_uq_tpu.router.train import RouterTrainer
from rag_uq_tpu.router.labels import create_pseudo_labels
from rag_uq_tpu.index.dense import DenseIndex
from rag_uq_tpu.index.sparse import BM25Index
from rag_uq_tpu.retrieval.hybrid import HybridRetriever
from rag_uq_tpu.index.build import StreamingIndex
from rag_uq_tpu.uq.mc import MCDropoutConfidence
from rag_uq_tpu.uq.conformal import ConformalRAG
from rag_uq_tpu.uq.hybrid import HybridConfidence
from rag_uq_tpu.eval.evaluator import RAGEvaluator
from rag_uq_tpu.data.chunk import chunk_text
from rag_uq_tpu.llm.mock import MockLLM
from rag_uq_tpu.llm.tiny_lm import TinyLM
from rag_uq_tpu.parallel.sharded_index import ShardedHybridIndex
from rag_uq_tpu.cli.serve import QueryService

__version__ = "0.1.0"

__all__ = [
    "Document",
    "RetrievalResult",
    "RouterConfig",
    "BM25Config",
    "DenseIndexConfig",
    "UQConfig",
    "EvalConfig",
    "RetrievalRouter",
    "ApproxNDCGLoss",
    "approx_ndcg_loss",
    "RouterTrainer",
    "create_pseudo_labels",
    "DenseIndex",
    "BM25Index",
    "HybridRetriever",
    "StreamingIndex",
    "MCDropoutConfidence",
    "ConformalRAG",
    "HybridConfidence",
    "RAGEvaluator",
    "chunk_text",
    "MockLLM",
    "TinyLM",
    "ShardedHybridIndex",
    "QueryService",
]
