"""Warmup: pre-build native code and pre-compile the hot device programs.

The TPU-native analogue of the reference's model pre-downloader
(scripts/download_models.py caches MiniLM + NLTK at Docker-build time):
here the expensive cold-start assets are the native C++ library and XLA
compilations, so warmup builds the .so and traces/compiles the fused hybrid
query, the router train step, and the sampler at the standard serving shapes
— after which first-query latency is table-speed.
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def warmup(
    batch_sizes: Sequence[int] = (256, 1024),
    corpus_rows: int = 4096,
    dim: int = 768,
    with_llm: bool = False,
) -> dict:
    import jax
    import jax.numpy as jnp

    from rag_uq_tpu.core.types import Document
    from rag_uq_tpu.index.sparse import BM25Index
    from rag_uq_tpu.retrieval.fused import (
        build_index_state,
        encode_for_fused,
        make_fused_hybrid_query,
    )
    from rag_uq_tpu.router.model import RetrievalRouter
    from rag_uq_tpu.router.train import RouterTrainer

    report = {}
    t0 = time.time()
    try:
        from rag_uq_tpu.native import is_available

        report["native"] = bool(is_available())
    except Exception:
        report["native"] = False
    report["native_build_s"] = round(time.time() - t0, 2)

    rng = np.random.default_rng(0)
    vocab = [f"t{i}" for i in range(2000)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(10, 40))))
        for _ in range(corpus_rows)
    ]
    bm25 = BM25Index()
    bm25.add_documents([Document(str(i), t) for i, t in enumerate(texts)])

    emb = jax.random.normal(jax.random.PRNGKey(0), (corpus_rows, dim), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(jnp.bfloat16)

    class _Shim:
        _emb = emb

        def __len__(self):
            return corpus_rows

    state = build_index_state(_Shim(), bm25)
    router = RetrievalRouter()
    rv = {"params": router.params, "stats": router.stats}
    fused = make_fused_hybrid_query(router_module=router.module, k=10, pool=50)

    for bsz in batch_sizes:
        q = jax.random.normal(jax.random.PRNGKey(1), (bsz, dim), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        qterms = encode_for_fused(
            bm25, [" ".join(rng.choice(vocab, 6)) for _ in range(bsz)]
        )
        t0 = time.time()
        out = fused(state, q, qterms, rv)
        np.asarray(out[0].ravel()[0])
        report[f"fused_compile_b{bsz}_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    trainer = RouterTrainer(router, checkpoint_dir="/tmp/warmup_router")
    trainer.train_epoch(
        (rng.normal(size=(16, 20)).astype(np.float32),
         rng.normal(size=(16, 20)).astype(np.float32),
         rng.uniform(size=(16, 20)).astype(np.float32))
    )
    report["train_step_compile_s"] = round(time.time() - t0, 2)

    if with_llm:
        from rag_uq_tpu.llm.tiny_lm import TinyLM

        t0 = time.time()
        lm = TinyLM()
        lm.generate("warmup", max_tokens=8, seed=0)
        report["sampler_compile_s"] = round(time.time() - t0, 2)

    logger.info("Warmup complete: %s", report)
    return report


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Pre-compile hot programs")
    parser.add_argument("--with-llm", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import json

    print(json.dumps(warmup(with_llm=args.with_llm), indent=2))


if __name__ == "__main__":
    main()
