"""Corpus sharding over a device mesh with per-shard top-k merged over ICI.

The reference has no parallelism at all (SURVEY.md §2.3); its only
"distribution" is HTTP calls to two services. Here the corpus embedding
matrix is sharded row-wise across a `jax.sharding.Mesh` axis ("corpus"),
queries are replicated, every chip computes an exact local top-k on its
shard, and the (score, global-id) pairs are merged with an all-gather over
ICI inside one jit/shard_map program. Results are bit-identical to the
single-chip path (tested on a virtual 8-device CPU mesh).

BM25 postings shard the same way: each shard holds the postings of its doc
range (doc ids are global), idf/avgdl are computed from global statistics at
sync, so local scores equal global scores and the same merge applies.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rag_uq_tpu.core.mesh import CORPUS_AXIS
from rag_uq_tpu.ops import bm25 as bm25_ops
from rag_uq_tpu.ops.topk import cosine_topk


def shard_corpus_matrix(emb: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [cap, D] matrix row-sharded over the corpus axis.

    cap must divide evenly by the axis size (pad capacity accordingly).
    """
    return jax.device_put(emb, NamedSharding(mesh, P(CORPUS_AXIS, None)))


def make_sharded_dense_topk(mesh: Mesh, k: int, block: int = 8192):
    """Build a jitted sharded exact top-k: emb sharded, queries replicated."""

    n_shards = mesh.shape[CORPUS_AXIS]

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CORPUS_AXIS, None), P(None, None), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def sharded_topk(emb_local, queries, size):
        shard_cap = emb_local.shape[0]
        i = jax.lax.axis_index(CORPUS_AXIS)
        local_size = jnp.clip(size - i * shard_cap, 0, shard_cap)
        # A shard holds at most shard_cap docs, so a local top-min(k, cap)
        # suffices for an exact global merge (and cosine_topk requires
        # k <= block <= shard_cap).
        k_local = min(k, shard_cap)
        vals, idx = cosine_topk(
            emb_local, queries, local_size, k_local, min(block, shard_cap)
        )
        idx = jnp.where(idx >= 0, idx + i * shard_cap, -1)
        # Merge per-shard top-k over ICI: all-gather the (score, id) pairs,
        # then every shard selects the global top-k (replicated output).
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)  # [S, B, k_local]
        all_idx = jax.lax.all_gather(idx, CORPUS_AXIS)
        bsz = vals.shape[0]
        cat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        cat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        k_out = min(k, n_shards * k_local)
        mv, sel = jax.lax.top_k(cat_v, k_out)
        mi = jnp.take_along_axis(cat_i, sel, axis=-1)
        mi = jnp.where(jnp.isneginf(mv), -1, mi)
        if k_out < k:  # pad to the requested width with dead slots
            pad = ((0, 0), (0, k - k_out))
            mv = jnp.pad(mv, pad, constant_values=-jnp.inf)
            mi = jnp.pad(mi, pad, constant_values=-1)
        return mv, mi

    return sharded_topk


def shard_bm25_state(
    state: Dict[str, jax.Array], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Row-shard CSR postings across the corpus axis by doc range.

    Host-side reshard: postings are re-bucketed so shard s holds postings of
    docs in [s*docs_per_shard, (s+1)*docs_per_shard), each shard with its own
    local indptr. Per-posting impacts already bake in GLOBAL idf/avgdl, so
    local scoring is exact.
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    indptr = np.asarray(state["indptr"])
    post_doc = np.asarray(state["post_doc"])
    post_w = np.asarray(state["post_w"])
    vcap = indptr.shape[0] - 1
    n_post = int(indptr[-1])

    # Expand postings to (term, doc, w) triples, bucket by doc shard.
    tids = np.repeat(np.arange(vcap, dtype=np.int32), np.diff(indptr))
    docs = post_doc[:n_post]
    ws = post_w[:n_post]
    # docs-per-shard derived from the dense capacity convention: the caller
    # passes `docs_per_shard` via state["docs_per_shard"].
    dps = int(state["docs_per_shard"])
    shard_of = docs // dps

    max_local = max(
        int(np.max(np.bincount(shard_of, minlength=n_shards))) if n_post else 1, 1
    )
    pcap_local = 1 << (max_local - 1).bit_length()

    local_indptr = np.zeros((n_shards, vcap + 1), dtype=np.int32)
    local_doc = np.zeros((n_shards, pcap_local), dtype=np.int32)
    local_w = np.zeros((n_shards, pcap_local), dtype=np.float32)
    for s in range(n_shards):
        m = shard_of == s
        t_s, d_s, w_s = tids[m], docs[m], ws[m]
        order = np.lexsort((d_s, t_s))
        t_s, d_s, w_s = t_s[order], d_s[order], w_s[order]
        counts = np.bincount(t_s, minlength=vcap)
        np.cumsum(counts, out=local_indptr[s, 1:])
        local_doc[s, : d_s.shape[0]] = d_s - s * dps  # local row positions
        local_w[s, : w_s.shape[0]] = w_s

    sharding = NamedSharding(mesh, P(CORPUS_AXIS, None))
    return {
        "indptr": jax.device_put(jnp.asarray(local_indptr), sharding),
        "post_doc": jax.device_put(jnp.asarray(local_doc), sharding),
        "post_w": jax.device_put(jnp.asarray(local_w), sharding),
        "docs_per_shard": dps,
    }


def make_sharded_bm25_topk(mesh: Mesh, k: int, max_df: int, n_docs_cap: int):
    """Sharded exhaustive BM25 top-k with ICI merge (exact)."""

    n_shards = mesh.shape[CORPUS_AXIS]

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None),
            P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def sharded_bm25(indptr_l, post_doc_l, post_w_l, qtids):
        i = jax.lax.axis_index(CORPUS_AXIS)
        dps = n_docs_cap // n_shards
        scores = bm25_ops.score_all(
            indptr_l[0], post_doc_l[0], post_w_l[0], qtids, dps, max_df
        )
        # A shard holds at most dps docs: clamp the local k (exact merge).
        k_local = min(k, dps)
        vals, idx = bm25_ops.topk_from_scores(scores, k_local)
        idx = jnp.where(idx >= 0, idx + i * dps, -1)
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)
        all_idx = jax.lax.all_gather(idx, CORPUS_AXIS)
        bsz = vals.shape[0]
        cat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        cat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        k_out = min(k, n_shards * k_local)
        mv, sel = jax.lax.top_k(cat_v, k_out)
        mi = jnp.take_along_axis(cat_i, sel, axis=-1)
        dead = mv <= 0.0
        mv = jnp.where(dead, 0.0, mv)
        mi = jnp.where(dead, -1, mi)
        if k_out < k:
            pad = ((0, 0), (0, k - k_out))
            mv = jnp.pad(mv, pad)
            mi = jnp.pad(mi, pad, constant_values=-1)
        return mv, mi

    return sharded_bm25
