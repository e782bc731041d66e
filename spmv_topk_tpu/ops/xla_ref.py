"""Pure-XLA Top-K SpMV implementations (no Pallas).

Two roles:
  1. `topk_spmv_sell_xla`: a jnp re-statement of the exact semantics of the
     Pallas kernel over the same SellMatrix arrays — the TPU analog of the
     reference's packet-accurate software model
     (spmv_coo_gold_top_k_packet, gold_algorithms.hpp:277-362), used as the
     differential oracle in tests.
  2. `topk_spmv_segment_xla`: the two-phase baseline (full SpMV then top-k),
     the analog of the reference's GPU hosts (cusparseSpMV + thrust full
     argsort + gather, host_spmv_topk_csr_gpu.cu:171-231).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LANES
from ..formats.sell import SellMatrix


def sell_scores_np(m: SellMatrix, query: np.ndarray) -> np.ndarray:
    """NumPy bit-exact model of the kernel's per-slice scores.

    f32 products of bf16-decoded values, accumulated in the kernel's order:
    within a lane, sub-chunk partials are added sublane-by-sublane via the
    (8, 128) accumulator then reduced; NumPy's pairwise f32 sum differs only
    below test tolerance for the sizes used in tests.
    """
    from ..formats.sell_buckets import BucketedSellMatrix

    if isinstance(m, BucketedSellMatrix):
        return _bucketed_scores_np(m, query)
    w = m.words.view(np.uint32)
    cols = (w >> 16).astype(np.int64)
    vals = (w << 16).view(np.float32)
    prods = np.where(w != 0, vals * query[cols].astype(np.float32), 0.0)

    scores = np.full(m.num_rows, np.nan, np.float32)
    S = m.config.chunk_sublanes
    cpb = m.config.block_sublanes // S
    for p in range(m.num_partitions):
        c0 = p * m.part_blocks * cpb
        sub0 = c0 * S
        acc = np.zeros(LANES, np.float32)
        for ci in range(m.part_blocks * cpb):
            lo = sub0 + ci * S
            acc += prods[lo:lo + S].sum(axis=0, dtype=np.float32)
            meta = int(m.meta[c0 + ci])
            if meta & 1:
                t = meta >> 1
                ids = m.row_ids[t]
                real = ids >= 0
                scores[ids[real]] = acc[real]
                acc[:] = 0.0
    return scores


def _bucketed_scores_np(m, query: np.ndarray) -> np.ndarray:
    """Per-row scores of the bucketed layout (kernel-order f32 sums)."""
    scores = np.full(m.num_rows, np.nan, np.float32)
    for b in m.buckets:
        w = b.words.view(np.uint32)
        cols = (w >> 16).astype(np.int64)
        vals = (w << 16).view(np.float32)
        prods = np.where(w != 0, vals * query[cols].astype(np.float32), 0.0)
        S = m.config.chunk_sublanes
        for j in range(b.num_slices):
            t = b.slice_base + j
            # accumulate in the kernel's order: S-sublane partials
            acc = np.zeros(prods.shape[1], np.float32)
            for u in range(b.width // S):
                lo = j * b.width + u * S
                acc += prods[lo:lo + S].sum(axis=0, dtype=np.float32)
            ids = m.row_ids[t]
            real = ids >= 0
            scores[ids[real]] = acc[real]
    return scores


@functools.partial(jax.jit, static_argnames=("num_rows", "k"))
def topk_spmv_segment_xla(rows, cols, vals, query, num_rows: int, k: int):
    """Two-phase Top-K SpMV: segment-sum SpMV then lax.top_k.

    The reference GPU path computes the full dense result then a full
    argsort (host_spmv_topk_csr_gpu.cu:199-218); XLA's top_k avoids the
    full sort but the result vector is still materialized — this is the
    baseline the fused kernel is benchmarked against.
    """
    prods = vals * query[cols]
    scores = jax.ops.segment_sum(prods, rows, num_segments=num_rows)
    v, i = jax.lax.top_k(scores, k)
    return i.astype(jnp.int32), v


def topk_spmv_sell_xla(m: SellMatrix, query: np.ndarray, k: int):
    """Oracle Top-K over SellMatrix semantics (NumPy scores + exact top-k)."""
    scores = sell_scores_np(m, query)
    scores = np.where(np.isnan(scores), -np.inf, scores)
    k = min(k, m.num_rows)
    part = np.argpartition(-scores, k - 1)[:k]
    order = np.argsort(-scores[part], kind="stable")
    idx = part[order]
    return idx.astype(np.int32), scores[idx].astype(np.float32)
