#!/usr/bin/env python
"""Octet (slice-transposed) layout A/B vs the shipped slice layout.

The slice-layout h16 kernel sits at ~74.5% of its own measured VPU decode
envelope (ROOFLINE.md §2); the residual losses are period-boundary splits
(~1.9 cyc/chunk at quantum-2), per-slice sublane reductions, and the
width-quantum padding ladder (0.551 words/nnz vs the 0.5 h16 floor).
The octet layout (formats/sell_buckets.fuse_buckets_octet) removes all
three by construction: chunk j holds word j of eight strided slices, so
the kernel body is pure `acc += decode(chunk)` and ANY width streams
whole chunks (quantum-1 at zero split cost).

This lab measures the single-query slope (Gnnz/s) for:
  slice-q2   shipped production config (h16, quantum-2, fold_tile=8)
  octet-q2   same widths, transposed stream (isolates the VPU-body win)
  octet-q1   quantum-1 widths (adds the padding win)

Usage: [LAB_ROWS=2000000] python experiments/octet_lab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.ops.kernel import (topk_spmv_fused_device,
                                      topk_spmv_fused_octet_device,
                                      topk_spmv_fused_batch_device,
                                      topk_spmv_fused_batch_octet_device)

ROWS = int(os.environ.get("LAB_ROWS", 2_000_000))
COLS = 1024
DEG = 20
REPS = int(os.environ.get("LAB_REPS", 7))
BATCH = int(os.environ.get("LAB_BATCH", 0))   # 0 = single-query mode


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def make_runner(eng, n_queries):
    cfg = eng.config
    octet = cfg.fused_layout == "octet"
    dev = topk_spmv_fused_octet_device if octet else topk_spmv_fused_device
    tables = jnp.stack([
        eng._table(q)[0]
        for q in create_query_batch(n_queries, COLS, seed=2)
    ])

    @jax.jit
    def run(words, nreal, tabs):
        def step(carry, tab):
            topv, topt = dev(
                words, tab, nreal, cfg=cfg, plan=eng.fused.plan,
                block_sublanes=eng.fused.block_sublanes,
                num_blocks=eng.fused.num_blocks, codec=cfg.query_codec)
            return carry, (topv.max(), topt.max())
        _, outs = jax.lax.scan(step, 0, tabs)
        return outs

    return lambda: np.asarray(run(eng._fwords, eng._fnreal, tables)[0])


def make_batch_runner(eng, n_groups, Q):
    """Scan over n_groups groups of Q stacked tables (bench.py protocol)."""
    cfg = eng.config
    octet = cfg.fused_layout == "octet"
    dev = (topk_spmv_fused_batch_octet_device if octet
           else topk_spmv_fused_batch_device)
    from spmv_topk_tpu.ops.quantized_query import pack_query_tables
    qs = create_query_batch(Q * n_groups, COLS, seed=4)
    groups = jnp.stack([
        jnp.asarray(pack_query_tables(qs[i * Q:(i + 1) * Q],
                                      cfg.query_codec)[0])
        for i in range(n_groups)
    ])

    @jax.jit
    def run(words, nreal, gs):
        def step(c, g):
            tv, tt = dev(words, g, nreal, cfg=cfg, plan=eng.fused.plan,
                         block_sublanes=eng.fused.block_sublanes,
                         num_blocks=eng.fused.num_blocks,
                         codec=cfg.query_codec)
            return c, (tv.max(), tt.max())
        _, outs = jax.lax.scan(step, 0, gs)
        return outs

    return lambda: np.asarray(run(eng._fwords, eng._fnreal, groups)[0])


def measure_batch(name, eng, nnz, Q):
    short, long_ = make_batch_runner(eng, 2, Q), make_batch_runner(eng, 12, Q)
    t0 = time.time()
    short(); long_()
    compile_s = time.time() - t0
    slopes = sorted((_timed(long_) - _timed(short)) / 10.0 / Q
                    for _ in range(REPS))
    per_query = slopes[len(slopes) // 2]
    gnnz = nnz / per_query / 1e9
    print(f"{name:14s} Q={Q:3d} {per_query * 1e3:8.3f} ms/q  "
          f"{gnnz:7.1f} Gnnz/s/q  (compile+warm {compile_s:.1f}s)")
    return gnnz


def measure(name, eng, nnz):
    short, long_ = make_runner(eng, 4), make_runner(eng, 104)
    t0 = time.time()
    short(); long_()
    compile_s = time.time() - t0
    slopes = sorted((_timed(long_) - _timed(short)) / 100.0
                    for _ in range(REPS))
    per_query = slopes[len(slopes) // 2]
    gnnz = nnz / per_query / 1e9
    print(f"{name:10s} {per_query * 1e3:8.3f} ms/q  {gnnz:7.1f} Gnnz/s  "
          f"{eng.bytes_per_nnz / 4:6.3f} words/nnz  "
          f"(compile+warm {compile_s:.1f}s)")
    return gnnz


def main():
    print(f"corpus: {ROWS} rows x {COLS} cols, deg {DEG} gamma; "
          f"device {jax.devices()[0].platform}")
    coo = create_sparse_matrix(ROWS, COLS, DEG, "gamma", seed=1)
    nnz = coo.nnz
    base = dict(k=100, lane_k=8, num_partitions=1, max_cols=COLS,
                query_codec="h16", fused_block_sublanes=1024,
                fold_tile=8, rescore_pool=400)
    results = {}
    if BATCH:
        only = os.environ.get("LAB_ONLY", "")
        variants = [("slice-q2", "slice"), ("octet-q2", "octet")]
        if only:
            variants = [v for v in variants if only in v[1]]
        for name, layout in variants:
            eng = TopKSpMV(coo, TopKSpMVConfig(
                fused_layout=layout, width_quantum=2, **base))
            for Q in (16, 32, 64):
                results[f"{name}/Q{Q}"] = measure_batch(
                    f"batch-{name}", eng, nnz, Q)
            del eng
        for Q in (16, 32, 64):
            s = results.get(f"slice-q2/Q{Q}")
            o = results.get(f"octet-q2/Q{Q}")
            if s and o:
                print(f"Q={Q}: octet vs slice {o / s:.3f}x")
        return
    for name, layout, q in (("slice-q2", "slice", 2),
                            ("octet-q2", "octet", 2),
                            ("octet-q1", "octet", 1)):
        t0 = time.time()
        eng = TopKSpMV(coo, TopKSpMVConfig(
            fused_layout=layout, width_quantum=q, **base))
        pack_s = time.time() - t0
        print(f"-- {name}: packed in {pack_s:.1f}s, "
              f"{eng.fused.num_blocks} blocks, "
              f"{len(eng.fused.plan)} buckets")
        results[name] = measure(name, eng, nnz)
        del eng
    s = results.get("slice-q2")
    for name, g in results.items():
        if s and name != "slice-q2":
            print(f"{name} vs slice-q2: {g / s:.3f}x")


if __name__ == "__main__":
    main()
