#!/usr/bin/env python
"""Octet single-query: per-block overhead vs DMA block size / bucket count.

Round-5 finding: octet-q1 single-query ties slice-q2 (168.8-169.2) even
though the octet body sheds the fold/split VPU taxes AND streams 7.6%
fewer bytes. Hypothesis: the per-grid-step overhead (one pl.when branch
predicate per bucket per block, prologue/epilogue) eats the gain —
octet-q1 has ~2x the buckets of slice-q2, and the 10M stream is ~700+
blocks at 1024 sublanes.

Variants measured on the cached 10M corpus (interleaved slopes):
  octet-q1-b1024   the shipped headline (control)
  octet-q1-b2048   half the blocks, same buckets per branch set
  octet-q1-b4096   quarter the blocks
  octet-q2-b1024   ~half the buckets (quantum-2 widths), same blocks

Usage: python experiments/octet_block_lab.py [variants...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_query_batch
from spmv_topk_tpu.formats.coo import CooMatrix
from spmv_topk_tpu.ops.kernel import topk_spmv_fused_octet_device

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
ROWS, COLS, DEG = 10_000_000, 1024, 20

VARIANTS = {
    "octet-q1-b1024": dict(width_quantum=1, fused_block_sublanes=1024),
    "octet-q1-b2048": dict(width_quantum=1, fused_block_sublanes=2048),
    "octet-q1-b4096": dict(width_quantum=1, fused_block_sublanes=4096),
    "octet-q2-b1024": dict(width_quantum=2, fused_block_sublanes=1024),
    "octet-q4-b1024": dict(width_quantum=4, fused_block_sublanes=1024),
    "octet-q8-b1024": dict(width_quantum=8, fused_block_sublanes=1024),
}


def corpus():
    z = np.load(os.path.join(CACHE,
                             f"corpus_{ROWS}_{COLS}_{DEG}_gamma_s1.npz"))
    coo = CooMatrix(z["rows"], z["cols"], z["vals"],
                    int(z["dims"][0]), int(z["dims"][1]))
    coo._sorted = True
    return coo


def engine(coo, name, kw):
    cfg = TopKSpMVConfig(k=100, lane_k=8, max_cols=COLS, query_codec="h16",
                         fused_layout="octet", fold_tile=8, **kw)
    tag = os.path.join(
        CACHE, f"eng_{ROWS}_{COLS}_{DEG}_octet_q{cfg.width_quantum}_h16_f8"
               f"_b{cfg.fused_block_sublanes}_rNone_v4.npz")
    if os.path.exists(tag):
        return TopKSpMV.load(tag)
    t0 = time.time()
    eng = TopKSpMV(coo, cfg)
    eng.save(tag)
    print(f"packed {name} in {time.time() - t0:.0f}s "
          f"(buckets {len(eng.fused.plan)}, blocks {eng.fused.num_blocks}, "
          f"pad {eng.fused.padding_ratio:.3f})", flush=True)
    return eng


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def runner(eng, n_queries):
    cfg = eng.config
    tables = jnp.stack([
        eng._table(q)[0]
        for q in create_query_batch(n_queries, COLS, seed=2)])

    @jax.jit
    def run(words, nreal, tabs):
        def step(c, tab):
            tv, tt = topk_spmv_fused_octet_device(
                words, tab, nreal, cfg=cfg, plan=eng.fused.plan,
                block_sublanes=eng.fused.block_sublanes,
                num_blocks=eng.fused.num_blocks, codec=cfg.query_codec)
            return c, (tv.max(), tt.max())
        return jax.lax.scan(step, 0, tabs)[1]

    return lambda: np.asarray(run(eng._fwords, eng._fnreal, tables)[0])


def main():
    names = sys.argv[1:] or list(VARIANTS)
    coo = corpus()
    nnz = coo.nnz
    print(f"corpus {nnz} nnz", flush=True)
    pairs = {}
    for name in names:
        eng = engine(coo, name, VARIANTS[name])
        t0 = time.time()
        s, l = runner(eng, 4), runner(eng, 304)
        s(); l()
        print(f"{name}: buckets {len(eng.fused.plan)} blocks "
              f"{eng.fused.num_blocks} pad {eng.fused.padding_ratio:.3f} "
              f"(compile+warm {time.time() - t0:.0f}s)", flush=True)
        pairs[name] = (s, l)
    # interleave reps across variants so tenancy drift cancels
    res = {n: [] for n in pairs}
    for _ in range(5):
        for n, (s, l) in pairs.items():
            res[n].append((_timed(l) - _timed(s)) / 300.0)
    for n, slopes in res.items():
        per_q = float(np.median(slopes))
        print(f"{n:16s} {per_q * 1e3:7.3f} ms/q  {nnz / per_q / 1e9:7.1f} "
              f"Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
