#!/usr/bin/env python
"""Octet single-query: one pallas_call per bucket vs the fused dispatch.

The one-call octet kernel carries a `pl.when(blk_start <= i < blk_end)`
predicate per bucket (15 at q2, 28 at q1); every grid step evaluates all
of them and the program carries every bucket body.  The q2-vs-q1 ladder
(octet_block_lab.py) showed the bucket count costs ~2.4% even after
q1's padding advantage — this lab measures the limit case, now shipped
as config.octet_multicall (ops/kernel._octet_multicall): one pallas_call
PER bucket, each with a single static width and zero bucket predicates,
block ranges addressed by an index_map offset, results merged with one
per-lane top-K over the B*lane_k stacked candidates.

Tradeoff measured: zero predicate/program-size overhead per grid step
vs B Pallas pipeline ramps (the double-buffer prologue re-runs per
call) + one (B*K, 128) merge.  Result on the 10M headline corpus
(2026-08-21, interleaved slopes, 5 reps): multicall 177.8 Gnnz/s
(1.097 ms/q) vs one-call 173.5 (1.124) — +2.5%, and compiles faster
(20 s vs 29 s cold).  Production default: octet_multicall=True.

Usage: python experiments/octet_multicall_lab.py [reps]
Needs the cached 10M corpus + octet-q2 engine in .bench_cache (bench.py
creates both).
"""

import dataclasses
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
from spmv_topk_tpu.config import LANES
from spmv_topk_tpu.formats import create_query_batch
from spmv_topk_tpu.formats.coo import CooMatrix
from spmv_topk_tpu.ops.kernel import topk_spmv_fused_octet_device

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
ROWS, COLS, DEG = 10_000_000, 1024, 20


def corpus():
    z = np.load(os.path.join(CACHE,
                             f"corpus_{ROWS}_{COLS}_{DEG}_gamma_s1.npz"))
    coo = CooMatrix(z["rows"], z["cols"], z["vals"],
                    int(z["dims"][0]), int(z["dims"][1]))
    coo._sorted = True
    return coo


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def runner(eng, n_queries, cfg):
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    coo = corpus()
    nnz = coo.nnz
    tag = os.path.join(CACHE, f"eng_{ROWS}_{COLS}_{DEG}_octet_q2_h16_f8"
                              f"_b1024_r400_v4.npz")
    eng = TopKSpMV.load(tag, matrix=coo)
    print(f"corpus {nnz} nnz, buckets {len(eng.fused.plan)}, "
          f"blocks {eng.fused.num_blocks}", flush=True)
    cfgs = {
        "onecall": dataclasses.replace(eng.config, octet_multicall=False),
        "multicall": dataclasses.replace(eng.config, octet_multicall=True),
    }

    # correctness first: same candidates modulo score ties
    q = create_query_batch(1, COLS, seed=3)[0]
    tab, _ = eng._table(q)
    outs = {}
    for name, cfg in cfgs.items():
        outs[name] = map(np.asarray, topk_spmv_fused_octet_device(
            eng._fwords, jnp.asarray(tab), eng._fnreal, cfg=cfg,
            plan=eng.fused.plan, block_sublanes=eng.fused.block_sublanes,
            num_blocks=eng.fused.num_blocks, codec=cfg.query_codec))
    (v0, t0), (v1, t1) = outs["onecall"], outs["multicall"]
    # wrong decode/tag arithmetic would shift scores wholesale; ties at
    # equal score legitimately differ (the non-tie-safe _topk_update
    # drops tied candidates order-dependently in BOTH variants) and only
    # reshuffle REPEATED values near the buffer floor — so compare the
    # top-4 DISTINCT scores per lane.
    for lane in range(LANES):
        s0 = sorted({round(float(v), 3) for v in v0[:, lane]
                     if v > -1e30}, reverse=True)
        s1 = sorted({round(float(v), 3) for v in v1[:, lane]
                     if v > -1e30}, reverse=True)
        assert s0[:4] == s1[:4], (lane, s0, s1)
    print("correctness: per-lane top-4 distinct scores identical "
          "(128 lanes; remaining slots differ only at score ties)",
          flush=True)

    pairs = {}
    for name, cfg in cfgs.items():
        t0 = time.time()
        s, l = runner(eng, 4, cfg), runner(eng, 304, cfg)
        s(); l()
        print(f"{name}: compile+warm {time.time() - t0:.0f}s", flush=True)
        pairs[name] = (s, l)
    res = {n: [] for n in pairs}
    for _ in range(reps):
        for n, (s, l) in pairs.items():
            res[n].append((_timed(l) - _timed(s)) / 300.0)
    for n, slopes in res.items():
        per_q = float(np.median(slopes))
        print(f"{n:10s} {per_q * 1e3:7.3f} ms/q  {nnz / per_q / 1e9:7.1f} "
              f"Gnnz/s  reps {[round(x * 1e3, 3) for x in slopes]}",
          flush=True)


if __name__ == "__main__":
    main()
