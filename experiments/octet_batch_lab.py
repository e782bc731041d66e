#!/usr/bin/env python
"""Octet vs slice BATCH kernel A/B on the cached headline corpus.

Round-5 cold bench measured octet batch-32 at 118 Gnnz/s/query vs the
round-3 slice batch-32 at ~237 — a 2x regression that contradicts the
octet design intent (shared decode + pure accumulate should compound
with batching). This lab isolates where the time goes on the REAL 10M
corpus (reusing bench.py's .bench_cache engines):

  - slice-q2 batch vs octet-q1 batch at Q in {8, 32}
  - octet batch with batch_subgroup in {0, 8} (accumulator pressure)

Usage: python experiments/octet_batch_lab.py [Q ...]
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
from spmv_topk_tpu.ops.kernel import (topk_spmv_fused_batch_device,
                                      topk_spmv_fused_batch_octet_device)

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
ROWS, COLS, DEG = 10_000_000, 1024, 20


def corpus():
    z = np.load(os.path.join(CACHE, f"corpus_{ROWS}_{COLS}_{DEG}_gamma_s1.npz"))
    coo = CooMatrix(z["rows"], z["cols"], z["vals"],
                    int(z["dims"][0]), int(z["dims"][1]))
    coo._sorted = True
    return coo


def engine(coo, layout, wq, subgroup=0):
    tag = os.path.join(
        CACHE, f"eng_{ROWS}_{COLS}_{DEG}_{layout}_q{wq}_h16_f8_b1024_v3.npz")
    cfg = TopKSpMVConfig(k=100, lane_k=8, max_cols=COLS, query_codec="h16",
                         fused_layout=layout, width_quantum=wq,
                         fused_block_sublanes=1024, fold_tile=8,
                         batch_subgroup=subgroup)
    if os.path.exists(tag):
        eng = TopKSpMV.load(tag)
        import dataclasses
        eng.config = dataclasses.replace(
            eng.config, batch_subgroup=subgroup, rescore_pool=None)
        return eng
    t0 = time.time()
    eng = TopKSpMV(coo, cfg)
    eng.save(tag)
    print(f"packed {layout}-q{wq} in {time.time() - t0:.0f}s", flush=True)
    return eng


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def measure(name, eng, nnz, Q, n_short=2, n_long=8):
    cfg = eng.config
    octet = cfg.fused_layout == "octet"
    dev = (topk_spmv_fused_batch_octet_device if octet
           else topk_spmv_fused_batch_device)

    def runner(n_groups):
        qs = create_query_batch(Q * n_groups, COLS, seed=4)
        groups = jnp.stack([
            jnp.stack([eng._table(q)[0] for q in qs[i * Q:(i + 1) * Q]])
            for i in range(n_groups)])

        @jax.jit
        def go(words, nreal, gs):
            def step(c, g):
                tv, _ = dev(words, g, nreal, cfg=cfg, plan=eng.fused.plan,
                            block_sublanes=eng.fused.block_sublanes,
                            num_blocks=eng.fused.num_blocks,
                            codec=cfg.query_codec)
                return c, tv.max()
            return jax.lax.scan(step, 0, gs)[1]

        return lambda: np.asarray(go(eng._fwords, eng._fnreal, groups))

    short, long_ = runner(n_short), runner(n_long)
    t0 = time.time()
    short(); long_()
    compile_s = time.time() - t0
    sl = sorted((_timed(long_) - _timed(short)) / (n_long - n_short) / Q
                for _ in range(5))
    per_q = sl[len(sl) // 2]
    print(f"{name:24s} Q={Q:3d}  {per_q * 1e3:7.3f} ms/q  "
          f"{nnz / per_q / 1e9:7.1f} Gnnz/s/q  (compile+warm {compile_s:.0f}s)",
          flush=True)
    return per_q


def main():
    qlist = [int(a) for a in sys.argv[1:]] or [8, 32]
    coo = corpus()
    nnz = coo.nnz
    print(f"corpus {nnz} nnz", flush=True)
    engs = {
        "octet-q1": engine(coo, "octet", 1),
        "slice-q2": engine(coo, "slice", 2),
        "octet-q1-sub8": engine(coo, "octet", 1, subgroup=8),
    }
    res = {}
    for Q in qlist:
        for name, eng in engs.items():
            if name.endswith("sub8") and Q <= 8:
                continue
            res[f"{name}/Q{Q}"] = measure(name, eng, nnz, Q)
    s, o = res.get("slice-q2/Q32"), res.get("octet-q1/Q32")
    if s and o:
        print(f"octet/slice batch-32 ratio: {s / o:.3f}x "
              f"(>1 means octet faster)", flush=True)


if __name__ == "__main__":
    main()
