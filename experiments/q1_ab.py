"""A/B: width_quantum 1 vs 2 on the real chip (round 4, VERDICT #1).

Padding simulation (experiments/padding_lab.py) projects 0.551 -> 0.528
words/nnz at the 10M-row bench scale. This job measures actual kernel
throughput on a 1M-row corpus (same degree profile; padding components
scale) for single-query and batch-32 paths, plus compile cost (bucket
branches ~double).

Run ON the TPU host, nothing else running: python experiments/q1_ab.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_query_batch, create_sparse_matrix
from spmv_topk_tpu.ops.kernel import (topk_spmv_fused_batch_device,
                                      topk_spmv_fused_device)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
COLS = 1024
QB = 32


def build(quantum):
    cfg = TopKSpMVConfig(k=100, max_cols=COLS, query_codec="h16",
                         width_quantum=quantum, fused_block_sublanes=1024,
                         fold_tile=8, rescore_pool=400)
    t0 = time.time()
    eng = TopKSpMV(coo, cfg)
    return eng, cfg, time.time() - t0


def single_fn(eng, cfg, n):
    tables = jnp.stack([eng._table(q)[0]
                        for q in create_query_batch(n, COLS, seed=2)])

    @jax.jit
    def run(words, nreal, tabs):
        def step(c, tab):
            tv, tt = topk_spmv_fused_device(
                words, tab, nreal, cfg=cfg, plan=eng.fused.plan,
                block_sublanes=eng.fused.block_sublanes,
                num_blocks=eng.fused.num_blocks, codec=cfg.query_codec)
            return c, (tv.max(), tt.max())
        return jax.lax.scan(step, 0, tabs)[1]

    return lambda: np.asarray(run(eng._fwords, eng._fnreal, tables)[0])


def batch_fn(eng, cfg, n_groups):
    qs = create_query_batch(QB * n_groups, COLS, seed=4)
    groups = jnp.stack([
        jnp.stack([eng._table(q)[0] for q in qs[i * QB:(i + 1) * QB]])
        for i in range(n_groups)])

    @jax.jit
    def go(words, nreal, gs):
        def step(c, g):
            tv, _ = topk_spmv_fused_batch_device(
                words, g, nreal, cfg=cfg, plan=eng.fused.plan,
                block_sublanes=eng.fused.block_sublanes,
                num_blocks=eng.fused.num_blocks, codec=cfg.query_codec)
            return c, tv.max()
        return jax.lax.scan(step, 0, gs)[1]

    return lambda: np.asarray(go(eng._fwords, eng._fnreal, groups))


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


coo = create_sparse_matrix(ROWS, COLS, 20, "gamma", seed=1)
for quantum in (2, 1):
    eng, cfg, pack_s = build(quantum)
    t0 = time.time()
    s, L = single_fn(eng, cfg, 4), single_fn(eng, cfg, 304)
    bs, bl = batch_fn(eng, cfg, 2), batch_fn(eng, cfg, 12)
    s(); L(); bs(); bl()
    compile_s = time.time() - t0
    reps = sorted((_timed(L) - _timed(s)) / 300.0 for _ in range(7))
    per_q = reps[len(reps) // 2]
    breps = sorted((_timed(bl) - _timed(bs)) / 10.0 / QB for _ in range(5))
    per_qb = breps[len(breps) // 2]
    # accuracy spot check
    q = create_query_batch(1, COLS, seed=3)[0]
    from spmv_topk_tpu.ops.gold import topk_exact

    ki = np.asarray(eng.query(q)[0])
    gi, _ = topk_exact(coo, q, 100)
    prec = len(set(gi.tolist()) & set(ki.tolist())) / 100
    print(f"q{quantum}: pad={eng.fused.padding_ratio:.4f} "
          f"buckets={len(eng.fused.plan)} pack={pack_s:.1f}s "
          f"compile={compile_s:.1f}s "
          f"single={coo.nnz / per_q / 1e9:.1f} Gnnz/s "
          f"batch{QB}={coo.nnz / per_qb / 1e9:.1f} Gnnz/s/query "
          f"prec@100={prec}", flush=True)
