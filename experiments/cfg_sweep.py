#!/usr/bin/env python
"""Pack-geometry sweep: quantum x block-size on the bench matrix.

Separates the effects of (a) width_quantum (2 vs 4: fewer padding bytes
vs more split-fold compute), (b) fused_block_sublanes (512 vs 1024:
smaller block tails vs more grid steps), with the interleaved stream-floor
ratio so chip-tenancy drift cancels.

Usage: python experiments/cfg_sweep.py [q,tgt ...]   e.g. 2,512 4,1024
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import LANES, TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.ops.kernel import topk_spmv_fused_device
from spmv_topk_tpu.ops.streamprobe import stream_words_device


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def measure(coo, quantum, tgt, tile=1):
    cfg = TopKSpMVConfig(k=100, lane_k=8, max_cols=1024, query_codec="h16",
                         width_quantum=quantum, fused_block_sublanes=tgt,
                         fold_tile=tile, rescore_pool=400)
    t0 = time.time()
    eng = TopKSpMV(coo, cfg)
    pack_s = time.time() - t0

    def stream_fn(n):
        tables = jnp.stack([
            eng._table(q)[0]
            for q in create_query_batch(n, 1024, seed=2)])

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

    def floor_fn(n):
        salts = jnp.arange(n * LANES, dtype=jnp.int32).reshape(n, 1, LANES)

        @jax.jit
        def go(words, salts):
            def step(c, s):
                out = stream_words_device(
                    words, s, block_sublanes=eng.fused.block_sublanes,
                    num_blocks=eng.fused.num_blocks)
                return c, out.max()
            return jax.lax.scan(step, 0, salts)[1]

        return lambda: np.asarray(go(eng._fwords, salts))

    ks, kl = stream_fn(4), stream_fn(104)
    fs, fl = floor_fn(4), floor_fn(104)
    t0 = time.time()
    ks(); kl(); fs(); fl()
    comp_s = time.time() - t0

    reps = []
    for _ in range(9):
        k = (_t(kl) - _t(ks)) / 100.0
        f = (_t(fl) - _t(fs)) / 100.0
        reps.append((k, f))
    per = float(np.median([k for k, _ in reps]))
    floor = float(np.median([f for _, f in reps]))
    ratio = float(np.median([f / k for k, f in reps]))
    gb = eng.hbm_bytes / 1e9
    print(f"q{quantum} tgt{tgt:5d} tile{tile}: {coo.nnz/per/1e9:7.2f} Gnnz/s  "
          f"{gb/per:6.1f} GB/s  floor {gb/floor:6.1f} GB/s  "
          f"ratio {100*ratio:5.1f}%  pad {eng.fused.padding_ratio:.3f}  "
          f"pack {pack_s:.0f}s comp {comp_s:.0f}s", flush=True)


def main():
    coo = create_sparse_matrix(1_000_000, 1024, 20, "gamma", seed=1)
    cases = [(2, 1024, 1), (2, 1024, 8)]
    if len(sys.argv) > 1:
        cases = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    for case in cases:
        measure(coo, *case)


if __name__ == "__main__":
    main()
