#!/usr/bin/env python
"""Bisect production-vs-lab kernel overhead: add production features one
at a time to the bare int8 bucket kernel and measure cycles/chunk.

v_bare   : lab int8 kernel (no SMEM, no mask, no branches)
v_smem   : + (B,1) SMEM nreal input + per-slice where-mask + slice_base
v_branch : + 3 pl.when branches on block-index ranges (same W)
v_prod   : the real _fused_kernel via topk_spmv_fused_device (1 bucket x3)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from experiments.kernel_lab import (
    LANES, S, LANE_K, NEG_INF, _decode_val, _topk_update, body_int8)

W = 32
SPB = 16
BLOCK_SUB = W * SPB
NB = 256
NSEG = 3  # branches in v_branch


def _mk_kernel(with_smem, with_branch):
    def kern(*refs):
        if with_smem:
            nreal_ref, tab_ref, words_ref, topv_ref, topt_ref, tv, tt = refs
        else:
            tab_ref, words_ref, topv_ref, topt_ref, tv, tt = refs
            nreal_ref = None
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            tv[:] = jnp.full_like(tv, NEG_INF)
            tt[:] = jnp.zeros_like(tt)

        shape = (S, LANES)
        bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
               for c in range(2)]

        def seg_body(blk_start, slice_base, nblocks, bi):
            def do_slice(j):
                accs = [jnp.zeros((S, LANES), jnp.float32) for _ in range(2)]
                for u in range(W // S):
                    w = words_ref[pl.ds(j * W + u * S, S), :]
                    accs[u % 2] = accs[u % 2] + body_int8(tab_ref, w, bcs)
                score = jnp.sum(accs[0] + accs[1], axis=0, keepdims=True)
                t = slice_base + (i - blk_start) * SPB + j
                if with_smem:
                    score = jnp.where(t < slice_base + nreal_ref[bi, 0],
                                      score, NEG_INF)
                _topk_update(tv, tt, score, t)
            for j in range(SPB):
                do_slice(j)

        if with_branch:
            per = NB // NSEG
            for bi in range(NSEG):
                lo = bi * per
                hi = NB if bi == NSEG - 1 else (bi + 1) * per

                @pl.when((i >= lo) & (i < hi))
                def _(bi=bi, lo=lo):
                    seg_body(lo, lo * SPB, hi - lo, bi)
        else:
            seg_body(0, 0, NB, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            topv_ref[:] = tv[:]
            topt_ref[:] = tt[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run(words, table, nreal, *, variant):
    with_smem = variant in ("v_smem", "v_branch")
    with_branch = variant == "v_branch"
    kern = _mk_kernel(with_smem, with_branch)
    in_specs = []
    args = []
    if with_smem:
        in_specs.append(pl.BlockSpec((NSEG, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(nreal)
    in_specs += [
        pl.BlockSpec((2, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_SUB, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [table, words]
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((LANE_K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((LANE_K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((LANE_K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LANE_K, LANES), jnp.float32),
            pltpu.VMEM((LANE_K, LANES), jnp.int32),
        ],
    )(*args)


def main():
    rng = np.random.default_rng(0)
    cols = rng.integers(0, 1024, size=(NB * BLOCK_SUB, LANES), dtype=np.int64)
    vals = rng.integers(0, 2**16, size=cols.shape, dtype=np.int64)
    w64 = (cols << 16) | vals
    words = jax.device_put(w64.astype(np.uint32).view(np.int32))
    table = jax.device_put(rng.integers(-2**31, 2**31 - 1, size=(2, LANES),
                                        dtype=np.int64).astype(np.int32))
    nreal = jax.device_put(np.full((NSEG, 1), NB * SPB, np.int32))

    # production fused kernel on the same data, 3 equal W=32 buckets
    from spmv_topk_tpu.config import TopKSpMVConfig
    from spmv_topk_tpu.formats.sell_buckets import FusedBucket
    from spmv_topk_tpu.ops.kernel import topk_spmv_fused_device
    cfg = TopKSpMVConfig(k=100, lane_k=LANE_K, max_cols=1024,
                         query_codec="int8x4")
    per = NB // NSEG
    plan = tuple(
        FusedBucket(width=W, slices_per_block=SPB, blocks_per_slice=1,
                    slice_base=b * per * SPB, blk_start=b * per,
                    num_blocks=(NB - 2 * per) if b == NSEG - 1 else per)
        for b in range(NSEG)
    )

    def v_prod(t):
        return topk_spmv_fused_device(
            words, t, nreal[:, :1], cfg=cfg, plan=plan,
            block_sublanes=BLOCK_SUB, num_blocks=NB, codec="int8x4")

    def mk(fn, n):
        tabs = jnp.stack([jnp.roll(table, i, axis=1) for i in range(n)])

        @jax.jit
        def go(tabs):
            def step(c, t):
                r = fn(t)
                return c, r[0].max()
            _, outs = jax.lax.scan(step, 0, tabs)
            return outs
        return lambda: np.asarray(go(tabs))

    variants = [
        ("v_bare", lambda t: run(words, t, nreal, variant="v_bare")),
        ("v_smem", lambda t: run(words, t, nreal, variant="v_smem")),
        ("v_branch", lambda t: run(words, t, nreal, variant="v_branch")),
        ("v_prod", v_prod),
    ]
    clock = 0.94e9
    nchunks = NB * (BLOCK_SUB // S)
    for name, fn in variants:
        s2, s42 = mk(fn, 4), mk(fn, 104)
        s2(); s42()
        ts = min(_t(s2) for _ in range(5))
        tl = min(_t(s42) for _ in range(5))
        dt = (tl - ts) / 100.0
        nnz = NB * BLOCK_SUB * LANES
        print(f"{name:10s} {dt*1e3:8.3f} ms  {dt*clock/nchunks:6.2f} cyc/chunk"
              f"  {nnz/dt/1e9:7.1f} Gnnz/s")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
