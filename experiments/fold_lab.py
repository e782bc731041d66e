#!/usr/bin/env python
"""Top-K fold-cost lab: per-slice fold variants at production-like width.

The fused h16 kernel folds a (1, 128) slice score into the (lane_k, 128)
Top-K scratch once per slice (every W sublanes). At W=10-12 (gamma deg-20
corpora) that's a fold every 1.25-1.5 chunks. Variants:

  base    : production fold — `where(t < limit)` mask + argmin-replacement
  tguard  : scalar `pl.when(t < limit)` replaces the vector mask
  vguard  : tguard + value guard `any(score >= worst)` with a (1, 128)
            running-worst scratch — skips the whole update for slices that
            cannot displace any candidate (most of them, late in the sweep)
  nofold  : no Top-K at all (decode+sum floor at this cadence)

Usage: python experiments/fold_lab.py [names...]   (env LAB_W, LAB_SPB)
"""

import functools
import os
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

LANES = 128
S = 8
W = int(os.environ.get("LAB_W", 16))      # must be a multiple of 8 here
SPB = int(os.environ.get("LAB_SPB", 32))
BLOCK_SUB = W * SPB
LANE_K = 8
NEG_INF = float("-inf")


def _prod(bc, w):
    """nsh_int_raw h16 decode (production)."""
    nw = ~w
    i1 = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bc, w, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    sh0 = jax.lax.shift_right_logical(nw, 5) & 28
    sh1 = jax.lax.shift_right_logical(nw, 21) & 28
    n0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g0, sh0), 28)
    n1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g1, sh1), 28)
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return v0 * n0 + v1 * n1


def _update(tv, tt, score, slice_idx):
    cur = tv[:]
    cur_min = jnp.min(cur, axis=0, keepdims=True)
    replace = (cur == cur_min) & (score >= cur_min)
    tv[:] = jnp.where(replace, score, cur)
    tt[:] = jnp.where(replace, slice_idx, tt[:])


def _mk_kernel(variant):
    def kern(lim_ref, tab_ref, words_ref, topv_ref, topt_ref, tv, tt, worst):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            tv[:] = jnp.full_like(tv, NEG_INF)
            tt[:] = jnp.zeros_like(tt)
            worst[:] = jnp.full_like(worst, NEG_INF)

        shape = (S, LANES)
        bc = jnp.broadcast_to(tab_ref[0:1, :], shape)
        limit = lim_ref[0]

        def slice_score(j):
            n_acc = 2 if W // S >= 2 else 1
            accs = [jnp.zeros((S, LANES), jnp.int32) for _ in range(n_acc)]
            for u in range(W // S):
                w = words_ref[pl.ds(j * W + u * S, S), :]
                accs[u % n_acc] = accs[u % n_acc] + _prod(bc, w)
            acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
            return jnp.sum(acc, axis=0, keepdims=True).astype(jnp.float32)

        def do_slice(j, _):
            score = slice_score(j)
            t = i * SPB + j
            if variant == "base":
                score = jnp.where(t < limit, score, NEG_INF)
                _update(tv, tt, score, t)
            elif variant == "tguard":
                @pl.when(t < limit)
                def _():
                    _update(tv, tt, score, t)
            elif variant == "vguard":
                hit = jnp.max(score - worst[:]) >= 0.0

                @pl.when((t < limit) & hit)
                def _():
                    _update(tv, tt, score, t)
                    worst[:] = jnp.min(tv[:], axis=0, keepdims=True)
            elif variant == "nofold":
                @pl.when(t < limit)
                def _():
                    tv[0:1, :] = score
            return 0

        # static unroll — production unrolls whenever the block body fits
        # (fori_loop with dynamic pl.ds offsets measured ~6.5x slower)
        for j in range(SPB):
            do_slice(j, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            topv_ref[:] = tv[:]
            topt_ref[:] = tt[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "nb"))
def run(words, table, lim, *, variant, nb):
    return pl.pallas_call(
        _mk_kernel(variant),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
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
            pltpu.VMEM((1, LANES), jnp.float32),
        ],
    )(lim, table, words)


def _mk_words(rng, n_sub):
    col = rng.integers(0, 1024, size=(n_sub, LANES, 2), dtype=np.int64)
    val = rng.integers(-32, 32, size=(n_sub, LANES, 2), dtype=np.int64)
    half = (col | ((val & 0x3F) << 10)).astype(np.uint64)
    w = (half[..., 0] | (half[..., 1] << 16)).astype(np.uint32)
    return w.view(np.int32)


def _mk_table(rng):
    q = rng.integers(-8, 8, size=(8, LANES), dtype=np.int64)
    tab = np.zeros((1, LANES), np.uint64)
    for g in range(8):
        tab[0] |= ((q[g] & 0xF).astype(np.uint64)) << (4 * g)
    return tab.astype(np.uint32).view(np.int32), q


def check():
    """vguard/tguard must agree with base on a random instance."""
    rng = np.random.default_rng(3)
    nb = 8
    words = jax.device_put(_mk_words(rng, nb * BLOCK_SUB))
    table, _ = _mk_table(rng)
    td = jax.device_put(table)
    lim = jnp.asarray([nb * SPB - 3], jnp.int32)
    ref_v, ref_t = (np.asarray(x) for x in
                    run(words, td, lim, variant="base", nb=nb))
    for name in ("tguard", "vguard"):
        tv, tt = (np.asarray(x) for x in
                  run(words, td, lim, variant=name, nb=nb))
        ok = (np.sort(tv, 0) == np.sort(ref_v, 0)).all()
        print(f"  check {name:8s} {'OK' if ok else 'MISMATCH'}")


def main():
    if "--check" in sys.argv:
        check()
    rng = np.random.default_rng(0)
    nb = int(os.environ.get("LAB_NB", 256))
    words = jax.device_put(_mk_words(rng, nb * BLOCK_SUB))
    table, _ = _mk_table(rng)
    td = jax.device_put(table)
    lim = jnp.asarray([nb * SPB], jnp.int32)

    clock = 0.94e9
    nchunks = nb * BLOCK_SUB // S

    def mk(variant, n):
        tabs = jnp.stack([jnp.roll(td, i, axis=1) for i in range(n)])

        @jax.jit
        def go(tabs):
            def step(c, t):
                r = run(words, t, lim, variant=variant, nb=nb)
                return c, r[0].max()
            _, outs = jax.lax.scan(step, 0, tabs)
            return outs
        return lambda: np.asarray(go(tabs))

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["base", "tguard", "vguard", "nofold"]
    for name in names:
        s_short, s_long = mk(name, 4), mk(name, 104)
        s_short(); s_long()
        slopes = []
        for _ in range(7):
            t0 = _t(s_short)
            t1 = _t(s_long)
            slopes.append((t1 - t0) / 100.0)
        dt = float(np.median(slopes))
        nnz = nb * BLOCK_SUB * LANES * 2
        cyc = dt * clock / nchunks
        gbs = nb * BLOCK_SUB * LANES * 4 / dt / 1e9
        print(f"{name:8s} {dt*1e3:8.3f} ms  {cyc:6.2f} cyc/chunk"
              f"  {nnz/dt/1e9:7.1f} Gnnz/s  {gbs:6.1f} GB/s")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
