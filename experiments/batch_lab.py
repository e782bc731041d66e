#!/usr/bin/env python
"""Multi-query (batch) h16 decode-structure lab: cyc/chunk/query.

The production batch kernels (`_fused_kernel_batch`, `_bucket_kernel_batch`)
decode each chunk once per QUERY and rely on Mosaic CSE to dedupe the
query-independent word arithmetic (shift amounts, value extraction). The
measured batch16 rate (207 Gnnz/s/query, RESULTS c3/bench) is ~2x below the
op-count envelope (~10 query-dependent ops/chunk/query -> ~5 cyc -> ~385
Gnnz/s/query), so either CSE is not happening, Q live accumulators spill
vector registers, or the per-slice fold dominates. This lab bisects:

  cur     : production structure — chunk-outer, Q live accs, full per-query
            decode (body = the shipped nsh_int_raw chain)
  shared  : chunk-outer, Q live accs, EXPLICIT shared decode per chunk
  sub2/4/8: query sub-groups of QG — only QG accs live at once; words
            re-read from VMEM and shared decode recomputed per sub-group
  nofold  : `shared` with the Top-K fold removed (fold cost share)
  tilefold: `shared` + per-query tile-8 buffered fold (top-2 per tile)

Usage: python experiments/batch_lab.py [variants...] [--check]
  LAB_Q=16 LAB_W=16 LAB_NB=64 override geometry.
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
W = int(os.environ.get("LAB_W", 16))
Q = int(os.environ.get("LAB_Q", 16))
SPB = int(os.environ.get("LAB_SPB", max(1, 1024 // W)))
BLOCK_SUB = W * SPB
LANE_K = 8
NEG_INF = float("-inf")
TILE = 8


INTERPRET = os.environ.get("LAB_INTERPRET") == "1"


def shared_h16(w):
    """Query-independent word arithmetic (one evaluation per chunk)."""
    nw = ~w
    i0 = (w & 0x7F) if INTERPRET else w   # HW lane gather wraps mod 128
    i1 = jax.lax.shift_right_logical(w, 16)
    if INTERPRET:
        i1 = i1 & 0x7F
    sh0 = jax.lax.shift_right_logical(nw, 5) & 28
    sh1 = jax.lax.shift_right_logical(nw, 21) & 28
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return (i0, i1, sh0, sh1, v0, v1)


def apply_h16(bc, s):
    """Query-dependent tail: 2 gathers + 2 shl + 2 sar + 2 mul + 1 add."""
    i0, i1, sh0, sh1, v0, v1 = s
    g0 = jnp.take_along_axis(bc, i0, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    n0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g0, sh0), 28)
    n1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g1, sh1), 28)
    return v0 * n0 + v1 * n1


def body_full(bc, w):
    """The shipped single-query chain (nsh_int_raw), per query."""
    return apply_h16(bc, shared_h16(w))


def _fold(tv, tt, q, score, t):
    cur = tv[q]
    cur_min = jnp.min(cur, axis=0, keepdims=True)
    replace = (cur == cur_min) & (score >= cur_min)
    tv[q] = jnp.where(replace, score, cur)
    tt[q] = jnp.where(replace, t, tt[q])


def _mk_kernel(mode, qg=None, fold=True):
    def kern(tab_ref, words_ref, topv_ref, topt_ref, tv, tt, tilebuf):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            tv[:] = jnp.full_like(tv, NEG_INF)
            tt[:] = jnp.zeros_like(tt)

        shape = (S, LANES)
        bcs = [jnp.broadcast_to(tab_ref[q:q + 1, :], shape)
               for q in range(Q)]

        if mode in ("cur", "shared"):
            for j in range(SPB):
                accs = [jnp.zeros((S, LANES), jnp.int32) for _ in range(Q)]
                for u in range(W // S):
                    w = words_ref[pl.ds(j * W + u * S, S), :]
                    if mode == "shared":
                        s = shared_h16(w)
                        for q in range(Q):
                            accs[q] = accs[q] + apply_h16(bcs[q], s)
                    else:
                        for q in range(Q):
                            accs[q] = accs[q] + body_full(bcs[q], w)
                if fold:
                    t = i * SPB + j
                    for q in range(Q):
                        score = jnp.sum(accs[q], axis=0,
                                        keepdims=True).astype(jnp.float32)
                        _fold(tv, tt, q, score, t)
                else:
                    # keep accs live so nothing is DCE'd: fold every
                    # slice's combined sum into slot 0 unconditionally
                    tot = accs[0]
                    for q in range(1, Q):
                        tot = tot + accs[q]
                    score = jnp.sum(tot, axis=0,
                                    keepdims=True).astype(jnp.float32)
                    tv[0] = jnp.maximum(tv[0], score)
        elif mode == "sub":
            for j in range(SPB):
                t = i * SPB + j
                for q0 in range(0, Q, qg):
                    ng = min(qg, Q - q0)
                    accs = [jnp.zeros((S, LANES), jnp.int32)
                            for _ in range(ng)]
                    for u in range(W // S):
                        w = words_ref[pl.ds(j * W + u * S, S), :]
                        s = shared_h16(w)
                        for dq in range(ng):
                            accs[dq] = accs[dq] + apply_h16(bcs[q0 + dq], s)
                    for dq in range(ng):
                        score = jnp.sum(accs[dq], axis=0,
                                        keepdims=True).astype(jnp.float32)
                        _fold(tv, tt, q0 + dq, score, t)
        elif mode == "tilefold":
            # strided tile-8 per-query buffered fold (top-2 per flush),
            # shared decode, Q live accs
            G = -(-SPB // TILE)
            cnt = [0] * Q
            for gi in range(G):
                for m in range(TILE):
                    j = gi + m * G
                    if j >= SPB:
                        break
                    accs = [jnp.zeros((S, LANES), jnp.int32)
                            for _ in range(Q)]
                    for u in range(W // S):
                        w = words_ref[pl.ds(j * W + u * S, S), :]
                        s = shared_h16(w)
                        for q in range(Q):
                            accs[q] = accs[q] + apply_h16(bcs[q], s)
                    for q in range(Q):
                        score = jnp.sum(accs[q], axis=0,
                                        keepdims=True).astype(jnp.float32)
                        tilebuf[q * TILE + cnt[q], :] = score[0]
                        cnt[q] += 1
                t0 = i * SPB + gi
                for q in range(Q):
                    n = cnt[q]
                    if n == 0:
                        continue
                    tb = tilebuf[q * TILE:q * TILE + n, :]
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (n, LANES), 0)
                    m1 = jnp.max(tb, axis=0, keepdims=True)
                    sl1 = jnp.min(jnp.where(tb == m1, iota, n), axis=0,
                                  keepdims=True)
                    _fold(tv, tt, q, m1, t0 + sl1 * G)
                    if n > 1:
                        tb2 = jnp.where(iota == sl1, NEG_INF, tb)
                        m2 = jnp.max(tb2, axis=0, keepdims=True)
                        sl2 = jnp.min(jnp.where(tb2 == m2, iota, n),
                                      axis=0, keepdims=True)
                        _fold(tv, tt, q, m2, t0 + sl2 * G)
                    cnt[q] = 0

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            topv_ref[:] = tv[:]
            topt_ref[:] = tt[:]

    return kern


VARIANTS = {
    "cur": ("cur", None, True),
    "shared": ("shared", None, True),
    "nofold": ("shared", None, False),
    "sub2": ("sub", 2, True),
    "sub4": ("sub", 4, True),
    "sub8": ("sub", 8, True),
    "tilefold": ("tilefold", None, True),
}


@functools.partial(jax.jit, static_argnames=("variant", "nb"))
def run(words, tables, *, variant, nb):
    mode, qg, fold = VARIANTS[variant]
    return pl.pallas_call(
        _mk_kernel(mode, qg, fold),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Q, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, LANE_K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, LANE_K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, LANE_K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Q, LANE_K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, LANE_K, LANES), jnp.float32),
            pltpu.VMEM((Q, LANE_K, LANES), jnp.int32),
            pltpu.VMEM((Q * TILE, LANES), jnp.float32),
        ],
        interpret=os.environ.get("LAB_INTERPRET") == "1",
    )(tables, words)


def _mk_words(rng, n_sub):
    col = rng.integers(0, 1024, size=(n_sub, LANES, 2), dtype=np.int64)
    val = rng.integers(-32, 32, size=(n_sub, LANES, 2), dtype=np.int64)
    half = (col | ((val & 0x3F) << 10)).astype(np.uint64)
    w = (half[..., 0] | (half[..., 1] << 16)).astype(np.uint32)
    return w.view(np.int32), col, val


def _mk_tables(rng):
    q = rng.integers(-8, 8, size=(Q, 8, LANES), dtype=np.int64)
    tab = np.zeros((Q, LANES), np.uint64)
    for g in range(8):
        tab |= ((q[:, g] & 0xF).astype(np.uint64)) << (4 * g)
    return tab.astype(np.uint32).view(np.int32), q


def check():
    rng = np.random.default_rng(7)
    global SPB, BLOCK_SUB
    spb_save, bs_save = SPB, BLOCK_SUB
    nb, SPB = 2, 4
    BLOCK_SUB = W * SPB
    n_sub = nb * BLOCK_SUB
    words, col, val = _mk_words(rng, n_sub)
    tables, qv = _mk_tables(rng)

    contrib = np.zeros((Q, n_sub, LANES), np.int64)
    for h in range(2):
        lane = col[..., h] & 127
        grp = col[..., h] >> 7
        for q in range(Q):
            contrib[q] += val[..., h] * qv[q, grp, lane]
    scores = contrib.reshape(Q, nb * SPB, W, LANES).sum(axis=2)

    wd, td = jax.device_put(words), jax.device_put(tables)
    try:
        for name in VARIANTS:
            if name == "nofold":
                continue
            tv, _ = run(wd, td, variant=name, nb=nb)
            tv = np.asarray(tv)
            got = tv.max(axis=1)                       # (Q, LANES)
            want = scores.max(axis=1).astype(np.float64)
            ok = np.allclose(got, want)
            print(f"  check {name:9s} {'OK' if ok else 'MISMATCH'}")
            if not ok:
                bad = np.argwhere(got != want)[:4]
                print("   ", bad, got[tuple(bad.T)], want[tuple(bad.T)])
    finally:
        SPB, BLOCK_SUB = spb_save, bs_save


def main():
    if "--check" in sys.argv:
        check()

    rng = np.random.default_rng(0)
    nb = int(os.environ.get("LAB_NB", 64))
    words, _, _ = _mk_words(rng, nb * BLOCK_SUB)
    tables, _ = _mk_tables(rng)
    wd, td = jax.device_put(words), jax.device_put(tables)

    clock = 0.94e9
    nchunks = nb * BLOCK_SUB // S

    def mk(variant, n):
        tabs = jnp.stack([jnp.roll(td, i, axis=1) for i in range(n)])

        @jax.jit
        def go(tabs):
            def step(c, t):
                r = run(wd, t, variant=variant, nb=nb)
                return c, r[0].max()
            _, outs = jax.lax.scan(step, 0, tabs)
            return outs
        return lambda: np.asarray(go(tabs))

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        list(VARIANTS)
    for name in names:
        s_short, s_long = mk(name, 2), mk(name, 26)
        s_short(); s_long()
        slopes = []
        for _ in range(7):
            t0 = _t(s_short)
            t1 = _t(s_long)
            slopes.append((t1 - t0) / 24.0)
        dt = float(np.median(slopes))
        nnz = nb * BLOCK_SUB * LANES * 2
        cyc_q = dt * clock / nchunks / Q
        pq = nnz / (dt / Q) / 1e9
        print(f"{name:9s} Q={Q:<3d} {dt*1e3:8.3f} ms/group "
              f" {cyc_q:6.2f} cyc/chunk/q  {pq:7.1f} Gnnz/s per query")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
