#!/usr/bin/env python
"""h16 decode-variant micro-lab: cycles/chunk for the 2-nnz/word codec.

The fused h16 kernel is compute-bound (~7.4-9.1 cyc/chunk vs the 4.4-4.9
pure-stream floor, see memory notes); this lab bisects the decode chain:

  cur      : production _prod_h16 (xor-trick nibble sign extension,
             f32 accumulate, masked i0)
  nsh      : complement-shift nibble extraction — sh' = (~w>>s)&28 then
             (g << sh') >> 28 arithmetic (shares one ~w, drops the
             &0xF/xor/sub chain)
  int      : int32 accumulation, ONE f32 convert per slice at the fold
  nsh_int  : both
  nsh_int_raw : + raw gather indices (i0 = w, i1 = w>>16 with no &0x7F —
             relies on the TPU lane gather using only the low 7 bits even
             for negative int32 indices; verified by the correctness check)
  stream   : no decode at all (DMA floor on the same data)

Usage: python experiments/h16_lab.py [--check]
  --check  first run every variant on a tiny instance vs a NumPy oracle
           (hardware semantics of raw negative gather indices).
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

import os
LANES = 128
S = 8
W = int(os.environ.get("LAB_W", 16))     # sublanes per slice (h16: deg/2/128 words)
SPB = int(os.environ.get("LAB_SPB", 32))
BLOCK_SUB = W * SPB
LANE_K = 8
NEG_INF = float("-inf")


def _topk_update_fast(tv, tt, score, slice_idx):
    cur = tv[:]
    cur_min = jnp.min(cur, axis=0, keepdims=True)
    replace = (cur == cur_min) & (score >= cur_min)
    tv[:] = jnp.where(replace, score, cur)
    tt[:] = jnp.where(replace, slice_idx, tt[:])


# ------------------------------------------------------------- decode bodies
# each returns the per-chunk contribution; `acc_int` marks int32 accumulation

def body_cur(bc, w):
    h1 = jax.lax.shift_right_logical(w, 16)
    i0 = w & 0x7F
    i1 = h1  # mask_lanes=False on HW
    g0 = jnp.take_along_axis(bc, i0, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    sh0 = jax.lax.shift_right_logical(w, 5) & 28
    sh1 = jax.lax.shift_right_logical(w, 21) & 28
    n0 = ((jax.lax.shift_right_logical(g0, sh0) & 0xF) ^ 8) - 8
    n1 = ((jax.lax.shift_right_logical(g1, sh1) & 0xF) ^ 8) - 8
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return (v0 * n0 + v1 * n1).astype(jnp.float32)


def _body_nsh(bc, w, raw_idx):
    nw = ~w
    i0 = w if raw_idx else (w & 0x7F)
    i1 = jax.lax.shift_right_logical(w, 16)
    if not raw_idx:
        i1 = i1  # already non-negative; low bits index the lane
    g0 = jnp.take_along_axis(bc, i0, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    sh0 = jax.lax.shift_right_logical(nw, 5) & 28   # 28 - 4*(col0>>7)
    sh1 = jax.lax.shift_right_logical(nw, 21) & 28
    n0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g0, sh0), 28)
    n1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g1, sh1), 28)
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return v0 * n0 + v1 * n1  # int32


def body_nsh(bc, w):
    return _body_nsh(bc, w, raw_idx=False).astype(jnp.float32)


def body_int(bc, w):
    h1 = jax.lax.shift_right_logical(w, 16)
    i0 = w & 0x7F
    g0 = jnp.take_along_axis(bc, i0, axis=1)
    g1 = jnp.take_along_axis(bc, h1, axis=1)
    sh0 = jax.lax.shift_right_logical(w, 5) & 28
    sh1 = jax.lax.shift_right_logical(w, 21) & 28
    n0 = ((jax.lax.shift_right_logical(g0, sh0) & 0xF) ^ 8) - 8
    n1 = ((jax.lax.shift_right_logical(g1, sh1) & 0xF) ^ 8) - 8
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return v0 * n0 + v1 * n1  # int32


def body_nsh_int(bc, w):
    return _body_nsh(bc, w, raw_idx=False)


def body_nsh_int_raw(bc, w):
    return _body_nsh(bc, w, raw_idx=True)


def body_stream(bc, w):
    return (w + bc).astype(jnp.float32)


def body_v2(bc, w):
    """v2 word layout: col0[0:10) | col1[10:20) | val0[20:26) | val1[26:32)
    with a REVERSED-nibble query table (group g at nibble 7-g), so the
    shift-to-top amount is 4*g = (w >> 5) & 28 directly — no complement.
    Raw gathers: hardware lane gather reads only the low 7 index bits."""
    i1 = jax.lax.shift_right_logical(w, 10)
    g0 = jnp.take_along_axis(bc, w, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    sh0 = jax.lax.shift_right_logical(w, 5) & 28
    sh1 = jax.lax.shift_right_logical(w, 15) & 28
    n0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g0, sh0), 28)
    n1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g1, sh1), 28)
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 6), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return v0 * n0 + v1 * n1


VARIANTS = {
    "cur": (body_cur, False),
    "nsh": (body_nsh, False),
    "int": (body_int, True),
    "nsh_int": (body_nsh_int, True),
    "nsh_int_raw": (body_nsh_int_raw, True),
    "v2": (body_v2, True),
    "stream": (body_stream, False),
}


def _mk_kernel(body, acc_int):
    def kern(tab_ref, words_ref, topv_ref, topt_ref, tv, tt):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            tv[:] = jnp.full_like(tv, NEG_INF)
            tt[:] = jnp.zeros_like(tt)

        shape = (S, LANES)
        bc = jnp.broadcast_to(tab_ref[0:1, :], shape)
        dt = jnp.int32 if acc_int else jnp.float32

        for j in range(SPB):
            n_acc = 2 if W // S >= 2 else 1
            accs = [jnp.zeros((S, LANES), dt) for _ in range(n_acc)]
            for u in range(W // S):
                w = words_ref[pl.ds(j * W + u * S, S), :]
                accs[u % n_acc] = accs[u % n_acc] + body(bc, w)
            acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
            score = jnp.sum(acc, axis=0, keepdims=True)
            if acc_int:
                score = score.astype(jnp.float32)
            t = i * SPB + j
            _topk_update_fast(tv, tt, score, t)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            topv_ref[:] = tv[:]
            topt_ref[:] = tt[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "nb"))
def run(words, table, *, variant, nb):
    body, acc_int = VARIANTS[variant]
    return pl.pallas_call(
        _mk_kernel(body, acc_int),
        grid=(nb,),
        in_specs=[
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
        ],
    )(table, words)


def _mk_words(rng, n_sub):
    """Random h16 words: col10|val6 per 16-bit half."""
    col = rng.integers(0, 1024, size=(n_sub, LANES, 2), dtype=np.int64)
    val = rng.integers(-32, 32, size=(n_sub, LANES, 2), dtype=np.int64)
    half = (col | ((val & 0x3F) << 10)).astype(np.uint64)
    w = (half[..., 0] | (half[..., 1] << 16)).astype(np.uint32)
    return w.view(np.int32), col, val


def _mk_table(rng):
    """int4x8 query table: one (1, 128) int32 row, 8 nibbles per lane."""
    q = rng.integers(-8, 8, size=(8, LANES), dtype=np.int64)  # q[g, lane]
    tab = np.zeros((1, LANES), np.uint64)
    for g in range(8):
        tab[0] |= ((q[g] & 0xF).astype(np.uint64)) << (4 * g)
    return tab.astype(np.uint32).view(np.int32), q


def check():
    """Tiny-instance oracle: per-slice integer scores vs NumPy."""
    rng = np.random.default_rng(7)
    nb, spb, w_ = 2, 4, W
    n_sub = nb * w_ * spb
    words, col, val = _mk_words(rng, n_sub)
    table, q = _mk_table(rng)

    # NumPy oracle: score[slice, lane] = sum over words of the slice
    qv = q  # (8, 128): group g covers columns g*128 + lane
    contrib = np.zeros((n_sub, LANES), np.int64)
    for h in range(2):
        lane = col[..., h] & 127
        grp = col[..., h] >> 7
        contrib += val[..., h] * qv[grp, lane]
    scores = contrib.reshape(nb * spb, w_, LANES).sum(axis=1)

    wd = jax.device_put(words)
    td = jax.device_put(table)
    global SPB, BLOCK_SUB
    spb_save, bs_save = SPB, BLOCK_SUB
    SPB, BLOCK_SUB = spb, w_ * spb
    try:
        for name in VARIANTS:
            if name in ("stream", "v2"):  # v2 needs v2-layout words; the
                continue                  # lab times it on v1 data (same
                                          # op mix), oracle in test_h16
            tv, tt = run(wd, td, variant=name, nb=nb)
            tv, tt = np.asarray(tv), np.asarray(tt)
            # reconstruct: best score per lane must equal oracle max
            got = np.full(LANES, -np.inf)
            for kslot in range(LANE_K):
                got = np.maximum(got, tv[kslot])
            want = scores.max(axis=0).astype(np.float64)
            ok = np.allclose(got, want)
            print(f"  check {name:12s} {'OK' if ok else 'MISMATCH'}")
            if not ok:
                bad = np.where(got != want)[0][:4]
                print("   lanes", bad, "got", got[bad], "want", want[bad])
    finally:
        SPB, BLOCK_SUB = spb_save, bs_save


def main():
    do_check = "--check" in sys.argv
    if do_check:
        check()

    rng = np.random.default_rng(0)
    nb = int(os.environ.get("LAB_NB", 256))
    words, _, _ = _mk_words(rng, nb * BLOCK_SUB)
    table, _ = _mk_table(rng)
    wd = jax.device_put(words)
    td = jax.device_put(table)

    clock = 0.94e9
    nchunks_per = BLOCK_SUB // S

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
        s_short, s_long = mk(name, 4), mk(name, 104)
        s_short(); s_long()
        # median of interleaved slope pairs (see memory: tunnel jitter)
        slopes = []
        for _ in range(7):
            t0 = _t(s_short)
            t1 = _t(s_long)
            slopes.append((t1 - t0) / 100.0)
        dt = float(np.median(slopes))
        nnz = nb * BLOCK_SUB * LANES * 2          # h16: 2 nnz/word
        cyc = dt * clock / (nb * nchunks_per)
        gbs = nb * BLOCK_SUB * LANES * 4 / dt / 1e9
        print(f"{name:12s} {dt*1e3:8.3f} ms  {cyc:6.2f} cyc/chunk"
              f"  {nnz/dt/1e9:7.1f} Gnnz/s  {gbs:6.1f} GB/s")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
