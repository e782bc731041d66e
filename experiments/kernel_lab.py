#!/usr/bin/env python
"""Kernel micro-lab: cycles/chunk for Top-K SpMV inner-loop variants.

Times one big uniform-W bucket with different gather/decode codecs to find
the VPU op floor, plus a stream-only variant for the HBM/DMA ceiling.
Slope timing between two block counts cancels dispatch overhead.

Usage: python experiments/kernel_lab.py [variant ...]
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
S = int(os.environ.get("LAB_S", 8))    # chunk sublanes
W = int(os.environ.get("LAB_W", 32))   # slice width (sublanes per slice)
SPB = int(os.environ.get("LAB_SPB", 16))  # slices per block
BLOCK_SUB = W * SPB
LANE_K = 8
NEG_INF = float("-inf")


def _decode_val(w):
    return pltpu.bitcast(jax.lax.shift_left(w, 16), jnp.float32)


FOLD = os.environ.get("LAB_FOLD", "exact")


def _topk_update(tv, tt, score, slice_idx):
    cur = tv[:]
    cur_min = jnp.min(cur, axis=0, keepdims=True)
    if FOLD == "fast":
        replace = (cur == cur_min) & (score >= cur_min)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (LANE_K, LANES), 0)
        slot = jnp.min(jnp.where(cur == cur_min, iota, LANE_K), axis=0,
                       keepdims=True)
        replace = (iota == slot) & (score >= cur_min)
    tv[:] = jnp.where(replace, score, cur)
    tt[:] = jnp.where(replace, slice_idx, tt[:])


# ---------------------------------------------------------------- variants

def body_stream(tab_ref, w, bcs):
    """No gather at all: HBM/decode ceiling (+1 add for tab dependence so
    iterations cannot be CSE'd)."""
    return _decode_val(w) + bcs[0]


def body_f32(tab_ref, w, bcs):
    """Current f32 codec: 8 takes + 7 cmp/sel for 1024 cols."""
    lo = jax.lax.shift_right_logical(w, 16)
    hi = jax.lax.shift_right_logical(w, 23)
    sel = None
    for c, bc in enumerate(bcs[:8]):
        g = jnp.take_along_axis(bc, lo, axis=1)
        sel = g if sel is None else jnp.where(hi == c, g, sel)
    return _decode_val(w) * sel


def body_int8(tab_ref, w, bcs):
    """Current int8x4 codec (2 takes, byte extract)."""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    hi9 = jax.lax.shift_right_logical(w, 25)
    sel = jnp.where(hi9 == 1, g1, g0)
    sh = jax.lax.shift_right_logical(w, 20) & 24
    byte = jax.lax.shift_right_logical(sel, sh) & 0xFF
    vec = (byte - 128).astype(jnp.float32)
    return _decode_val(w) * vec


def body_int8_sign(tab_ref, w, bcs):
    """int8x4 with pass bit moved to the sign bit at pack time and
    precomputed shift bits: word = lane(7)@[16:23) shift(2)@[27:29) pass@31.
    (Simulated here — indices are random anyway; measures op cost.)"""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    sel = jnp.where(w < 0, g1, g0)
    sh = jax.lax.shift_right_logical(w, 24) & 24
    byte = jax.lax.shift_right_logical(sel, sh) & 0xFF
    vec = (byte - 128).astype(jnp.float32)
    return _decode_val(w) * vec


def body_int8_fbits(tab_ref, w, bcs):
    """int8x4 + float-bit conversion trick: byte|0x4B000000 bitcast - C."""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    sel = jnp.where(w < 0, g1, g0)
    sh = jax.lax.shift_right_logical(w, 24) & 24
    byte = jax.lax.shift_right_logical(sel, sh) & 0xFF
    f = pltpu.bitcast(byte | 0x4B000000, jnp.float32) - (8388608.0 + 128.0)
    return _decode_val(w) * f


def body_int4(tab_ref, w, bcs):
    """int4x8 codec: whole 1024-col table in ONE row; 1 take, nibble extract."""
    lo = jax.lax.shift_right_logical(w, 16)
    sel = jnp.take_along_axis(bcs[0], lo, axis=1)
    sh = jax.lax.shift_right_logical(w, 21) & 28
    nib = jax.lax.shift_right_logical(sel, sh) & 0xF
    vec = (nib - 8).astype(jnp.float32)
    return _decode_val(w) * vec


def body_take1(tab_ref, w, bcs):
    """512-col f32 fast path: single take, no select, no extract."""
    lo = jax.lax.shift_right_logical(w, 16)
    vec = jnp.take_along_axis(bcs[0], lo, axis=1)
    return _decode_val(w) * vec


def body_take2sel(tab_ref, w, bcs):
    """1024-col bf16x2 idea lower bound: 2 takes + 1 select, no extract."""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    vec = jnp.where(w < 0, g1, g0)
    return _decode_val(w) * vec




def body_i8s(tab_ref, w, bcs):
    """Production i8s codec: sign-select + precomputed shift, with mask."""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    sel = jnp.where(w < 0, g1, g0)
    a = jax.lax.shift_right_logical(w, 24) & 31
    q = jax.lax.shift_right_arithmetic(jax.lax.shift_left(sel, a), 24)
    return _decode_val(w) * q.astype(jnp.float32)


def body_i8s_nomask(tab_ref, w, bcs):
    """i8s without the &31 (hardware shift wraps mod 32)."""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    sel = jnp.where(w < 0, g1, g0)
    a = jax.lax.shift_right_logical(w, 24)
    q = jax.lax.shift_right_arithmetic(jax.lax.shift_left(sel, a), 24)
    return _decode_val(w) * q.astype(jnp.float32)


def body_i8s_int(tab_ref, w, bcs):
    """Integer accumulate: uint16 fixed value * int8 query, f32 at fold.
    Returns int32 partial products (caller accumulates as f32 via bitcast
    trick in this lab we just convert at the end -- here we fake by
    returning int32-as-float32-bitcast; the lab accumulates f32 adds which
    costs the same as int32 adds)."""
    lo = jax.lax.shift_right_logical(w, 16)
    g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
    g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
    sel = jnp.where(w < 0, g1, g0)
    a = jax.lax.shift_right_logical(w, 24)
    q = jax.lax.shift_right_arithmetic(jax.lax.shift_left(sel, a), 24)
    val = w & 0xFFFF
    prod = val * q
    return pltpu.bitcast(prod, jnp.float32)


def body_h16(tab_ref, w, bcs):
    """2-nnz-per-word candidate format: each 16-bit half packs
    col[0:10) + val6[10:16); query via the single-row int4x8 table.
    Doubles nnz/byte; measures whether the doubled decode ops hide
    under the DMA floor. (Lab cost model only — indices are random.)"""
    h1 = jax.lax.shift_right_logical(w, 16)
    lo0 = w & 0x7F
    g0 = jnp.take_along_axis(bcs[0], lo0, axis=1)
    g1 = jnp.take_along_axis(bcs[0], h1 & 0x7F, axis=1)
    sh0 = jax.lax.shift_right_logical(w, 5) & 28
    sh1 = jax.lax.shift_right_logical(w, 21) & 28
    n0 = (jax.lax.shift_right_logical(g0, sh0) & 0xF) - 8
    n1 = (jax.lax.shift_right_logical(g1, sh1) & 0xF) - 8
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    p = v0 * n0 + v1 * n1
    return pltpu.bitcast(p, jnp.float32)


VARIANTS = {
    "stream": (body_stream, 1),
    "h16": (body_h16, 1),
    "f32": (body_f32, 8),
    "int8": (body_int8, 2),
    "i8s": (body_i8s, 2),
    "i8s_nomask": (body_i8s_nomask, 2),
    "i8s_int": (body_i8s_int, 2),
    "int8_sign": (body_int8_sign, 2),
    "int8_fbits": (body_int8_fbits, 2),
    "int4": (body_int4, 1),
    "take1": (body_take1, 1),
    "take2sel": (body_take2sel, 2),
}


def make_kernel(body, table_rows):
    G = 4 if FOLD == "top1g4" else 1

    def kern(tab_ref, words_ref, topv_ref, topt_ref, tv, tt):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            tv[:] = jnp.full_like(tv, NEG_INF)
            tt[:] = jnp.zeros_like(tt)

        shape = (S, LANES)
        bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
               for c in range(table_rows)]

        def slice_score(j):
            accs = [jnp.zeros((S, LANES), jnp.float32) for _ in range(2)]
            for u in range(W // S):
                w = words_ref[pl.ds(j * W + u * S, S), :]
                accs[u % 2] = accs[u % 2] + body(tab_ref, w, bcs)
            return jnp.sum(accs[0] + accs[1], axis=0, keepdims=True)

        def do_slice(j):
            _topk_update(tv, tt, slice_score(j), i * SPB + j)

        if G > 1:
            # per-lane top-1 of each G-slice group, one K-fold per group:
            # running (gmax, gidx) costs cmp+2sel per slice vs the full
            # argmin-replace chain; candidate pool narrows to 1 per
            # (lane, group) — the LFR-style approximation, recovered by
            # the rescore pool.
            assert SPB % G == 0
            for g in range(SPB // G):
                gmax = None
                for jj in range(G):
                    j = g * G + jj
                    s = slice_score(j)
                    t = jnp.full((1, LANES), i * SPB + j, jnp.int32)
                    if gmax is None:
                        gmax, gidx = s, t
                    else:
                        take = s > gmax
                        gmax = jnp.where(take, s, gmax)
                        gidx = jnp.where(take, t, gidx)
                _topk_update(tv, tt, gmax, gidx)
        elif SPB * (W // S) <= 128:
            for j in range(SPB):
                do_slice(j)
        else:
            jax.lax.fori_loop(0, SPB, lambda j, c: (do_slice(j), c)[1], 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            topv_ref[:] = tv[:]
            topt_ref[:] = tt[:]

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "num_blocks"))
def run(words, table, *, variant, num_blocks):
    body, table_rows = VARIANTS[variant]
    kern = make_kernel(body, table_rows)
    return pl.pallas_call(
        kern,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
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


def main():
    want = sys.argv[1:] or list(VARIANTS)
    rng = np.random.default_rng(0)

    NB = int(os.environ.get('LAB_NB', 256))  # blocks
    nb_max = NB
    words = rng.integers(0, 2**16, size=(nb_max * BLOCK_SUB, LANES),
                         dtype=np.int64).astype(np.int32)
    # random col bits in [16:26), random sign bit for sign-select variants
    cols = rng.integers(0, 1024, size=words.shape, dtype=np.int64)
    vals = rng.integers(0, 2**16, size=words.shape, dtype=np.int64)
    w64 = (cols << 16) | vals | (rng.integers(0, 2, size=words.shape) << 31)
    words = w64.astype(np.uint32).view(np.int32)
    words_d = jax.device_put(words)
    table = jax.device_put(
        rng.standard_normal((8, LANES)).astype(np.float32))
    table_i = jax.device_put(
        rng.integers(-2**31, 2**31 - 1, size=(8, LANES),
                     dtype=np.int64).astype(np.int32))

    clock_ghz = 0.94  # v5e nominal

    print(f"{'variant':12s} {'ms(big-small)':>14s} {'cyc/chunk':>10s} "
          f"{'Gnnz/s':>8s} {'GB/s':>7s}")
    for v in want:
        _, tr = VARIANTS[v]
        if v in ("stream", "f32", "take1", "take2sel"):
            tab = table[:tr]
        else:  # int codecs gather from an int32 table
            tab = table_i[:tr]
        def make_stream(n_iter, v=v, tab=tab):
            # scan over n_iter distinct tables so XLA cannot hoist the
            # (pure) kernel call out of the loop
            tabs = jnp.stack([jnp.roll(tab, i, axis=1)
                              for i in range(n_iter)])

            @jax.jit
            def go(ws, tabs):
                def step(c, t):
                    r = run(ws, t, variant=v, num_blocks=NB)
                    return c, r[0].max()
                _, outs = jax.lax.scan(step, 0, tabs)
                return outs
            return lambda: np.asarray(go(words_d, tabs))
        short, long_ = make_stream(4), make_stream(104)
        short(); long_()  # compile + warm
        ts = min(_t(short) for _ in range(5))
        tl = min(_t(long_) for _ in range(5))
        dt = (tl - ts) / 100.0
        nchunks = NB * (BLOCK_SUB // S)
        cyc = dt * clock_ghz * 1e9 / nchunks
        nnz = NB * BLOCK_SUB * LANES
        gnnz = nnz / dt / 1e9
        gbps = nnz * 4 / dt / 1e9
        print(f"{v:12s} {dt*1e3:14.3f} {cyc:10.2f} {gnnz:8.1f} {gbps:7.1f}")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
