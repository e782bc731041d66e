#!/usr/bin/env python
"""Probe: does Mosaic run 16-bit integer vector ops at 2x lane density?

The h16 decode is VPU-bound at ~8.8-9.5 cyc per (8,128)-int32 chunk
(experiments/h16_lab.py). If int16 ops on (16,128) tiles execute at one
op per cycle over 2048 elements (2x the int32 density), a pure-int16
codec (one nnz per halfword: col10|val6) would halve cycles/byte and
approach the stream floor. If Mosaic promotes int16 to int32 internally,
the probe shows parity (or worse) and the idea is dead.

Probes (slope-timed over a 304-iteration scan like bench.py):
  s32 : int32 ALU chain   — (8,128) tiles, shift+and+add per tile
  s16 : int16 ALU chain   — (16,128) tiles, same ops
  g32 : + lane gather     — take_along_axis per (8,128) tile
  g16 : + lane gather     — take_along_axis per (16,128) int16 tile
  g16x: + lane gather     — int16 values, indices widened to int32

Usage: python experiments/i16_probe.py
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

LANES = 128
SUB32 = 1024                 # (1024,128) i32 per block = 512 KB
NB = 256                     # blocks per pass = 128 MB
CLOCK = 940e6                # v5e core clock (approx, for cyc/chunk)


def _mk_kernel(bits, gather, widen_idx=False):
    S = 8 if bits == 32 else 16
    dt = jnp.int32 if bits == 32 else jnp.int16

    def kern(salt_ref, tab_ref, words_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.broadcast_to(salt_ref[0:1, :], acc.shape)

        sub = words_ref.shape[0]
        bc = tab_ref[:]
        c3 = jnp.array(3, dt)
        c127 = jnp.array(0x7F, dt)
        accs = [jnp.zeros((S, LANES), dt) for _ in range(2)]
        for u in range(sub // S):
            w = words_ref[pl.ds(u * S, S), :]
            if gather:
                idx = w & c127
                if widen_idx:
                    idx = idx.astype(jnp.int32)
                t = jnp.take_along_axis(bc, idx, axis=1)
            else:
                t = jax.lax.shift_right_logical(w, c3) & c127
            accs[u % 2] = accs[u % 2] + t
        acc[:] = acc[:] + accs[0] + accs[1]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return kern, S, dt


def build(variant, words, table, nb):
    bits = 32 if "32" in variant else 16
    gather = variant.startswith("g")
    kern, S, dt = _mk_kernel(bits, gather, widen_idx=variant == "g16x")
    sub = SUB32 if bits == 32 else SUB32 * 2

    call = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, LANES), dt),
        scratch_shapes=[pltpu.VMEM((S, LANES), dt)],
    )

    def stream(n_iters):
        salts = jnp.arange(n_iters * LANES, dtype=dt).reshape(
            n_iters, 1, LANES)

        @jax.jit
        def go(words, table, salts):
            def step(c, s):
                out = call(s, table, words)
                return c, out.max()
            _, outs = jax.lax.scan(step, 0, salts)
            return outs

        return lambda: np.asarray(go(words, table, salts))

    return stream


def main():
    rng = np.random.default_rng(0)
    w32 = jnp.asarray(rng.integers(0, 1 << 20, size=(NB * SUB32, LANES),
                                   dtype=np.int32))
    w16 = jnp.asarray(rng.integers(0, 1 << 14, size=(NB * SUB32 * 2, LANES),
                                   dtype=np.int16))
    t32 = jnp.asarray(rng.integers(-8, 8, size=(8, LANES), dtype=np.int32))
    t16 = jnp.asarray(rng.integers(-8, 8, size=(16, LANES), dtype=np.int16))

    bytes_per_pass = NB * SUB32 * LANES * 4
    n_chunks = NB * SUB32 // 8          # 4KB chunk count per pass

    for variant in ("s32", "s16", "g32", "g16", "g16x"):
        words = w32 if "32" in variant else w16
        table = t32 if "32" in variant else t16
        try:
            stream = build(variant, words, table, NB)
            short, long_ = stream(4), stream(104)
            short(); long_()
        except Exception as e:  # noqa: BLE001 — report lowering failures
            print(f"{variant:4s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            continue

        def timed(fn):
            t = time.perf_counter()
            fn()
            return time.perf_counter() - t

        reps = []
        for _ in range(5):
            a, b = timed(short), timed(long_)
            reps.append((b - a) / 100.0)
        dt = float(np.median(reps))
        gbps = bytes_per_pass / dt / 1e9
        cyc = dt * CLOCK / n_chunks
        print(f"{variant:4s} {dt*1e3:8.3f} ms/pass  {gbps:7.1f} GB/s  "
              f"{cyc:6.2f} cyc/4KB-chunk", flush=True)


if __name__ == "__main__":
    main()
