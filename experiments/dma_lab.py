#!/usr/bin/env python
"""DMA-size probe: can bigger HBM->VMEM blocks beat the 585 GB/s stream
ceiling without exceeding the ~128-chunk unroll limit?

Idea: grid = (num_blocks, T) with BlockSpec index (i, j) -> (i, 0): the
same (BS, 128) block is fetched ONCE per i (Pallas skips the re-DMA when
the block index is unchanged) while each of the T sub-steps processes
BS/T sublanes from a dynamic base = j * (BS/T). Body stays <= 128 chunks.

Usage: python experiments/dma_lab.py [BS T] [BS T] ...
       default sweep: (1024,1) (2048,2) (4096,4) (2048,1 fori)
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
S = 8
NEG_INF = float("-inf")
TOTAL_SUB = 1 << 18      # 256Ki sublanes = 128 MiB stream


def _decode_val(w):
    return pltpu.bitcast(jax.lax.shift_left(w, 16), jnp.float32)


def make_kernel(bs, t):
    half = bs // t

    def kern(tab_ref, words_ref, out_ref, acc):
        i = pl.program_id(0)
        j = pl.program_id(1) if t > 1 else 0

        @pl.when((i == 0) & (j == 0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        base = j * half
        accs = [jnp.zeros((S, LANES), jnp.float32) for _ in range(2)]
        for u in range(half // S):
            w = words_ref[pl.ds(base + u * S, S), :]
            accs[u % 2] = accs[u % 2] + (_decode_val(w) + tab_ref[0:1, :])
        acc[:] = acc[:] + accs[0] + accs[1]

        @pl.when((i == pl.num_programs(0) - 1) & (j == t - 1))
        def _():
            out_ref[:] = acc[:]

    return kern


@functools.partial(jax.jit, static_argnames=("bs", "t"))
def run(words, table, *, bs, t):
    nb = TOTAL_SUB // bs
    kern = make_kernel(bs, t)
    grid = (nb, t) if t > 1 else (nb, 1)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANES), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, LANES), jnp.float32)],
    )(table, words)


def main():
    rng = np.random.default_rng(0)
    words = jax.device_put(
        rng.integers(0, 2**31 - 1, size=(TOTAL_SUB, LANES),
                     dtype=np.int64).astype(np.int32))
    table = jax.device_put(np.ones((1, LANES), np.float32))

    cases = []
    args = sys.argv[1:]
    if args:
        for a in range(0, len(args), 2):
            cases.append((int(args[a]), int(args[a + 1])))
    else:
        cases = [(1024, 1), (2048, 2), (4096, 4), (8192, 8)]

    clock = 0.94e9
    gbytes = TOTAL_SUB * LANES * 4 / 1e9
    print("BS      T     ms     GB/s   cyc/chunk")
    for bs, t in cases:
        def fn(tab, bs=bs, t=t):
            return run(words, tab, bs=bs, t=t)

        def mk(n):
            tabs = jnp.stack([table + i for i in range(n)])

            @jax.jit
            def go(tabs):
                def step(c, tb):
                    return c, fn(tb).max()
                _, outs = jax.lax.scan(step, 0, tabs)
                return outs
            return lambda: np.asarray(go(tabs))

        s, l = mk(2), mk(22)
        s(); l()
        dts = sorted(((_t(l) - _t(s)) / 20.0) for _ in range(5))
        dt = dts[len(dts) // 2]
        nchunks = TOTAL_SUB // S
        print(f"{bs:6d} {t:2d} {dt*1e3:8.3f} {gbytes/dt:8.1f}"
              f" {dt*clock/nchunks:8.2f}")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
