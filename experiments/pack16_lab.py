#!/usr/bin/env python
"""Does 16-bit packed arithmetic run 2x on this chip's VPU?

Times a compute-saturated Pallas kernel (tiny input, many ops) doing N
elementwise mul+add chains on (8, 128) f32 vs (16, 128) bf16 vs
(16, 128) int16 tiles. If bf16/int16 chains at double the element count
run in the same wall time as f32, the VPU packs 16-bit ops 2x and a
16-bit-element BSCSR stream layout could halve decode cost.
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
REPS = 512          # mul+add pairs per grid step
GRID = 512


def make_kernel(dtype, sub):
    def kern(x_ref, out_ref):
        x = x_ref[:]
        acc = x
        for _ in range(REPS):
            acc = acc * x + x
        out_ref[:] = acc

    return kern


@functools.partial(jax.jit, static_argnames=("dtype", "sub"))
def run(x, *, dtype, sub):
    return pl.pallas_call(
        make_kernel(dtype, sub),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((sub, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((sub, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sub, LANES), dtype),
    )(x)


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("f32 (8,128)", jnp.float32, 8),
        ("f32 (16,128)", jnp.float32, 16),
        ("bf16 (16,128)", jnp.bfloat16, 16),
        ("bf16 (32,128)", jnp.bfloat16, 32),
        ("int16 (16,128)", jnp.int16, 16),
        ("int32 (8,128)", jnp.int32, 8),
    ]
    clock = 0.94e9
    print(f"{REPS} mul+add pairs x {GRID} grid steps")
    for name, dtype, sub in cases:
        if dtype in (jnp.int16, jnp.int32):
            x = jnp.asarray(rng.integers(1, 3, (sub, LANES)), dtype)
        else:
            x = jnp.asarray(rng.standard_normal((sub, LANES)) * 1e-3, dtype)

        def fn(xx, dtype=dtype, sub=sub):
            return run(xx, dtype=dtype, sub=sub)

        def mk(n):
            xs = jnp.stack([x + i for i in range(n)])

            @jax.jit
            def go(xs):
                def step(c, xx):
                    return c, fn(xx).astype(jnp.float32).max()
                return jax.lax.scan(step, 0, xs)[1]
            return lambda: np.asarray(go(xs))

        s, l = mk(2), mk(12)
        s(); l()
        dts = sorted(((_t(l) - _t(s)) / 10.0) for _ in range(5))
        dt = dts[len(dts) // 2]
        ops = 2 * REPS * GRID          # vector ops issued
        elems = sub * LANES * ops      # element-ops
        print(f"{name:16s} {dt*1e3:8.3f} ms  {dt*clock/ops:6.2f} cyc/op"
              f"  {elems/dt/1e12:7.2f} Telem-op/s")


def _t(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
