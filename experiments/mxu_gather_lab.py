"""Can the MXU serve the BATCHED query gather? (VERDICT r3 #1) — NO, measured.

The question: with Q queries live, each matrix chunk's per-query work is
a lane gather + extract + multiply (VPU). Could one matmul on the MXU
serve all Q queries per chunk instead?

THE ARITHMETIC REFUTATION (confirmed by measurement below): an MXU
formulation must contract over the COLUMN axis, so each nnz costs C
MACs per query (its one-hot row is C wide, C-1 of them zero) instead of
the VPU's ~9/2048 vector-op-equivalents. The MXU's raw-MAC advantage
over the VPU (~8x at f32) cannot beat a C = 1024x waste factor.

MEASURED on the v5e (slope-timed chained scans, 2026-08-20, Q=16):
  - MXU one-hot formulation (best case: XLA fuses the one-hot
    construction into the dot, f32): 23.2 Gnnz/s/query-equivalent —
    and that encodes only ONE h16 half per word, so per real nnz it is
    ~11.6. Asymptotic ceiling independent of Q: ~2e13 MAC/s / 1024
    MACs-per-nnz-per-query ~= 19.5 Gnnz/s/query.
  - The production VPU batch kernel measures 236-258 Gnnz/s/query at
    groups 32-64 (bench.py / RESULTS c9): the MXU formulation is
    >10x slower at its own best case. (This lab's VPU microprobe
    prints ~11 Gnnz/s/query-equiv, but at 32 chunks per launch it is
    kernel-launch-bound — the production kernel amortizes launches
    over ~900-block grids; use the bench number for the comparison.)
  - The in-Pallas version of the one-hot does not even lower: Mosaic
    rejects the (8,128)->(1024,1) shape cast needed to put elements on
    a matmul axis ("infer-vector-layout: unsupported shape cast").

Two other MXU formulations, refuted without measurement:
  (b) one-hot stored in HBM = the DENSE engine (ops/dense.py), already
      shipped: int8 per-row-scale rows swept at element cadence — 747
      Gnnz-equiv/s/query at batch 64, 2605 at 256 (BENCH_r03). That IS
      the correct "MXU for batch" answer when the int8 form fits HBM
      (capacity.py plans the crossover); the sparse stream's gather
      stays on the VPU.
  (c) per-slice densified histogram built in-kernel then h @ Q^T:
      the scatter that builds h costs the same per element as the
      gather it replaces, plus (128, C) f32 VMEM traffic per slice.

Run: python experiments/mxu_gather_lab.py [Q]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
S = 8
C = 1024
REPS = 32  # chunks per kernel launch (VMEM-bounded unroll)


def vpu_kernel(tab_ref, words_ref, out_ref, *, Q):
    from spmv_topk_tpu.ops.kernel import _h16_apply, _h16_shared

    acc = [jnp.zeros((S, LANES), jnp.int32) for _ in range(Q)]
    for r in range(REPS):
        w = words_ref[r * S:(r + 1) * S, :]
        sh = _h16_shared(w, False)
        for q in range(Q):
            bc = jnp.broadcast_to(tab_ref[q:q + 1, :], (S, LANES))
            acc[q] = acc[q] + _h16_apply([bc], sh)
    out = jnp.stack([jnp.sum(a, axis=0) for a in acc]).astype(jnp.float32)
    out_ref[...] = out


def mxu_xla_fn(Q):
    """Formulation (a) as plain XLA (the in-Pallas version is not even
    lowerable: Mosaic rejects the (8,128)->(1024,1) shape cast needed to
    put elements on a matmul axis — "infer-vector-layout: unsupported
    shape cast"). XLA materializes the one-hot and feeds the MXU dot;
    this measures construction + matmul honestly."""

    @jax.jit
    def go(words, tabq):
        col = (words & 0x3FF).reshape(-1)              # (REPS*S*128,)
        val = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(words, 16), 26).astype(jnp.float32)
        iota = jnp.arange(C, dtype=jnp.int32)
        oh = jnp.where(col[:, None] == iota[None, :],
                       val.reshape(-1)[:, None], 0.0)   # (N, C) f32
        return jnp.dot(oh, tabq,
                       preferred_element_type=jnp.float32)  # (N, Q)

    return go


def run(Q=16):
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**31 - 1, (REPS * S, LANES),
                         dtype=np.int64).astype(np.int32)
    tab = rng.integers(-(2**31), 2**31 - 1, (Q, LANES),
                       dtype=np.int64).astype(np.int32)
    tabq = rng.standard_normal((C, Q)).astype(np.float32)

    vk = pl.pallas_call(
        lambda t, w, o: vpu_kernel(t, w, o, Q=Q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, LANES), jnp.float32))
    jm_fn = mxu_xla_fn(Q)

    def scanned_v(n):
        salts = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def go(tab, words, salts):
            def step(c, s):
                out = vk(tab, words + s)
                return c, out.max()
            return jax.lax.scan(step, 0, salts)[1]

        return lambda: np.asarray(go(jnp.asarray(tab), jnp.asarray(words),
                                     salts))

    def scanned_m(n):
        salts = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def go(words, tabq, salts):
            def step(c, s):
                out = jm_fn(words + s, tabq)
                return c, out.max()
            return jax.lax.scan(step, 0, salts)[1]

        return lambda: np.asarray(go(jnp.asarray(words), jnp.asarray(tabq),
                                     salts))

    def slope(mk_fn, short=8, long_=104):
        fs, fl = mk_fn(short), mk_fn(long_)
        fs(); fl()
        reps = sorted((_t(fl) - _t(fs)) / (long_ - short) for _ in range(5))
        return reps[len(reps) // 2]

    def _t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    tv = slope(scanned_v)
    tm = slope(scanned_m)
    nnz = REPS * S * LANES * 2
    print(f"Q={Q} chunks={REPS} (slope-timed, chained on-device scans)")
    print(f"  VPU gather path : {tv * 1e6:9.1f} us/iter "
          f"({nnz * Q / tv / 1e9:8.1f} Gnnz/s/query-equiv)")
    print(f"  MXU one-hot path: {tm * 1e6:9.1f} us/iter "
          f"({nnz * Q / tm / 1e9:8.1f} Gnnz/s/query-equiv)")
    print(f"  ratio: MXU one-hot is {tm / tv:.1f}x the VPU gather cost")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
