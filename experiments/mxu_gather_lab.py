"""Can the MXU serve the BATCHED query gather? (VERDICT r3 #1)

The question: with Q queries live, each matrix chunk's per-query work is
a lane gather + extract + multiply (VPU). Could one matmul on the MXU
serve all Q queries per chunk instead?

Arithmetic first (h16 codec, one (8,128) int32 chunk = 1024 words =
2048 nnz, C = 1024 columns):

  VPU path (shipped, ops/kernel.py::_h16_apply): per query
      2 gathers + 2x(shl+sar) + 2 mul + 1 add = 9 vector ops
      -> 9 Q ops/chunk, ~4.4e-3 Q ops/nnz. At 8x128x(2 ALUs) per cycle
      this is the measured ~385 Gnnz/s/query batch envelope
      (ROOFLINE.md §3).

  MXU path: score[row, q] += val_e * Q[q, col_e] is a matmul ONLY
  against a densified operand. Two formulations, both refuted:

  (a) one-hot on the fly: build O[e, c] = (col_e == c) for the chunk,
      then (O * val) @ Q^T. Building O costs one compare per (element,
      column-group lane) = C/128 x 2048 = 16,384 vector compares per
      chunk — ~1,800x the 9-op gather chain it replaces. The matmul
      itself is free by comparison (2048 x 1024 x Q MACs on 16k
      MAC/cycle MXU). Construction dominates: REFUTED by op count
      (no measurement needed at 3 orders of magnitude; confirmed by a
      64-row microprobe: see below).

  (b) one-hot stored in HBM: precompute the densified rows. That IS the
      dense engine (ops/dense.py): int8 per-row-scale rows at C bytes/row
      vs h16's ~2 bytes/nnz — for deg-20/1024-col corpora 25.6x the HBM
      bytes per row, but the MXU sweeps it at element cadence, not byte
      cadence. SHIPPED and measured: 747 Gnnz-equiv/s/query at batch 64,
      2605 at batch 256 (BENCH_r03) — already 2-7x above the sparse
      batch envelope. So "MXU for batched gather" resolves to: use the
      dense int8 engine when the int8 form fits HBM (the capacity
      planner's crossover, bench/capacity.py); the sparse stream's
      batched gather stays on the VPU.

  (c) per-slice densified histogram h[row, c] built in-kernel, then
      h @ Q^T: building h is a SCATTER (the dual of the gather, same
      per-element cost) plus (128, C) f32 VMEM traffic per slice —
      strictly worse than (a).

Microprobe (run on the v5e to attach a cycle count to (a)): times one
pallas kernel that one-hot-encodes a (8, 128) index chunk against 1024
columns and dots it with a (1024, Q) table, vs the shipped h16 apply
loop at the same Q. Expected (and measured — see ROOFLINE.md §3 round-4
note): construction-bound, >100x slower per chunk.

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
REPS = 256  # chunks per kernel launch (amortize dispatch)


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


def mxu_kernel(tabq_ref, words_ref, out_ref, *, Q):
    # one-hot formulation (a): encode cols of each chunk against C
    # columns, matmul with the (C, Q) query matrix on the MXU.
    acc = jnp.zeros((LANES, Q), jnp.float32)
    for r in range(REPS):
        w = words_ref[r * S:(r + 1) * S, :]
        col = w & 0x3FF                       # low half's column
        val = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, 16), 26).astype(jnp.float32)
        # build the (S*LANES, C) one-hot row-block in C/LANES passes
        oh = []
        colf = col.reshape(S * LANES, 1)
        for g in range(C // LANES):
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (S * LANES, LANES), 1) + g * LANES
            oh.append(jnp.where(colf == iota,
                                val.reshape(S * LANES, 1), 0.0))
        ohm = jnp.concatenate(oh, axis=1)      # (1024, 1024) f32
        part = jnp.dot(ohm, tabq_ref[...],
                       preferred_element_type=jnp.float32)  # (1024, Q)
        acc = acc + part.reshape(S, LANES, Q).sum(0)
    out_ref[...] = acc


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
    mk = pl.pallas_call(
        lambda t, w, o: mxu_kernel(t, w, o, Q=Q),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, Q), jnp.float32))

    def timeit(f, *a):
        f(*a).block_until_ready()
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            f(*a).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    jv = jax.jit(lambda t, w: vk(t, w))
    jm = jax.jit(lambda t, w: mk(t, w))
    tv = timeit(jv, jnp.asarray(tab), jnp.asarray(words))
    tm = timeit(jm, jnp.asarray(tabq), jnp.asarray(words))
    nnz = REPS * S * LANES * 2
    print(f"Q={Q} chunks={REPS}")
    print(f"  VPU gather path : {tv * 1e6:9.1f} us "
          f"({nnz * Q / tv / 1e9:8.1f} Gnnz/s/query-equiv)")
    print(f"  MXU one-hot path: {tm * 1e6:9.1f} us "
          f"({nnz * Q / tm / 1e9:8.1f} Gnnz/s/query-equiv)")
    print(f"  ratio: one-hot construction is {tm / tv:.1f}x slower")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
