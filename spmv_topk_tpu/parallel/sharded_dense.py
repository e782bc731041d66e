"""Row-sharded dense-MXU batch engine.

The dense engine (ops/dense.py) sharded over a device mesh: each device
holds a contiguous row block of the dense bf16 corpus, runs the blocked
matmul sweep + approx_max_k locally, and the (Q, k) candidate pairs are
all_gather-merged exactly like the sparse sharded engine — the same
communication pattern as the reference's host merge over 32 partitions
(host_spmv_bscsr.cpp:399-448), moved onto ICI.

Scales serving corpora past one chip's HBM: D chips hold D x the dense
capacity and the sweep time stays constant (each chip reads only its
shard), so aggregate queries/sec scales linearly with D.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import TopKSpMVConfig, DEFAULT_CONFIG
from ..formats.coo import CooMatrix
from ..ops.dense import densify_bf16, densify_int8, dense_topk_batch
from .mesh import AXIS, make_mesh


class ShardedDenseTopKSpMV:
    """Multi-device dense-MXU Top-K engine (bf16, or int8 per-row-scale
    quantized — halves per-chip HBM, same sweep cadence)."""

    def __init__(self, matrix: CooMatrix,
                 config: TopKSpMVConfig = DEFAULT_CONFIG,
                 mesh: Optional[Mesh] = None,
                 block_rows: int = 1 << 17,
                 recall_target: float = 0.98,
                 dtype: str = "bf16"):
        if dtype not in ("bf16", "int8"):
            raise ValueError(f"dtype must be 'bf16' or 'int8', got {dtype!r}")
        self.mesh = mesh or make_mesh()
        D = self.mesh.devices.size
        self.config = config
        self.dtype = dtype
        self.num_rows = matrix.num_rows
        self.num_cols = matrix.num_cols
        self.num_nnz = matrix.nnz
        self.recall_target = recall_target

        if not matrix.is_sorted_row_major():
            matrix = matrix.sort_row_major()

        self._scipy_csr = (matrix.to_scipy_csr() if config.rescore_pool
                           else None)

        rows_per_shard = -(-matrix.num_rows // D)
        # block_rows must tile the shard exactly (zero rows pad the tail)
        self.block_rows = min(block_rows, rows_per_shard)
        pad_shard = -(-rows_per_shard // self.block_rows) * self.block_rows

        int8_mode = dtype == "int8"
        bits = np.zeros((D, pad_shard, matrix.num_cols),
                        np.int8 if int8_mode else np.uint16)
        scales = np.ones((D, pad_shard), np.float32)
        nrows = np.zeros((D,), np.int32)
        for d in range(D):
            lo = d * rows_per_shard
            hi = min(lo + rows_per_shard, matrix.num_rows)
            if lo >= hi:
                continue
            local = matrix.row_slice(lo, hi)
            if int8_mode:
                bits[d, : hi - lo], scales[d, : hi - lo] = densify_int8(local)
            else:
                bits[d, : hi - lo] = densify_bf16(local)
            nrows[d] = hi - lo
        self._row0 = np.arange(D, dtype=np.int32) * rows_per_shard
        self._nrows = nrows

        spec = jax.sharding.NamedSharding(self.mesh, P(AXIS))
        bits_d = jax.device_put(bits, spec)
        if int8_mode:
            self._A = bits_d
            self._scales_d = jax.device_put(scales, spec)
        else:
            cast = shard_map(
                lambda b: jax.lax.bitcast_convert_type(b, jnp.bfloat16)
                if jax.devices()[0].platform == "tpu"
                else jax.lax.bitcast_convert_type(b, jnp.bfloat16).astype(
                    jnp.float32),
                mesh=self.mesh, in_specs=P(AXIS), out_specs=P(AXIS))
            self._A = jax.jit(cast)(bits_d)
            # tiny placeholder so the sharded call signature is uniform
            self._scales_d = jax.device_put(
                np.zeros((D, 1), np.float32), spec)
        meta = np.stack([self._row0, nrows], axis=1)   # (D, 2)
        self._meta_d = jax.device_put(meta, spec)
        self._fns = {}

    def _build(self, k: int):
        block_rows = self.block_rows
        recall = self.recall_target
        num_rows = self.num_rows
        int8_mode = self.dtype == "int8"

        def local_fn(A, meta, scales, queries):
            row0, nreal = meta[0, 0], meta[0, 1]
            if int8_mode:
                # quantize per query on device (replicated, so every shard
                # derives identical int8 queries); the query scale only
                # affects returned values, applied inside dense_topk_batch
                m = jnp.abs(queries).max(axis=1)
                qs = jnp.where(m > 0, m / 127.0, 1.0).astype(jnp.float32)
                qi = jnp.round(queries / qs[:, None]).astype(jnp.int8)
                li, lv = dense_topk_batch(
                    A[0], qi, nreal, scales[0], qs, k=k,
                    block_rows=block_rows, recall_target=recall)
            else:
                li, lv = dense_topk_batch(
                    A[0], queries, nreal, k=k, block_rows=block_rows,
                    recall_target=recall)
            # pad rows (zero vectors past this shard's real rows) must not
            # alias real global rows: send them to the sentinel with -inf
            valid = li < nreal
            gi = jnp.where(valid, li + row0, num_rows)
            lv = jnp.where(valid, lv, -jnp.inf)
            gr = jax.lax.all_gather(gi, AXIS, axis=1)   # (Q, D, k)
            gv = jax.lax.all_gather(lv, AXIS, axis=1)
            fv, fp = jax.lax.top_k(gv.reshape(gv.shape[0], -1), k)
            fr = jnp.take_along_axis(gr.reshape(gr.shape[0], -1), fp, axis=1)
            fr = jnp.where(fr < num_rows, fr, -1)
            return fr[None], fv[None]

        fn = shard_map(local_fn, mesh=self.mesh,
                       in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
                       out_specs=(P(AXIS), P(AXIS)), check_rep=False)

        @jax.jit
        def run(A, meta, scales, queries):
            rr, vv = fn(A, meta, scales, queries)
            return rr[0], vv[0]

        return run

    def query_batch(self, queries, k: Optional[int] = None):
        user_k = k or self.config.k
        pool = self.config.rescore_pool
        k = max(user_k, pool) if pool else user_k
        if k not in self._fns:
            self._fns[k] = self._build(k)
        queries = np.asarray(queries, np.float32)
        idx, vals = self._fns[k](self._A, self._meta_d, self._scales_d,
                                 jnp.asarray(queries))
        if pool:
            from ..api import exact_rescore

            outs = [exact_rescore(self._scipy_csr, np.asarray(idx[q]),
                                  queries[q], user_k)
                    for q in range(len(queries))]
            return (jnp.stack([jnp.asarray(o[0]) for o in outs]),
                    jnp.stack([jnp.asarray(o[1]) for o in outs]))
        return idx, vals

    def query(self, vec, k: Optional[int] = None):
        idx, vals = self.query_batch(np.asarray(vec)[None, :], k)
        return idx[0], vals[0]

    @property
    def hbm_bytes(self) -> int:
        return int(np.prod(self._A.shape)) * (
            1 if self.dtype == "int8" else 2)
