"""Row-sharded multi-device Top-K SpMV (shard_map over a device mesh).

DEPRECATED engine: this module drives the *streamed* SELL layout, which
measured ~2.5x slower than the bucketed layout on v5e — production
sharding lives in parallel/sharded_buckets.py (ShardedBucketedTopKSpMV).
It survives as the layout-independent reference implementation of the
shard/merge protocol (and as a test fixture); `make_mesh`/`AXIS` defined
here are shared by both engines.

TPU-native replacement of the reference's device-level parallel layout
(P1/P2 in SURVEY.md §2.3): 32 row partitions x 32 HBM pseudo-channels on
one FPGA (host_spmv_bscsr.cpp:136-150, Makefile:66-97) become row shards
across TPU devices:

  - each device holds its own SELL-packed row block resident in HBM,
  - the query vector is fully replicated (no halo), exactly like the
    per-CU URAM replication (spmv_bscsr_top_k_multicore.cpp:86-140),
  - each device runs the fused kernel and reduces to a local Top-K,
  - the global merge — the reference does it on the host over PCIe
    (read_result, host_spmv_bscsr.cpp:399-448) — is an all_gather of
    (k) candidate pairs over ICI followed by a replicated lax.top_k.

The same code path drives multi-host slices: initialize
jax.distributed (see .distributed) and pass the global mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import LANES, TopKSpMVConfig, DEFAULT_CONFIG
from ..formats.coo import CooMatrix
from ..formats.sell import pack_sell
from ..ops.kernel import topk_spmv_sell_device

AXIS = "shards"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (AXIS,))


@dataclasses.dataclass
class _ShardArrays:
    words: jax.Array    # (D, part_blocks*P*block_sublanes, 128) int32
    meta: jax.Array     # (D, P*part_blocks, 1, cpb) int32
    row_ids: jax.Array  # (D, max_slices, 128) int32, globally indexed


class ShardedStreamedTopKSpMV:
    """Matrix-resident Top-K SpMV over a 1D device mesh (row shards).

    DEPRECATED layout: this drives the *streamed* SELL kernel, ~2.5x
    slower than the fused bucketed engine on v5e. `ShardedTopKSpMV` (the
    public name) now aliases `ShardedBucketedTopKSpMV`; this class stays
    as the second implementation for differential testing.
    """

    def __init__(
        self,
        matrix: CooMatrix,
        config: TopKSpMVConfig = DEFAULT_CONFIG,
        mesh: Optional[Mesh] = None,
        interpret: Optional[bool] = None,
    ):
        self.mesh = mesh or make_mesh()
        D = self.mesh.devices.size
        self.config = config
        self.num_rows = matrix.num_rows
        self.num_cols = matrix.num_cols
        self.num_nnz = matrix.nnz
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self._interpret = interpret

        if not matrix.is_sorted_row_major():
            matrix = matrix.sort_row_major()

        # Contiguous equal row blocks per device (host_spmv_bscsr.cpp:136-141).
        rows_per_shard = -(-matrix.num_rows // D)
        shards = []
        for d in range(D):
            lo, hi = d * rows_per_shard, min((d + 1) * rows_per_shard, matrix.num_rows)
            local = matrix.row_slice(lo, hi)
            if local.num_rows <= 0 or local.nnz == 0:
                raise ValueError(
                    f"shard {d} is empty: {matrix.num_rows} rows over {D} devices"
                )
            shards.append((lo, pack_sell(local, config)))

        # Pad every shard to identical block / slice counts (static shapes
        # under shard_map), then build device-sharded global arrays.
        cpb = config.block_sublanes // config.chunk_sublanes
        max_blocks = max(s.part_blocks for _, s in shards)
        max_slices = max(s.num_slices for _, s in shards)
        P_ = config.num_partitions

        words = np.zeros(
            (D, P_ * max_blocks * config.block_sublanes, LANES), np.int32)
        meta = np.zeros((D, P_ * max_blocks, 1, cpb), np.int32)
        row_ids = np.full((D, max_slices, LANES), -1, np.int32)
        for d, (row0, s) in enumerate(shards):
            bs = s.part_blocks * config.block_sublanes
            sub = s.words.reshape(P_, -1, LANES)
            mt = s.meta.reshape(P_, -1, 1, cpb)
            for p in range(P_):
                words[d, p * max_blocks * config.block_sublanes:
                      p * max_blocks * config.block_sublanes + bs] = sub[p]
                meta[d, p * max_blocks: p * max_blocks + s.part_blocks] = mt[p]
                # padding blocks keep meta 0 (slice 0, no end flag)
            ids = s.row_ids.copy()
            ids[ids >= 0] += row0
            row_ids[d, : s.num_slices] = ids

        self.part_blocks = max_blocks
        shard_spec = jax.sharding.NamedSharding(self.mesh, P(AXIS))
        self._arrays = _ShardArrays(
            words=jax.device_put(words, shard_spec),
            meta=jax.device_put(meta, shard_spec),
            row_ids=jax.device_put(row_ids, shard_spec),
        )
        self._query_fn = self._build_query_fn()

    # ------------------------------------------------------------------

    def _build_query_fn(self):
        cfg = self.config
        interpret = self._interpret
        k = cfg.k

        def local_candidates(words, meta, row_ids, table):
            # leading device axis of size 1 inside shard_map
            topv, topt = topk_spmv_sell_device(
                words[0], meta[0], table, cfg=cfg, interpret=interpret
            )
            flat_v = topv.reshape(-1)
            flat_t = topt.reshape(-1)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, topv.shape, topv.ndim - 1).reshape(-1)
            rows = row_ids[0].reshape(-1)[flat_t * LANES + lane]
            valid = (rows >= 0) & (flat_v != -jnp.inf)
            masked = jnp.where(valid, flat_v, -jnp.inf)
            # Local Top-K reduction before the collective: ships k pairs
            # per device instead of lane_k*128*P.
            kk = min(k, masked.shape[0])
            lv, pos = jax.lax.top_k(masked, kk)
            lr = rows[pos]
            # All-gather the candidate pairs over ICI, merge replicated.
            gr = jax.lax.all_gather(lr, AXIS)
            gv = jax.lax.all_gather(lv, AXIS)
            fv, fpos = jax.lax.top_k(gv.reshape(-1), k)
            fr = gr.reshape(-1)[fpos]
            return fr[None], fv[None]

        fn = shard_map(
            local_candidates,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
            out_specs=(P(AXIS), P(AXIS)),
            check_rep=False,
        )

        @jax.jit
        def query_fn(words, meta, row_ids, table):
            rr, vv = fn(words, meta, row_ids, table)
            # all shards hold identical merged results; take shard 0's copy
            return rr[0], vv[0]

        return query_fn

    def _table(self, vec: np.ndarray) -> jax.Array:
        vec = np.asarray(vec, dtype=np.float32)
        padded = np.zeros(self.config.max_cols, np.float32)
        padded[: self.num_cols] = vec
        return jnp.asarray(padded.reshape(-1, LANES))

    def query(self, vec, k: Optional[int] = None):
        idx, vals = self._query_fn(
            self._arrays.words, self._arrays.meta, self._arrays.row_ids,
            self._table(vec),
        )
        if k is not None and k != self.config.k:
            if k > self.config.k:
                raise ValueError(
                    f"k={k} exceeds the build-time merge width config.k="
                    f"{self.config.k}"
                )
            idx, vals = idx[:k], vals[:k]
        return idx, vals

    def query_batch(self, queries):
        idxs, vals = [], []
        for q in np.asarray(queries):
            i, v = self.query(q)
            idxs.append(i); vals.append(v)
        return jnp.stack(idxs), jnp.stack(vals)
