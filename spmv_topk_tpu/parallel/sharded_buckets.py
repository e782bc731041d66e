"""Row-sharded Top-K SpMV on the bucketed (fast) layout.

shard_map runs one program on every device, so the per-device bucket
structure must be identical. Shards of the same corpus have near-identical
degree profiles, so a *common bucket skeleton* costs little padding:

  1. rows are split into contiguous equal blocks per device (the
     reference's partition rule, host_spmv_bscsr.cpp:136-141);
  2. each shard is SELL-bucket-packed independently;
  3. the skeleton is the union of bucket widths with per-width block
     counts maxed across devices; shards missing a width get zero-filled
     blocks, and each bucket's *real slice count* is a per-device SMEM
     scalar (the kernel masks block-padding slices dynamically);
  4. per-device row_ids map skeleton slice positions to global rows.

The merge is unchanged: per-device local Top-K -> all_gather of k
(value, row) pairs over ICI/DCN -> replicated lax.top_k.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import LANES, TopKSpMVConfig, DEFAULT_CONFIG
from ..formats.coo import CooMatrix
from ..formats.sell_buckets import pack_sell_buckets
from ..ops.kernel import topk_spmv_bucket_device
from .sharded import AXIS, make_mesh


@dataclasses.dataclass(frozen=True)
class _SkeletonBucket:
    width: int
    slices_per_block: int
    num_blocks: int
    slice_base: int       # common static base in the skeleton numbering
    max_slices: int


class ShardedBucketedTopKSpMV:
    """Multi-device engine on the bucketed layout (single or multi host)."""

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

        rows_per_shard = -(-matrix.num_rows // D)
        packs = []
        for d in range(D):
            lo = d * rows_per_shard
            hi = min(lo + rows_per_shard, matrix.num_rows)
            local = matrix.row_slice(lo, hi)
            if local.num_rows <= 0 or local.nnz == 0:
                raise ValueError(f"shard {d} is empty ({D} devices)")
            packs.append((lo, pack_sell_buckets(local, config)))

        # Common skeleton: widths sorted desc (matching each shard's own
        # ordering), per-width maxima across shards.
        by_width: dict[int, dict] = {}
        for _, m in packs:
            for b in m.buckets:
                agg = by_width.setdefault(
                    b.width, dict(blocks=0, slices=0, spb=b.slices_per_block))
                agg["blocks"] = max(agg["blocks"], b.num_blocks)
                agg["slices"] = max(agg["slices"], b.num_slices)
        skeleton = []
        base = 0
        for w in sorted(by_width, reverse=True):
            agg = by_width[w]
            skeleton.append(_SkeletonBucket(
                width=w, slices_per_block=agg["spb"],
                num_blocks=agg["blocks"], slice_base=base,
                max_slices=agg["blocks"] * agg["spb"],
            ))
            base += skeleton[-1].max_slices
        self.skeleton = skeleton
        total_slices = base

        # Device-stacked arrays.
        words_per_bucket = []
        nreal = np.zeros((D, len(skeleton), 1, 1), np.int32)
        row_ids = np.full((D, total_slices + 1, LANES), -1, np.int32)
        for bi, sk in enumerate(skeleton):
            block_sub = sk.width * sk.slices_per_block
            wb = np.zeros((D, sk.num_blocks * block_sub, LANES), np.int32)
            for d, (row0, m) in enumerate(packs):
                src = next((b for b in m.buckets if b.width == sk.width), None)
                if src is None:
                    continue
                wb[d, : src.words.shape[0]] = src.words
                nreal[d, bi, 0, 0] = src.num_slices
                ids = m.row_ids[src.slice_base:src.slice_base + src.num_slices]
                ids = ids.copy()
                ids[ids >= 0] += row0
                row_ids[d, sk.slice_base:sk.slice_base + src.num_slices] = ids
            words_per_bucket.append(wb)

        spec = jax.sharding.NamedSharding(self.mesh, P(AXIS))
        self._words = [jax.device_put(w, spec) for w in words_per_bucket]
        self._nreal = jax.device_put(nreal, spec)
        self._row_ids = jax.device_put(row_ids, spec)
        self._query_fn = self._build_query_fn()

    # ------------------------------------------------------------------

    def _build_query_fn(self):
        cfg = self.config
        interpret = self._interpret
        skeleton = self.skeleton
        k = cfg.k

        def local_fn(nreal, row_ids, table, *words):
            tvs, tts = [], []
            for sk, wb in zip(skeleton, words):
                tv, tt = topk_spmv_bucket_device(
                    wb[0], table, nreal[0, len(tvs)],
                    cfg=cfg, interpret=interpret, codec=cfg.query_codec,
                    num_groups=cfg.max_cols // LANES, width=sk.width,
                    slices_per_block=sk.slices_per_block,
                    slice_base=sk.slice_base, num_blocks=sk.num_blocks,
                )
                tvs.append(tv)
                tts.append(tt)
            topv = jnp.stack(tvs)
            topt = jnp.stack(tts)
            # resolve to global rows, reduce to local top-k
            flat_v = topv.reshape(-1)
            flat_t = jnp.clip(topt.reshape(-1), 0, row_ids.shape[1] - 1)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, topv.shape, topv.ndim - 1).reshape(-1)
            rows = row_ids[0].reshape(-1)[flat_t * LANES + lane]
            valid = (rows >= 0) & (flat_v != -jnp.inf)
            masked = jnp.where(valid, flat_v, -jnp.inf)
            kk = min(k, masked.shape[0])
            lv, pos = jax.lax.top_k(masked, kk)
            lr = rows[pos]
            gr = jax.lax.all_gather(lr, AXIS)
            gv = jax.lax.all_gather(lv, AXIS)
            fv, fpos = jax.lax.top_k(gv.reshape(-1), k)
            return gr.reshape(-1)[fpos][None], fv[None]

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS), P()) + tuple(P(AXIS) for _ in skeleton),
            out_specs=(P(AXIS), P(AXIS)),
            check_rep=False,
        )

        @jax.jit
        def query_fn(nreal, row_ids, table, *words):
            rr, vv = fn(nreal, row_ids, table, *words)
            return rr[0], vv[0]

        return query_fn

    def _table(self, vec: np.ndarray):
        vec = np.asarray(vec, dtype=np.float32)
        padded = np.zeros(self.config.max_cols, np.float32)
        padded[: self.num_cols] = vec
        from ..ops.quantized_query import pack_query_table

        tab, scale = pack_query_table(padded, self.config.query_codec)
        return jnp.asarray(tab), scale

    def query(self, vec, k: Optional[int] = None):
        table, scale = self._table(vec)
        idx, vals = self._query_fn(
            self._nreal, self._row_ids, table, *self._words)
        if scale != 1.0:
            vals = vals * scale
        if k is not None and k != self.config.k:
            if k > self.config.k:
                raise ValueError(
                    f"k={k} exceeds build-time merge width {self.config.k}")
            idx, vals = idx[:k], vals[:k]
        return idx, vals

    def _build_batch_fn(self, group: int):
        from ..ops.kernel import topk_spmv_bucket_batch_device

        cfg = self.config
        interpret = self._interpret
        skeleton = self.skeleton
        k = cfg.k

        def local_fn(nreal, row_ids, tables, *words):
            tvs, tts = [], []
            for bi, (sk, wb) in enumerate(zip(skeleton, words)):
                tv, tt = topk_spmv_bucket_batch_device(
                    wb[0], tables, nreal[0, bi], cfg=cfg,
                    interpret=interpret,
                    codec=cfg.query_codec, width=sk.width,
                    slices_per_block=sk.slices_per_block,
                    slice_base=sk.slice_base,
                    num_blocks=sk.num_blocks,
                )
                tvs.append(tv)
                tts.append(tt)
            topv = jnp.stack(tvs, axis=1)       # (Q, buckets, K, 128)
            topt = jnp.stack(tts, axis=1)

            def resolve(tv_q, tt_q):
                flat_v = tv_q.reshape(-1)
                flat_t = jnp.clip(tt_q.reshape(-1), 0, row_ids.shape[1] - 1)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, tv_q.shape, tv_q.ndim - 1).reshape(-1)
                rows = row_ids[0].reshape(-1)[flat_t * LANES + lane]
                valid = (rows >= 0) & (flat_v != -jnp.inf)
                masked = jnp.where(valid, flat_v, -jnp.inf)
                lv, pos = jax.lax.top_k(masked, min(k, masked.shape[0]))
                return rows[pos], lv

            lr, lv = jax.vmap(resolve)(topv, topt)      # (Q, k)
            gr = jax.lax.all_gather(lr, AXIS, axis=1)   # (Q, D, k)
            gv = jax.lax.all_gather(lv, AXIS, axis=1)
            fv, fpos = jax.lax.top_k(gv.reshape(gv.shape[0], -1), k)
            fr = jnp.take_along_axis(gr.reshape(gr.shape[0], -1), fpos, axis=1)
            return fr[None], fv[None]

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS), P()) + tuple(P(AXIS) for _ in skeleton),
            out_specs=(P(AXIS), P(AXIS)),
            check_rep=False,
        )

        @jax.jit
        def batch_fn(nreal, row_ids, tables, *words):
            rr, vv = fn(nreal, row_ids, tables, *words)
            return rr[0], vv[0]

        return batch_fn

    def query_batch(self, queries, k: Optional[int] = None,
                    group_size: int = 8):
        """Batched sharded queries: the multi-query kernel runs per shard
        and the merge gathers (Q, k) candidate pairs per device."""
        queries = np.asarray(queries, dtype=np.float32)
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        if group_size not in self._batch_fns:
            self._batch_fns[group_size] = self._build_batch_fn(group_size)
        fn = self._batch_fns[group_size]

        idx_all, val_all = [], []
        for start in range(0, len(queries), group_size):
            chunk = queries[start:start + group_size]
            n_real = len(chunk)
            if n_real < group_size:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], group_size - n_real, 0)])
            tabs, scales = zip(*(self._table(q) for q in chunk))
            idx, vals = fn(self._nreal, self._row_ids,
                           jnp.stack(tabs), *self._words)
            vals = vals * jnp.asarray(scales, jnp.float32)[:, None]
            if k is not None and k < self.config.k:
                idx, vals = idx[:, :k], vals[:, :k]
            idx_all.append(idx[:n_real])
            val_all.append(vals[:n_real])
        return jnp.concatenate(idx_all), jnp.concatenate(val_all)

    @property
    def hbm_bytes(self) -> int:
        return sum(int(np.prod(w.shape)) * 4 for w in self._words)
