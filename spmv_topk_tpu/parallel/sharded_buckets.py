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

Multi-process (multi-HOST) operation: each process packs ONLY the rows
owned by its addressable devices (pass ``local_rows=(row_lo,
global_num_rows)`` with a matrix holding just this process's row slice —
the generalization of the reference's per-partition packing,
host_spmv_bscsr.cpp:136-150). The bucket-width skeleton, the h16 value
scale, and the word-buffer length are agreed across processes with one
small ``process_allgather``; the global device arrays are assembled from
per-process shards via ``jax.make_array_from_single_device_arrays`` so no
host ever materializes another host's shard. Exact rescoring keeps only
the local CSR slice per host and merges candidate scores across processes
(the distributed analog of the host merge, host_spmv_bscsr.cpp:399-448).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import LANES, TopKSpMVConfig, DEFAULT_CONFIG
from ..formats.coo import CooMatrix
from ..formats.sell_buckets import (pack_sell_buckets, fuse_buckets,
                                    fuse_buckets_octet)
from ..ops.kernel import TOPK_FLOOR
from .mesh import AXIS, make_mesh

_SKELETON_SLOTS = 256  # fixed-size allgather payload: (width, blocks) pairs


def _process_allgather(x: np.ndarray) -> np.ndarray:
    """All processes' copies of x, stacked on axis 0 (process order)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        np.asarray(x), tiled=False))


class ShardedBucketedTopKSpMV:
    """Multi-device engine on the bucketed layout (single or multi host)."""

    def __init__(
        self,
        matrix: CooMatrix,
        config: TopKSpMVConfig = DEFAULT_CONFIG,
        mesh: Optional[Mesh] = None,
        interpret: Optional[bool] = None,
        local_rows: Optional[tuple] = None,
        exchange_skeleton: Optional[bool] = None,
    ):
        """local_rows: ``(row_lo, global_num_rows)`` — `matrix` holds only
        this process's contiguous row slice starting at global row
        ``row_lo`` of a ``global_num_rows``-row corpus. Required shape for
        multi-host serving (each host packs its own rows); None means
        `matrix` is the full corpus (single process, or every process
        loaded it).

        config.num_partitions > 1 composes the megacore partition axis
        with sharding: each device shard is packed as P partition-major
        streams and swept by the partition-parallel kernel (the CU
        hierarchy, types.hpp:36-38, on every chip of the mesh).

        exchange_skeleton: force the multi-process skeleton/scale
        exchange even single-process (None = auto: processes > 1); used
        by dry runs to execute the multi-host code path on one process.
        """
        if config.fused_layout == "octet" and not config.sigma_sort:
            raise ValueError(
                "fused_layout='octet' on a sharded engine requires "
                "sigma_sort=True: the cross-shard bucket skeleton cannot "
                "hold duplicate widths in the transposed stream")
        self._setup_mesh(mesh, config, interpret)
        mesh = self.mesh
        D = int(mesh.devices.size)
        nproc = jax.process_count()
        exchange = (nproc > 1 if exchange_skeleton is None
                    else bool(exchange_skeleton))
        self.num_cols = matrix.num_cols
        NP = config.num_partitions

        if not matrix.is_sorted_row_major():
            matrix = matrix.sort_row_major()

        if local_rows is None:
            row_lo, global_rows = 0, matrix.num_rows
        else:
            row_lo, global_rows = int(local_rows[0]), int(local_rows[1])
        self.num_rows = global_rows
        rows_per_shard = -(-global_rows // D)
        my_pos = self._my_pos
        flat = self._flat_devices

        # Rescore keeps only the LOCAL row slice of the CSR per host.
        self._csr_lo = my_pos[0] * rows_per_shard + 0
        self._csr_hi = min((my_pos[-1] + 1) * rows_per_shard, global_rows)
        if config.rescore_pool:
            lo_in_mat = self._csr_lo - row_lo
            hi_in_mat = self._csr_hi - row_lo
            if local_rows is None and nproc == 1:
                self._scipy_csr = matrix.to_scipy_csr()
                self._csr_lo, self._csr_hi = 0, global_rows
            else:
                self._scipy_csr = matrix.row_slice(
                    lo_in_mat, hi_in_mat).to_scipy_csr()
        else:
            self._scipy_csr = None

        # h16 quantizes values with ONE global scale so per-shard scores
        # stay comparable across devices at the merge.
        self._value_scale = 1.0
        vscale = None
        if config.query_codec == "h16":
            vmax = float(np.max(np.abs(matrix.vals))) if matrix.nnz else 0.0
            if exchange:
                vmax = float(_process_allgather(
                    np.float32(vmax)).max())
            vscale = ((vmax or 1.0) / 31.0) or 1.0
            self._value_scale = vscale

        # Pack only this process's shards — NP partition units per device
        # (the in-shard analog of pack_fused_partitions).
        packs = []  # list (per device) of list (per partition) of (row0, m)
        for pos in my_pos:
            lo = pos * rows_per_shard
            hi = min(lo + rows_per_shard, global_rows)
            if not (row_lo <= lo and hi <= row_lo + matrix.num_rows):
                raise ValueError(
                    f"device shard rows [{lo},{hi}) outside this process's "
                    f"matrix rows [{row_lo},{row_lo + matrix.num_rows}) — "
                    "pass the slice from distributed.local_shard_rows")
            local = matrix.row_slice(lo - row_lo, hi - row_lo)
            if local.num_rows <= 0 or local.nnz == 0:
                raise ValueError(f"shard {pos} is empty ({D} devices)")
            rows_per_part = -(-local.num_rows // NP)
            units = []
            for p in range(NP):
                plo = p * rows_per_part
                phi = min(plo + rows_per_part, local.num_rows)
                part = local.row_slice(plo, phi)
                if part.num_rows <= 0 or part.nnz == 0:
                    raise ValueError(
                        f"partition {p} of shard {pos} is empty — lower "
                        "config.num_partitions")
                units.append((lo + plo, pack_sell_buckets(
                    part, config, value_scale=vscale)))
            packs.append(units)

        # Common skeleton for the fused plan: widths sorted desc (matching
        # each unit's own ordering), per-width block maxima across ALL
        # partition units of ALL shards of ALL processes. Every device
        # then shares ONE fused word stream layout -> one compiled kernel
        # under shard_map, with per-(device, partition) real-slice counts
        # (nreal) masking padding slices.
        tgt = config.fused_block_sublanes
        octet = config.fused_layout == "octet"
        S = config.chunk_sublanes
        by_width: dict[int, int] = {}
        for units in packs:
            for _, m in units:
                if octet:
                    # octet skeleton shares the member STRIDE (num octets
                    # G) per width; the exchanged pair is (width, G)
                    for b in m.buckets:
                        g = -(-b.num_slices // S)
                        by_width[b.width] = max(
                            by_width.get(b.width, 0), g)
                    continue
                f_local = fuse_buckets(m, block_sublanes=tgt)
                for p in f_local.plan:
                    by_width[p.width] = max(by_width.get(p.width, 0),
                                            p.num_blocks)
        if exchange:
            # Fixed-size payload: (width, num_blocks) pairs, zero-padded.
            pairs = np.zeros((_SKELETON_SLOTS, 2), np.int32)
            items = sorted(by_width.items(), reverse=True)
            if len(items) > _SKELETON_SLOTS:
                raise ValueError(f"{len(items)} bucket widths exceed the "
                                 f"{_SKELETON_SLOTS}-slot skeleton exchange")
            for i, (w, nb) in enumerate(items):
                pairs[i] = (w, nb)
            allp = _process_allgather(pairs).reshape(-1, 2)
            by_width = {}
            for w, nb in allp[allp[:, 0] > 0]:
                by_width[int(w)] = max(by_width.get(int(w), 0), int(nb))
        skeleton = []
        base = 0
        for w in sorted(by_width, reverse=True):
            nb = by_width[w]
            skeleton.append((w, nb, base))
            if octet:
                base += S * nb   # nb = G here; S*G slice ids per width
            else:
                spb = tgt // w if w <= tgt else 1
                bps = 1 if w <= tgt else -(-w // tgt)
                base += (nb * spb) if bps == 1 else (nb // bps)
        total_slices = base

        # Per-(device, partition) fused streams conforming to the skeleton.
        fuse = fuse_buckets_octet if octet else fuse_buckets
        fused = [[fuse(m, block_sublanes=tgt, skeleton=skeleton)
                  for _, m in units] for units in packs]
        plan0 = fused[0][0].plan
        nb_words = max(f.words.shape[0] for fs in fused for f in fs)
        if exchange:
            nb_words = int(_process_allgather(np.int32(nb_words)).max())

        shard_words, shard_nreal, shard_rows = [], [], []
        for units, fs in zip(packs, fused):
            w = np.zeros((1, NP * nb_words, LANES), np.int32)
            nr = np.zeros((1, NP, len(plan0), 1), np.int32)
            rid = np.full((1, NP * (total_slices + 1), LANES), -1, np.int32)
            for p, ((row0, m), f) in enumerate(zip(units, fs)):
                assert f.plan == plan0, "skeleton plans must agree"
                w[0, p * nb_words: p * nb_words + f.words.shape[0]] = f.words
                nr[0, p, :, 0] = f.nreal[:, 0]
                r0 = p * (total_slices + 1)
                for q, n_sl in zip(f.plan, f.nreal[:, 0]):
                    if n_sl == 0:
                        continue  # this unit has no slices of this width
                    src = next(b for b in m.buckets if b.width == q.width)
                    ids = m.row_ids[src.slice_base:
                                    src.slice_base + int(n_sl)].copy()
                    ids[ids >= 0] += row0
                    rid[0, r0 + q.slice_base:
                        r0 + q.slice_base + int(n_sl)] = ids
            shard_words.append(w)
            shard_nreal.append(nr)
            shard_rows.append(rid)

        self._finalize(config, plan0, fused[0][0].num_blocks, tgt, nb_words,
                       total_slices, shard_words, shard_nreal, shard_rows)

    # ------------------------------------------------------------------

    def _setup_mesh(self, mesh, config, interpret):
        if mesh is None:
            if jax.process_count() > 1:
                from .distributed import global_mesh

                mesh = global_mesh()
            else:
                mesh = make_mesh()
        self.mesh = mesh
        self.config = config
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self._interpret = interpret
        # Merge width: widened to the rescore pool so the host re-ranking
        # has enough exact candidates (see api.TopKSpMV._rescore).
        self._merge_k = max(config.k, config.rescore_pool or 0)
        me = jax.process_index()
        self._flat_devices = list(self.mesh.devices.flat)
        self._my_pos = [i for i, d in enumerate(self._flat_devices)
                        if d.process_index == me]
        if not self._my_pos:
            raise ValueError(f"process {me} owns no devices of the mesh")

    def _finalize(self, config, plan, num_blocks, tgt, nb_words,
                  total_slices, shard_words, shard_nreal, shard_rows):
        """Assemble the global device arrays from per-process single-device
        shards: no host ever holds (D, ...) — only its own
        (len(my_pos), ...) slices."""
        NP = config.num_partitions
        D = int(self.mesh.devices.size)
        self.fused_plan = plan
        self.fused_num_blocks = num_blocks
        self.fused_block_sublanes = tgt
        self._nb_words = nb_words
        self._total_slices = total_slices
        flat, my_pos = self._flat_devices, self._my_pos

        def _global(shards, tail_shape):
            spec = NamedSharding(self.mesh, P(AXIS))
            bufs = [jax.device_put(s, flat[pos])
                    for pos, s in zip(my_pos, shards)]
            return jax.make_array_from_single_device_arrays(
                (D,) + tail_shape, spec, bufs)

        self._words = _global(shard_words, (NP * nb_words, LANES))
        self._nreal = _global(shard_nreal, (NP, len(plan), 1))
        self._row_ids = _global(shard_rows,
                                (NP * (total_slices + 1), LANES))
        self._query_fn = self._build_query_fn()

    # -- persistence ----------------------------------------------------

    def save(self, path: str) -> None:
        """Per-shard snapshot: `{path}.meta.npz` (process 0) plus one
        `{path}.shard{pos:04d}.npz` per device position, each written by
        the process owning that device — no host materializes another
        host's shard. Amortizes the pack cost the reference pays every
        process start (SpMV ctor, host_spmv_bscsr.cpp:104-125), which at
        the 100M-row config is ~20 min/host. The rescore CSR is NOT
        persisted (it is the raw matrix); pass the local matrix slice to
        load() to restore exact rescoring without repacking."""
        import dataclasses
        import json

        if jax.process_index() == 0:
            if self.config.fused_layout == "octet":
                plan_arr = np.array(
                    [[q.width, q.octets_per_block, q.blocks_per_octet,
                      q.stride, q.slice_base, q.blk_start, q.num_blocks]
                     for q in self.fused_plan], np.int64)
            else:
                plan_arr = np.array(
                    [[q.width, q.slices_per_block, q.blocks_per_slice,
                      q.slice_base, q.blk_start, q.num_blocks]
                     for q in self.fused_plan], np.int64)
            cfg = dataclasses.asdict(self.config)
            meta = dict(config=cfg, block_sublanes=self.fused_block_sublanes,
                        num_blocks=self.fused_num_blocks,
                        nb_words=self._nb_words,
                        total_slices=self._total_slices,
                        num_devices=int(self.mesh.devices.size),
                        num_rows=self.num_rows, num_cols=self.num_cols,
                        value_scale=self._value_scale, format_version=1)
            with open(f"{path}.meta.npz", "wb") as fh:
                np.savez(fh, plan=plan_arr, meta=np.frombuffer(
                    json.dumps(meta).encode(), np.uint8))
        # addressable_shards order is unspecified: key each shard by the
        # mesh position of its device, not by list order
        pos_of_dev = {d.id: pos
                      for pos, d in enumerate(self._flat_devices)}

        def by_pos(arr):
            return {pos_of_dev[s.device.id]: np.asarray(s.data)
                    for s in arr.addressable_shards}

        ws, nrs, rids = (by_pos(self._words), by_pos(self._nreal),
                         by_pos(self._row_ids))
        for pos in self._my_pos:
            with open(f"{path}.shard{pos:04d}.npz", "wb") as fh:
                np.savez(fh, words=ws[pos], nreal=nrs[pos],
                         row_ids=rids[pos])

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None,
             interpret: Optional[bool] = None,
             matrix: Optional[CooMatrix] = None,
             local_rows: Optional[tuple] = None):
        """Reconstruct a sharded engine from save(): each process reads
        ONLY its own devices' shard files (multi-process load). The mesh
        may have a different process layout than at save time, but must
        have the same device count.

        matrix (+ local_rows, same contract as __init__): optional source
        rows to rebuild the host rescore CSR from — without it a
        rescore_pool config degrades to un-rescored serving with a
        warning, like TopKSpMV.load."""
        import json

        from ..config import TopKSpMVConfig, ValueFormat
        from ..formats.sell_buckets import FusedBucket, OctetBucket

        z = np.load(f"{path}.meta.npz")
        meta = json.loads(bytes(z["meta"]).decode())
        cfg_d = dict(meta["config"])
        cfg_d["value_format"] = ValueFormat(**cfg_d["value_format"])
        config = TopKSpMVConfig(**cfg_d)
        if config.fused_layout == "octet":
            plan = tuple(
                OctetBucket(width=int(r[0]), octets_per_block=int(r[1]),
                            blocks_per_octet=int(r[2]), stride=int(r[3]),
                            slice_base=int(r[4]), blk_start=int(r[5]),
                            num_blocks=int(r[6]))
                for r in z["plan"])
        else:
            plan = tuple(
                FusedBucket(width=int(r[0]), slices_per_block=int(r[1]),
                            blocks_per_slice=int(r[2]), slice_base=int(r[3]),
                            blk_start=int(r[4]), num_blocks=int(r[5]))
                for r in z["plan"])

        self = cls.__new__(cls)
        self._setup_mesh(mesh, config, interpret)
        D = int(self.mesh.devices.size)
        if D != int(meta["num_devices"]):
            raise ValueError(
                f"snapshot was saved for {meta['num_devices']} devices, "
                f"mesh has {D}")
        self.num_rows = int(meta["num_rows"])
        self.num_cols = int(meta["num_cols"])
        self._value_scale = float(meta["value_scale"])

        rows_per_shard = -(-self.num_rows // D)
        self._csr_lo = self._my_pos[0] * rows_per_shard
        self._csr_hi = min((self._my_pos[-1] + 1) * rows_per_shard,
                           self.num_rows)
        self._scipy_csr = None
        if config.rescore_pool:
            if matrix is None:
                import warnings

                warnings.warn(
                    "loaded sharded engine has no host CSR: rescore_pool "
                    "disabled (pass matrix= to load() to restore exact "
                    "rescoring)", stacklevel=2)
            else:
                row_lo = int(local_rows[0]) if local_rows else 0
                self._scipy_csr = matrix.row_slice(
                    self._csr_lo - row_lo,
                    self._csr_hi - row_lo).to_scipy_csr()

        shard_words, shard_nreal, shard_rows = [], [], []
        for pos in self._my_pos:
            s = np.load(f"{path}.shard{pos:04d}.npz")
            shard_words.append(s["words"])
            shard_nreal.append(s["nreal"])
            shard_rows.append(s["row_ids"])
        self._finalize(config, plan, int(meta["num_blocks"]),
                       int(meta["block_sublanes"]), int(meta["nb_words"]),
                       int(meta["total_slices"]),
                       shard_words, shard_nreal, shard_rows)
        return self

    # ------------------------------------------------------------------

    def _local_sweep(self):
        """(nreal, table, words) -> (topv, topt) on one device's shard:
        the partition-parallel kernel when config.num_partitions > 1 (the
        megacore CU hierarchy composed with sharding), else the plain
        fused kernel."""
        from ..ops.kernel import (topk_spmv_fused_device,
                                  topk_spmv_fused_part_device,
                                  topk_spmv_fused_octet_device,
                                  topk_spmv_fused_octet_part_device)

        cfg = self.config
        interpret = self._interpret
        plan = self.fused_plan
        num_blocks = self.fused_num_blocks
        block_sub = self.fused_block_sublanes
        NP = cfg.num_partitions
        part_slices = self._total_slices + 1
        octet = cfg.fused_layout == "octet"

        if NP > 1:
            dev = (topk_spmv_fused_octet_part_device if octet
                   else topk_spmv_fused_part_device)
            return lambda nreal, table, words: dev(
                words, table, nreal, cfg=cfg, plan=plan,
                block_sublanes=block_sub, num_blocks=num_blocks,
                num_partitions=NP, part_slices=part_slices,
                interpret=interpret, codec=cfg.query_codec,
            )
        dev = (topk_spmv_fused_octet_device if octet
               else topk_spmv_fused_device)
        return lambda nreal, table, words: dev(
            words, table, nreal[0], cfg=cfg, plan=plan,
            block_sublanes=block_sub, num_blocks=num_blocks,
            interpret=interpret, codec=cfg.query_codec,
        )

    def _build_query_fn(self):
        k = self._merge_k
        sweep = self._local_sweep()

        def local_fn(nreal, row_ids, table, words):
            topv, topt = sweep(nreal[0], table, words[0])
            # resolve to global rows, reduce to local top-k
            flat_v = topv.reshape(-1)
            flat_t = jnp.clip(topt.reshape(-1), 0, row_ids.shape[1] - 1)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, topv.shape, topv.ndim - 1).reshape(-1)
            rows = row_ids[0].reshape(-1)[flat_t * LANES + lane]
            valid = (rows >= 0) & (flat_v > TOPK_FLOOR)
            masked = jnp.where(valid, flat_v, -jnp.inf)
            kk = min(k, masked.shape[0])
            lv, pos = jax.lax.top_k(masked, kk)
            lr = rows[pos]
            gr = jax.lax.all_gather(lr, AXIS)
            gv = jax.lax.all_gather(lv, AXIS)
            flat = gv.reshape(-1)
            fv, fpos = jax.lax.top_k(flat, min(k, flat.shape[0]))
            # identical on every device -> replicated output (out_specs P())
            return gr.reshape(-1)[fpos], fv

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(AXIS)),
            out_specs=(P(), P()),
            check_rep=False,
        )

        @jax.jit
        def query_fn(nreal, row_ids, table, words):
            return fn(nreal, row_ids, table, words)

        return query_fn

    def _table(self, vec: np.ndarray):
        vec = np.asarray(vec, dtype=np.float32)
        padded = np.zeros(self.config.max_cols, np.float32)
        padded[: self.num_cols] = vec
        from ..ops.quantized_query import pack_query_table

        tab, scale = pack_query_table(padded, self.config.query_codec)
        return jnp.asarray(tab), scale

    def _rescore_global(self, idx: np.ndarray, vec: np.ndarray, k: int):
        """Exact re-rank of merged candidates against the per-host CSR
        slice, combined across processes (distributed read_result,
        host_spmv_bscsr.cpp:399-448)."""
        from ..api import exact_rescore

        idx = np.asarray(idx).reshape(-1)
        local = idx[(idx >= self._csr_lo) & (idx < self._csr_hi)]
        li, lv = exact_rescore(self._scipy_csr, local - self._csr_lo,
                               vec, k)
        li = np.where(li >= 0, li + self._csr_lo, -1).astype(np.int32)
        if jax.process_count() > 1:
            gi = _process_allgather(li).reshape(-1)
            gv = _process_allgather(lv).reshape(-1)
            order = np.argsort(-gv, kind="stable")[:k]
            li, lv = gi[order].astype(np.int32), gv[order]
        return jnp.asarray(li), jnp.asarray(lv)

    def query(self, vec, k: Optional[int] = None):
        k = k or self.config.k
        if k > self._merge_k:
            raise ValueError(
                f"k={k} exceeds the build-time merge width "
                f"{self._merge_k} (config.k={self.config.k}; "
                f"config.rescore_pool widens it)")
        table, scale = self._table(vec)
        idx, vals = self._query_fn(
            self._nreal, self._row_ids, table, self._words)
        if self._scipy_csr is not None:
            return self._rescore_global(np.asarray(idx), vec, k)
        scale = scale * self._value_scale
        if scale != 1.0:
            vals = vals * scale
        if k != self._merge_k:
            idx, vals = idx[:k], vals[:k]
        return idx, vals

    def _local_batch_sweep(self):
        """(nreal, tables, words) -> (Q, [P,] K, 128) candidates on one
        device's shard (partition-parallel when num_partitions > 1)."""
        from ..ops.kernel import (topk_spmv_fused_batch_device,
                                  topk_spmv_fused_batch_part_device,
                                  topk_spmv_fused_batch_octet_device,
                                  topk_spmv_fused_batch_octet_part_device)

        cfg = self.config
        interpret = self._interpret
        plan = self.fused_plan
        num_blocks = self.fused_num_blocks
        block_sub = self.fused_block_sublanes
        NP = cfg.num_partitions
        part_slices = self._total_slices + 1
        octet = cfg.fused_layout == "octet"

        if NP > 1:
            dev = (topk_spmv_fused_batch_octet_part_device if octet
                   else topk_spmv_fused_batch_part_device)
            return lambda nreal, tables, words: dev(
                words, tables, nreal, cfg=cfg, plan=plan,
                block_sublanes=block_sub, num_blocks=num_blocks,
                num_partitions=NP, part_slices=part_slices,
                interpret=interpret, codec=cfg.query_codec,
            )
        dev = (topk_spmv_fused_batch_octet_device if octet
               else topk_spmv_fused_batch_device)
        return lambda nreal, tables, words: dev(
            words, tables, nreal[0], cfg=cfg, plan=plan,
            block_sublanes=block_sub, num_blocks=num_blocks,
            interpret=interpret, codec=cfg.query_codec,
        )

    def _build_batch_fn(self, group: int):
        k = self._merge_k
        sweep = self._local_batch_sweep()

        def local_fn(nreal, row_ids, tables, words):
            # (Q, K, 128), or (Q, P, K, 128) on partitioned engines —
            # resolve() flattens whatever trails the Q axis
            topv, topt = sweep(nreal[0], tables, words[0])

            def resolve(tv_q, tt_q):
                flat_v = tv_q.reshape(-1)
                flat_t = jnp.clip(tt_q.reshape(-1), 0, row_ids.shape[1] - 1)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, tv_q.shape, tv_q.ndim - 1).reshape(-1)
                rows = row_ids[0].reshape(-1)[flat_t * LANES + lane]
                valid = (rows >= 0) & (flat_v > TOPK_FLOOR)
                masked = jnp.where(valid, flat_v, -jnp.inf)
                lv, pos = jax.lax.top_k(masked, min(k, masked.shape[0]))
                return rows[pos], lv

            lr, lv = jax.vmap(resolve)(topv, topt)      # (Q, k)
            gr = jax.lax.all_gather(lr, AXIS, axis=1)   # (Q, D, k)
            gv = jax.lax.all_gather(lv, AXIS, axis=1)
            gvf = gv.reshape(gv.shape[0], -1)
            fv, fpos = jax.lax.top_k(gvf, min(k, gvf.shape[1]))
            fr = jnp.take_along_axis(gr.reshape(gr.shape[0], -1), fpos, axis=1)
            return fr, fv

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(AXIS)),
            out_specs=(P(), P()),
            check_rep=False,
        )

        @jax.jit
        def batch_fn(nreal, row_ids, tables, words):
            return fn(nreal, row_ids, tables, words)

        return batch_fn

    def query_batch(self, queries, k: Optional[int] = None,
                    group_size: int = 8):
        """Batched sharded queries: the multi-query kernel runs per shard
        and the merge gathers (Q, k) candidate pairs per device."""
        if (k or self.config.k) > self._merge_k:  # same contract as query()
            raise ValueError(
                f"k={k} exceeds the build-time merge width "
                f"{self._merge_k} (config.k={self.config.k}; "
                f"config.rescore_pool widens it)")
        queries = np.asarray(queries, dtype=np.float32)
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        if group_size not in self._batch_fns:
            self._batch_fns[group_size] = self._build_batch_fn(group_size)
        fn = self._batch_fns[group_size]

        rescore = self._scipy_csr is not None
        # Single-process: overlap the host rescore with the next group's
        # device sweep on a thread pool (api.TopKSpMV.query_batch does the
        # same). Multi-process rescore issues process_allgather collectives
        # whose ORDER must match on every host, so it stays serial there.
        threaded = rescore and jax.process_count() == 1
        kk = k or self.config.k
        idx_all, val_all, futs = [], [], []
        pending = None

        def _submit(idx_dev, chunk, n):
            from ..api import rescore_executor

            arr = np.asarray(idx_dev)
            ex = rescore_executor(self)
            for q in range(n):
                futs.append(ex.submit(
                    self._rescore_global, arr[q], chunk[q], kk))

        for start in range(0, len(queries), group_size):
            chunk = queries[start:start + group_size]
            n_real = len(chunk)
            if n_real < group_size:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], group_size - n_real, 0)])
            tabs, scales = zip(*(self._table(q) for q in chunk))
            idx, vals = fn(self._nreal, self._row_ids,
                           jnp.stack(tabs), self._words)
            if threaded:
                if pending is not None:
                    _submit(*pending)
                pending = (idx, chunk, n_real)
                continue
            vals = vals * (jnp.asarray(scales, jnp.float32)[:, None]
                           * self._value_scale)
            if rescore:
                outs = [self._rescore_global(np.asarray(idx[q]), chunk[q], kk)
                        for q in range(n_real)]
                idx = jnp.stack([o[0] for o in outs])
                vals = jnp.stack([o[1] for o in outs])
                idx_all.append(idx)
                val_all.append(vals)
                continue
            if k is not None and k < self._merge_k:
                idx, vals = idx[:, :k], vals[:, :k]
            idx_all.append(idx[:n_real])
            val_all.append(vals[:n_real])
        if threaded:
            if pending is not None:
                _submit(*pending)
            outs = [f.result() for f in futs]
            return (jnp.stack([jnp.asarray(o[0]) for o in outs]),
                    jnp.stack([jnp.asarray(o[1]) for o in outs]))
        return jnp.concatenate(idx_all), jnp.concatenate(val_all)

    @property
    def hbm_bytes(self) -> int:
        return int(np.prod(self._words.shape)) * 4
