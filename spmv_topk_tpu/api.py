"""User-facing facade: matrix-resident Top-K SpMV engine.

Mirrors the lifecycle of the reference's `SpMV` struct
(/root/reference/src/fpga/src/host_spmv_bscsr.cpp:79-485):

  reference                      | here
  -------------------------------+------------------------------------------
  SpMV ctor: partition + BS-CSR  | TopKSpMV(matrix, config): SELL pack +
  pack + OpenCL buffer setup     | device_put (matrix stays HBM-resident)
  reset(vec): re-upload query    | nothing to do — the query is a plain
  (host_spmv_bscsr.cpp:450-484)  | argument, uploaded per call (~KB)
  operator()(): enqueue 8 CUs    | query(vec): one fused Pallas kernel
  read_result(): host merge      | finalize_topk on device (lax.top_k)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import LANES, TopKSpMVConfig, DEFAULT_CONFIG
from .formats.coo import CooMatrix
from .ops.kernel import finalize_topk


def exact_rescore(csr, idx, vec, k):
    """Exact top-k among candidate rows `idx` by f32 CSR dot products.

    csr: scipy CSR of the full matrix; idx: candidate rows (−1 = padding);
    returns (indices, values) of length k, sorted descending, padded with
    (−1, −inf) if fewer than k valid candidates.

    Hot path of the serving loop: a direct gather over (indptr, indices,
    data) — scipy's `csr[rows]` fancy indexing materializes a new sparse
    matrix and costs ~0.5 ms for a 400-row pool vs ~30 us here."""
    idx = np.asarray(idx)
    # dedupe: when the requested pool exceeds the valid candidate count,
    # masked (-inf) merge slots surface row ids that alias real candidates
    rows = np.unique(idx[idx >= 0]).astype(np.int64)
    vec = np.ascontiguousarray(vec, np.float32)
    out_i = np.full(k, -1, np.int32)
    out_v = np.full(k, -np.inf, np.float32)
    if len(rows) == 0:
        return out_i, out_v
    # normalize the CSR arrays once per matrix (scipy may hold int32
    # indptr / f64 data); cached on the csr object
    cache = getattr(csr, "_spmv_tpu_norm", None)
    if cache is None:
        cache = (np.ascontiguousarray(csr.indptr, np.int64),
                 np.ascontiguousarray(csr.indices, np.int32),
                 np.ascontiguousarray(csr.data, np.float32))
        csr._spmv_tpu_norm = cache
    indptr, indices, data = cache

    from .utils import native

    exact = native.csr_rescore(indptr, indices, data, vec, rows)
    if exact is None:  # NumPy fallback (differential oracle in tests)
        starts = indptr[rows]
        lens = indptr[rows + 1] - starts
        offs = np.concatenate(([0], np.cumsum(lens[:-1])))
        total = int(offs[-1] + lens[-1])
        gather = (np.arange(total, dtype=np.int64)
                  - np.repeat(offs, lens) + np.repeat(starts, lens))
        prod = data[gather] * vec[indices[gather]]
        # segment sums via cumsum difference (robust to zero-length rows,
        # unlike np.add.reduceat)
        csum = np.concatenate(([0.0], np.cumsum(prod, dtype=np.float64)))
        exact = (csum[offs + lens] - csum[offs]).astype(np.float32)
    order = np.argsort(-exact, kind="stable")[:k]
    out_i[: len(order)] = rows[order]
    out_v[: len(order)] = exact[order]
    return out_i, out_v


def _auto_interpret(cfg: TopKSpMVConfig) -> bool:
    if cfg.interpret is not None:
        return cfg.interpret
    return jax.default_backend() not in ("tpu",)


class TopKSpMV:
    """Matrix-resident approximate Top-K SpMV engine (single device).

    For multi-device / multi-host operation see
    spmv_topk_tpu.parallel.ShardedTopKSpMV.
    """

    def __init__(
        self,
        matrix,
        config: TopKSpMVConfig = DEFAULT_CONFIG,
        device: Optional[jax.Device] = None,
    ):
        if not isinstance(matrix, CooMatrix):
            from .formats.coo import from_scipy

            matrix = from_scipy(matrix)
        if config.max_cols < matrix.num_cols:
            import dataclasses

            config = dataclasses.replace(
                config, max_cols=-(-matrix.num_cols // LANES) * LANES
            )
        self.config = config
        self.num_rows = matrix.num_rows
        self.num_cols = matrix.num_cols
        self.num_nnz = matrix.nnz
        self._interpret = _auto_interpret(config)
        device = device or jax.devices()[0]
        self.device = device

        self._scipy_csr = None
        if config.rescore_pool:
            # keep the exact matrix host-side for candidate re-ranking.
            # Wrap the (data, indices, indptr) triple directly: scipy's
            # COO->CSR conversion materializes a full copy (~20 GB at 2G
            # nnz), while the sorted COO's arrays can back the CSR as-is
            # (duplicate (row, col) entries stay separate — the rescore
            # dot sums them, same semantics).
            self._scipy_csr = matrix.to_scipy_csr()

        if config.num_partitions > 1:
            # P row partitions on a parallel grid axis (megacore): the
            # analog of the reference's CU hierarchy (types.hpp:36-38).
            from .formats.sell_buckets import pack_fused_partitions

            self.sell = None  # per-bucket layout not kept (scores() n/a)
            self.fused = pack_fused_partitions(
                matrix, config, config.num_partitions,
                octet=config.fused_layout == "octet")
            self._value_scale = self.fused.value_scale
            self._fwords = jax.device_put(self.fused.words, device)
            self._fnreal = jax.device_put(self.fused.nreal, device)
            self._row_ids = jax.device_put(self.fused.row_ids, device)
            self._bwords_cache = None

        else:
            from .formats.sell_buckets import (pack_sell_buckets,
                                               fuse_buckets,
                                               fuse_buckets_octet)

            self.sell = pack_sell_buckets(matrix, config)
            fuse = (fuse_buckets_octet if config.fused_layout == "octet"
                    else fuse_buckets)
            self.fused = fuse(
                self.sell, block_sublanes=config.fused_block_sublanes)
            self._value_scale = self.fused.value_scale
            self._fwords = jax.device_put(self.fused.words, device)
            self._fnreal = jax.device_put(self.fused.nreal, device)
            self._row_ids = jax.device_put(self.sell.row_ids, device)
            self._bwords_cache = None


    def save(self, path: str) -> None:
        """Persist the packed engine (fused stream + plan + config).

        The reference re-packs the matrix on every process start (SpMV
        ctor, host_spmv_bscsr.cpp:104-125); here packing a 20M-nnz corpus
        costs ~15 s, so serving deployments pack once and `load()` in the
        time it takes to mmap + device_put the stream."""
        import dataclasses
        import json

        f = self.fused
        if self.config.fused_layout == "octet":
            plan_arr = np.array(
                [[p.width, p.octets_per_block, p.blocks_per_octet,
                  p.stride, p.slice_base, p.blk_start, p.num_blocks]
                 for p in f.plan], np.int64)
        else:
            plan_arr = np.array(
                [[p.width, p.slices_per_block, p.blocks_per_slice,
                  p.slice_base, p.blk_start, p.num_blocks] for p in f.plan],
                np.int64)
        cfg = dataclasses.asdict(self.config)
        meta = dict(config=cfg, block_sublanes=f.block_sublanes,
                    num_blocks=f.num_blocks, num_rows=f.num_rows,
                    num_cols=f.num_cols, num_nnz=f.num_nnz,
                    value_scale=f.value_scale, format_version=2)
        if self.config.num_partitions > 1:
            # partition-major stream (PartitionedFusedMatrix): the extra
            # geometry needed to rebuild the part kernel's layout
            meta["num_partitions"] = f.num_partitions
            meta["part_slices"] = f.part_slices
        # explicit file handle: np.savez(str) appends '.npz' when the
        # suffix is missing, but load() opens the literal path
        with open(path, "wb") as fh:
            np.savez(fh, words=f.words, nreal=f.nreal, row_ids=f.row_ids,
                     plan=plan_arr, meta=np.frombuffer(
                         json.dumps(meta).encode(), np.uint8))

    @classmethod
    def load(cls, path: str, device: Optional[jax.Device] = None,
             matrix=None):
        """Reconstruct an engine saved with save() (incl. partitioned
        engines). query()/query_batch()/scores() all work on the loaded
        engine; exact rescoring needs the source matrix — pass it as
        `matrix=` (CooMatrix or scipy) to reattach the host CSR and keep
        the snapshot's rescore_pool armed, otherwise rescoring is
        disabled (see the warning below)."""
        import json

        from .config import TopKSpMVConfig, ValueFormat
        from .formats.sell_buckets import (FusedBucket, FusedSellMatrix,
                                           OctetBucket,
                                           PartitionedFusedMatrix)

        z = np.load(path)
        meta = json.loads(bytes(z["meta"]).decode())
        cfg_d = dict(meta["config"])
        cfg_d["value_format"] = ValueFormat(**cfg_d["value_format"])
        if cfg_d.get("rescore_pool") and matrix is None:
            # the snapshot holds only the packed stream, not the source
            # CSR the rescore needs — serve un-rescored rather than arm a
            # crash in the default query() path (pass matrix= to rescore)
            import warnings

            warnings.warn(
                "loaded engine has no host CSR: rescore_pool disabled "
                "(pass matrix= to load() to restore exact rescoring)",
                stacklevel=2)
            cfg_d["rescore_pool"] = None
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
        if meta.get("num_partitions", 1) > 1:
            fused = PartitionedFusedMatrix(
                words=z["words"], plan=plan, nreal=z["nreal"],
                row_ids=z["row_ids"],
                num_partitions=meta["num_partitions"],
                part_slices=meta["part_slices"],
                block_sublanes=meta["block_sublanes"],
                num_blocks=meta["num_blocks"],
                num_rows=meta["num_rows"], num_cols=meta["num_cols"],
                num_nnz=meta["num_nnz"],
                value_scale=meta.get("value_scale", 1.0))
        else:
            fused = FusedSellMatrix(
                words=z["words"], plan=plan, nreal=z["nreal"],
                block_sublanes=meta["block_sublanes"],
                num_blocks=meta["num_blocks"], row_ids=z["row_ids"],
                num_rows=meta["num_rows"], num_cols=meta["num_cols"],
                num_nnz=meta["num_nnz"],
                value_scale=meta.get("value_scale", 1.0))

        self = cls.__new__(cls)
        self.config = config
        self.num_rows = fused.num_rows
        self.num_cols = fused.num_cols
        self.num_nnz = fused.num_nnz
        self._interpret = _auto_interpret(config)
        self.device = device or jax.devices()[0]
        self._scipy_csr = None  # exact rescoring needs the source matrix
        if matrix is not None and config.rescore_pool:
            if not isinstance(matrix, CooMatrix):
                from .formats.coo import from_scipy

                matrix = from_scipy(matrix)
            self._scipy_csr = matrix.to_scipy_csr()
        self.sell = None  # per-bucket layout not persisted
        self.fused = fused
        self._value_scale = fused.value_scale
        self._fwords = jax.device_put(fused.words, self.device)
        self._fnreal = jax.device_put(fused.nreal, self.device)
        self._row_ids = jax.device_put(fused.row_ids, self.device)
        self._bwords_cache = None
        return self

    @property
    def _bwords(self):
        """Per-bucket device arrays (lazy: only scores() needs them)."""
        if self.sell is None:
            raise NotImplementedError(
                "scores() needs the per-bucket layout, which load()ed "
                "snapshots and num_partitions>1 engines do not keep — "
                "rebuild from the matrix with num_partitions=1 to use it")
        if self._bwords_cache is None:
            self._bwords_cache = [
                jax.device_put(b.words, self.device)
                for b in self.sell.buckets
            ]
            self._bnreal = [
                jax.device_put(np.array([[b.num_slices]], np.int32),
                               self.device)
                for b in self.sell.buckets
            ]
        return self._bwords_cache

    def candidates_traceable(self, table):
        """(topv, topt) from a device-resident (num_groups, 128) table;
        safe to call inside jit/scan (the matrix arrays are captured)."""
        octet = self.config.fused_layout == "octet"
        if self.config.num_partitions > 1:
            from .ops.kernel import (topk_spmv_fused_part_device,
                                     topk_spmv_fused_octet_part_device)

            dev = (topk_spmv_fused_octet_part_device if octet
                   else topk_spmv_fused_part_device)
            return dev(
                self._fwords, table, self._fnreal, cfg=self.config,
                plan=self.fused.plan,
                block_sublanes=self.fused.block_sublanes,
                num_blocks=self.fused.num_blocks,
                num_partitions=self.fused.num_partitions,
                part_slices=self.fused.part_slices,
                interpret=self._interpret, codec=self.config.query_codec,
            )
        from .ops.kernel import (topk_spmv_fused_device,
                                 topk_spmv_fused_octet_device)

        dev = (topk_spmv_fused_octet_device if octet
               else topk_spmv_fused_device)
        return dev(
            self._fwords, table, self._fnreal, cfg=self.config,
            plan=self.fused.plan,
            block_sublanes=self.fused.block_sublanes,
            num_blocks=self.fused.num_blocks,
            interpret=self._interpret, codec=self.config.query_codec,
        )

    # -- query path ---------------------------------------------------------

    def _table(self, vec: np.ndarray):
        """Device query table + score scale factor (1.0 for exact codecs)."""
        vec = np.asarray(vec, dtype=np.float32)
        if vec.shape != (self.num_cols,):
            raise ValueError(
                f"query must have shape ({self.num_cols},), got {vec.shape}"
            )
        padded = np.zeros(self.config.max_cols, np.float32)
        padded[: self.num_cols] = vec
        from .ops.quantized_query import pack_query_table

        tab, scale = pack_query_table(padded, self.config.query_codec)
        return jax.device_put(tab, self.device), scale

    def candidates(self, vec) -> tuple[jax.Array, jax.Array]:
        """Per-lane Top-K candidates (topv, topt) before the global merge.
        Values are unscaled when query_codec is quantized.

        No extra jit wrapper: the device functions underneath are jitted
        with the matrix arrays as explicit arguments — wrapping the
        capturing closure in jax.jit would bake the (possibly GB-scale)
        word stream into the compiled program as a constant."""
        table, self._last_scale = self._table(vec)
        return self.candidates_traceable(table)

    def _rescore(self, idx, vec, k):
        """Exact top-k among candidate rows `idx` by f32 CSR dot products.

        The device sweep (possibly with a quantized query codec) proposes
        a pool of max(k, rescore_pool) rows; the true ranking is restored
        here with exact arithmetic — the same shape as the reference's
        host merge being the accuracy backstop over per-partition
        approximation (host_spmv_bscsr.cpp:399-448)."""
        if self._scipy_csr is None:
            raise NotImplementedError(
                "exact rescoring needs the host CSR: construct the engine "
                "from the matrix with config.rescore_pool set (load()ed "
                "snapshots do not carry it)")
        return exact_rescore(self._scipy_csr, idx, vec, k)

    def query(self, vec, k: Optional[int] = None,
              rescore_pool: Optional[int] = None):
        """Top-K rows by A @ vec: returns (indices, values), sorted desc.

        rescore_pool (default config.rescore_pool): when set, the device
        candidates are widened to max(k, rescore_pool) and exactly
        re-ranked on the host CSR — with a quantized codec (i4s/i8s) this
        restores ~exact ranking while the sweep runs at codec speed."""
        k = k or self.config.k
        if rescore_pool is None:  # 0 disables explicitly
            rescore_pool = self.config.rescore_pool
        topv, topt = self.candidates(vec)
        pool = max(k, rescore_pool) if rescore_pool else k
        idx, vals = finalize_topk(topv, topt, self._row_ids, k=pool)
        if rescore_pool:
            ri, rv = self._rescore(np.asarray(idx), vec, k)
            # jax.Array return on every path (the rescore computes on host)
            return jnp.asarray(ri), jnp.asarray(rv)
        scale = self._last_scale * self._value_scale
        if scale != 1.0:
            vals = vals * scale
        return idx, vals

    def batch_candidates_traceable(self, tables):
        """(Q, K, 128) candidates from stacked (Q, rows, 128) tables —
        (Q, P, K, 128) on partitioned engines (finalize flattens P)."""
        octet = self.config.fused_layout == "octet"
        if self.config.num_partitions > 1:
            from .ops.kernel import (topk_spmv_fused_batch_part_device,
                                     topk_spmv_fused_batch_octet_part_device)

            dev = (topk_spmv_fused_batch_octet_part_device if octet
                   else topk_spmv_fused_batch_part_device)
            return dev(
                self._fwords, tables, self._fnreal, cfg=self.config,
                plan=self.fused.plan,
                block_sublanes=self.fused.block_sublanes,
                num_blocks=self.fused.num_blocks,
                num_partitions=self.fused.num_partitions,
                part_slices=self.fused.part_slices,
                interpret=self._interpret, codec=self.config.query_codec,
            )
        from .ops.kernel import (topk_spmv_fused_batch_device,
                                 topk_spmv_fused_batch_octet_device)

        dev = (topk_spmv_fused_batch_octet_device if octet
               else topk_spmv_fused_batch_device)
        return dev(
            self._fwords, tables, self._fnreal, cfg=self.config,
            plan=self.fused.plan,
            block_sublanes=self.fused.block_sublanes,
            num_blocks=self.fused.num_blocks,
            interpret=self._interpret, codec=self.config.query_codec,
        )

    def query_batch(self, queries, k: Optional[int] = None,
                    group_size: int = 8,
                    rescore_pool: Optional[int] = None):
        """Batched queries (Q, C) -> (Q, k) indices and values.

        The SpMM analog of multi_spmv_gold (gold_algorithms.hpp:21-35): a
        multi-query kernel decodes each matrix block once and amortizes the
        HBM stream across `group_size` queries. rescore_pool: see query().
        """
        user_k = k or self.config.k
        if rescore_pool is None:  # 0 disables explicitly
            rescore_pool = self.config.rescore_pool
        k = max(user_k, rescore_pool) if rescore_pool else user_k
        queries = np.asarray(queries, dtype=np.float32)

        # batch_candidates_traceable needs no jit wrapper (the device
        # function takes the word stream as an explicit jitted argument —
        # see candidates()); only the vmapped finalize is wrapped here.
        if getattr(self, "_jit_batch_k", None) != k:
            self._jit_batch_finalize = jax.jit(jax.vmap(
                lambda tv, tt, rid: finalize_topk(tv, tt, rid, k=k),
                in_axes=(0, 0, None)))
            self._jit_batch_k = k

        Qtot = len(queries)
        idx_all, val_all, futs = [], [], []
        pending = None  # previous group's device candidates (rescore mode)

        def _submit(idx_dev, q0, n):
            # Forcing the PREVIOUS group's candidates here overlaps its
            # host rescore with the current group's device sweep (the
            # reference overlaps readback the same way,
            # host_spmv_bscsr.cpp:354-397); the thread pool then re-ranks
            # the group's queries concurrently (native csr_rescore is
            # stateless and releases the GIL).
            arr = np.asarray(idx_dev)
            ex = self._rescore_executor()
            for j in range(n):
                futs.append(ex.submit(
                    self._rescore, arr[j], queries[q0 + j], user_k))

        for start in range(0, Qtot, group_size):
            chunk = queries[start:start + group_size]
            n_real = len(chunk)
            if n_real < group_size:  # pad the tail group (static shapes)
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], group_size - n_real, 0)])
            padded = np.zeros((group_size, self.config.max_cols), np.float32)
            padded[:, : self.num_cols] = chunk
            from .ops.quantized_query import pack_query_tables

            tabs, scales = pack_query_tables(padded,
                                             self.config.query_codec)
            tv, tt = self.batch_candidates_traceable(
                jax.device_put(jnp.asarray(tabs), self.device))
            idx, vals = self._jit_batch_finalize(tv, tt, self._row_ids)
            if rescore_pool:
                if pending is not None:
                    _submit(*pending)
                pending = (idx, start, n_real)
                continue
            vals = vals * (jnp.asarray(scales, jnp.float32)[:, None]
                           * self._value_scale)
            idx_all.append(idx[:n_real])
            val_all.append(vals[:n_real])
        if rescore_pool:
            if pending is not None:
                _submit(*pending)
            outs = [f.result() for f in futs]
            return (jnp.stack([jnp.asarray(o[0]) for o in outs]),
                    jnp.stack([jnp.asarray(o[1]) for o in outs]))
        return jnp.concatenate(idx_all), jnp.concatenate(val_all)

    def _rescore_executor(self):
        return rescore_executor(self)

    def scores(self, vec) -> np.ndarray:
        """Full dense result A @ vec in original row order (no Top-K).

        The plain-SpMV path, parity with the reference's SpMV-only hosts
        (host_spmv_csr_gpu.cu:171-231). Runs the fused scores kernel over
        the same stream the Top-K sweep uses, so it works for every
        bucketed configuration — any width_quantum, partitioned engines,
        and load()ed snapshots. Exact for the f32 and h16 codecs (h16
        matrix values are 6-bit quantized, like the sweep); quantized
        QUERY codecs (i8s/i4s/int8x4) return codec-precision scores.
        Materializes N floats — prefer query() for similarity lookup."""
        from .ops.kernel import (spmv_fused_scores_device,
                                 spmv_fused_scores_octet_device)

        octet = self.config.fused_layout == "octet"
        S = self.config.chunk_sublanes
        P = self.config.num_partitions
        dev = spmv_fused_scores_octet_device if octet \
            else spmv_fused_scores_device
        table, scale = self._table(vec)
        out = np.asarray(dev(
            self._fwords, table, cfg=self.config, plan=self.fused.plan,
            block_sublanes=self.fused.block_sublanes,
            num_blocks=self.fused.num_blocks, num_partitions=P,
            interpret=self._interpret, codec=self.config.query_codec,
        ))                                  # (P, num_blocks, max_rows, 128)
        res = np.zeros(self.num_rows, np.float32)
        row_ids = self.fused.row_ids
        nreal = self.fused.nreal            # (B, 1) or (P, B, 1)
        total = scale * self._value_scale
        part_rows = row_ids.shape[0] // P   # part_slices (incl. sentinel)
        for p in range(P):
            nr = nreal[p, :, 0] if P > 1 else nreal[:, 0]
            r0 = p * part_rows
            for bi, pb in enumerate(self.fused.plan):
                nsl = int(nr[bi])
                if nsl == 0:
                    continue
                b0, nb = pb.blk_start, pb.num_blocks
                if octet:
                    # member row m of octet o holds slice o + m*stride:
                    # transpose (o, m) -> (m, o) so the flat index IS the
                    # in-bucket slice id (see _fused_scores_kernel_octet)
                    G = pb.stride
                    if pb.blocks_per_octet == 1:
                        opb = pb.octets_per_block
                        sc = out[p, b0:b0 + nb, :opb * S].reshape(
                            -1, S, LANES)[:G]
                    else:
                        bpo = pb.blocks_per_octet
                        sc = out[p, b0 + bpo - 1:b0 + nb:bpo, :S][:G]
                    sc = np.ascontiguousarray(
                        sc.transpose(1, 0, 2)).reshape(-1, LANES)[:nsl]
                elif pb.blocks_per_slice == 1:
                    sc = out[p, b0:b0 + nb, :pb.slices_per_block].reshape(
                        -1, LANES)[:nsl]
                else:  # wide slices: score lands at the span's last block
                    bps = pb.blocks_per_slice
                    sc = out[p, b0 + bps - 1:b0 + nb:bps, 0][:nsl]
                ids = row_ids[r0 + pb.slice_base:
                              r0 + pb.slice_base + nsl]
                real = ids >= 0
                res[ids[real]] = sc[real] * total
        return res

    # -- accounting ---------------------------------------------------------

    @property
    def hbm_bytes(self) -> int:
        """Bytes actually streamed per query sweep (the fused stream)."""
        return self.fused.hbm_bytes

    @property
    def bytes_per_nnz(self) -> float:
        return self.hbm_bytes / max(self.num_nnz, 1)


def rescore_executor(holder):
    """Lazily-created thread pool for batched host rescoring, cached on
    `holder` (an engine instance; shared with the sharded engine)."""
    ex = getattr(holder, "_rescore_ex", None)
    if ex is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(
            max_workers=min(16, os.cpu_count() or 8),
            thread_name_prefix="rescore")
        holder._rescore_ex = ex
    return ex
