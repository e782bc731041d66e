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
from .formats.sell import SellMatrix, pack_sell
from .ops.kernel import topk_spmv_sell_device, finalize_topk


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
        self.sell: SellMatrix = pack_sell(matrix, config)
        self._interpret = _auto_interpret(config)

        device = device or jax.devices()[0]
        cpb = config.block_sublanes // config.chunk_sublanes
        self._words = jax.device_put(self.sell.words, device)
        self._meta3d = jax.device_put(
            self.sell.meta.reshape(-1, 1, cpb), device
        )
        self._row_ids = jax.device_put(self.sell.row_ids, device)
        self.device = device

    # -- query path ---------------------------------------------------------

    def _table(self, vec: np.ndarray) -> jax.Array:
        vec = np.asarray(vec, dtype=np.float32)
        if vec.shape != (self.num_cols,):
            raise ValueError(
                f"query must have shape ({self.num_cols},), got {vec.shape}"
            )
        padded = np.zeros(self.config.max_cols, np.float32)
        padded[: self.num_cols] = vec
        return jax.device_put(padded.reshape(-1, LANES), self.device)

    def candidates(self, vec) -> tuple[jax.Array, jax.Array]:
        """Per-lane Top-K candidates (topv, topt) before the global merge."""
        return topk_spmv_sell_device(
            self._words, self._meta3d, self._table(vec),
            cfg=self.config, interpret=self._interpret,
        )

    def query(self, vec, k: Optional[int] = None):
        """Top-K rows by A @ vec: returns (indices, values), sorted desc."""
        k = k or self.config.k
        topv, topt = self.candidates(vec)
        idx, vals = finalize_topk(topv, topt, self._row_ids, k=k)
        return idx, vals

    def query_batch(self, queries, k: Optional[int] = None):
        """Batched queries (Q, C) -> (Q, k) indices and values.

        The SpMM analog of multi_spmv_gold (gold_algorithms.hpp:21-35).
        Currently iterates the fused kernel per query; a dedicated
        multi-query kernel amortizes the matrix stream across queries.
        """
        k = k or self.config.k
        idxs, vals = [], []
        for q in np.asarray(queries):
            i, v = self.query(q, k)
            idxs.append(i)
            vals.append(v)
        return jnp.stack(idxs), jnp.stack(vals)

    # -- accounting ---------------------------------------------------------

    @property
    def hbm_bytes(self) -> int:
        return self.sell.hbm_bytes

    @property
    def bytes_per_nnz(self) -> float:
        return self.sell.hbm_bytes / max(self.num_nnz, 1)
