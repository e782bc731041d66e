"""Runtime configuration for TPU Top-K SpMV.

The reference design fixes everything at FPGA-synthesis time
(``/root/reference/src/common/types.hpp:20-79``: FIXED_WIDTH, K,
SPMV_PARTITIONS, BSCSR packet geometry, LIMITED_FINISHED_ROWS, ...).
On TPU there is no rebuild wall: all knobs live in one dataclass consumed
at ``jit``-trace time, so a config change costs a recompile (~seconds),
not an overnight place-and-route.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# TPU vector geometry: the VPU operates on (sublane, lane) = (8, 128) tiles
# of 32-bit data. These replace the reference's 512-bit HBM/AXI word
# (BSCSR_PORT_BITWIDTH, types.hpp:71).
LANES = 128
SUBLANES = 32


@dataclasses.dataclass(frozen=True)
class ValueFormat:
    """Reduced-precision storage format of matrix values.

    Mirrors the reference's fixed-point knobs (types.hpp:20-29:
    FIXED_WIDTH/SCALE ap_ufixed and the USE_FLOAT switch). On TPU the
    natural reduced format is bfloat16 (8-bit mantissa, free conversion to
    f32 on the VPU); scaled fixed-point emulation is provided for numerical
    parity testing with the FPGA's ap_ufixed<W,1,AP_TRN_ZERO> arithmetic.
    """

    kind: str = "bf16"          # "f32" | "bf16" | "fixed"
    fixed_width: int = 32       # total bits of the emulated ap_ufixed
    fixed_integer_part: int = 1  # integer bits (reference uses 1)

    @property
    def scale(self) -> int:
        return self.fixed_width - self.fixed_integer_part

    @property
    def bytes_per_value(self) -> int:
        if self.kind == "f32":
            return 4
        if self.kind == "bf16":
            return 2
        return (self.fixed_width + 7) // 8


F32 = ValueFormat("f32")
BF16 = ValueFormat("bf16")
FIXED32 = ValueFormat("fixed", fixed_width=32)
# <=9 significant bits are exactly representable in the bf16 container, so
# FIXED8 gives bit-exact ap_ufixed<8,1> semantics end to end.
FIXED8 = ValueFormat("fixed", fixed_width=8)


@dataclasses.dataclass(frozen=True)
class TopKSpMVConfig:
    """All design knobs of the TPU Top-K SpMV engine.

    Reference counterparts (file:line into /root/reference):
      - k: global Top-K requested by the user (options.hpp:28, default 20;
        benchmarks use 100).
      - lane_k: per-lane running Top-K kept inside the kernel. Plays the
        role of the per-partition K=8 (types.hpp:51) in the FPGA's
        argmin-replacement scheme, except a TPU kernel keeps 128 lane-local
        buffers per partition, so recall at global K=100 is far higher for
        the same lane_k (see eval/accuracy_model.py).
      - num_partitions: row partitions per device, the analog of
        SPMV_PARTITIONS=32 / SUB_SPMV_PARTITIONS=4 (types.hpp:36-38). On
        TPU these map to the kernel's parallel grid axis.
      - value_format: reduced-precision storage (types.hpp:20-29).
      - slice_height: rows per SELL slice = hardware lanes (128).
      - chunk_sublanes: nnz rows per sub-chunk step; slice widths are
        padded to a multiple of this (the analog of BSCSR_PACKET_SIZE
        padding, types.hpp:71-73).
      - block_sublanes: sublanes of packed words processed per Pallas grid
        step (DMA granularity; the analog of the per-pseudo-channel burst).
      - sigma_sort: whether rows are degree-sorted before slicing
        (SELL-C-sigma); keeps slice padding negligible on skewed (gamma)
        degree distributions.
    """

    k: int = 100
    lane_k: int = 8
    num_partitions: int = 1
    value_format: ValueFormat = BF16
    max_cols: int = 1024            # MAX_COLS, types.hpp:55
    slice_height: int = LANES
    chunk_sublanes: int = 8
    block_sublanes: int = 512
    sigma_sort: bool = True
    layout: str = "bucketed"        # the one production format (the
    #   round-1 "streamed" per-chunk-metadata layout was removed in
    #   round 5 — ~2.5x slower on v5e, second-class API coverage; its
    #   exact-semantics oracle survives in ops/xla_ref.py)
    fused_block_sublanes: int = 1024  # uniform DMA block of the fused kernel
    width_quantum: int = 8          # 8, 4, 2 or 1: slice-width granularity
    #   (finer quanta cut width-quantization padding; slices of a
    #    gcd(W,8)-period share boundary chunks, folded with static sublane
    #    splits. quantum 1 admits odd widths — lowest padding, ~2x the
    #    compiled bucket branches)
    query_codec: str = "f32"        # "f32" (exact) | "i8s"/"i4s"/"int8x4"
    #   | "h16" (2 nnz per word: 10-bit col + 6-bit value halves, i4s
    #   query table — halves HBM bytes/nnz; pair with rescore_pool)
    tie_safe_topk: Optional[bool] = None  # True: keep first-of-ties in the
    #   lane Top-K buffers (the reference's exact argmin semantics) at ~9%
    #   kernel cost; False may keep only one of an exactly-tied pair.
    #   None (default) resolves at construction: True for tie-heavy score
    #   domains — the h16 codec without a rescore pool (small-integer
    #   scores, exact min-ties common) — and False otherwise (continuous
    #   scores, or a rescore pool that re-ranks exactly anyway). Set True
    #   explicitly for tie-heavy data such as pattern (-v) matrices.
    rescore_pool: Optional[int] = None  # exact rescoring: keep the host CSR
    #   at build time and, per query, re-rank the top max(k, rescore_pool)
    #   device candidates with exact f32 dot products. Restores ~exact
    #   ranking for the quantized query codecs (i4s sweeps at the HBM
    #   streaming ceiling but ranks at ~0.92 precision alone; with a 4-8x k
    #   pool the true top-k is almost surely inside the candidate set).
    #   The reference's analog is the host-side merge being the accuracy
    #   backstop for per-partition approximation (topk_errors.py:29-42).
    fused_layout: str = "slice"     # fused-stream word order:
    #   "slice" — a slice's W words on W consecutive sublanes (the
    #     original layout; kernel folds each slice across sublanes and
    #     splits period-boundary chunks for quantum<8 widths).
    #   "octet" — slice-TRANSPOSED: chunk j holds word j of EIGHT strided
    #     slices, one per sublane (formats/sell_buckets.fuse_buckets_octet)
    #     so the kernel body is pure `acc += decode(chunk)`: no sublane
    #     reductions, no boundary splits, and ANY width streams whole
    #     chunks (pair with width_quantum=1 for floor padding). The
    #     harvest is intrinsically a strided top-2-of-8 fold (fold_tile=8
    #     semantics); fold_tile=1 selects exact per-member folds.
    octet_multicall: bool = True    # octet single-query dispatch: one
    #   pallas_call PER bucket (single static width, zero bucket range
    #   predicates, block ranges via index_map offsets) + one per-lane
    #   top-K merge of the stacked candidates. Measured +2.5% over the
    #   single fused call on the 10M headline corpus (177.8 vs 173.5
    #   Gnnz/s — experiments/octet_multicall_lab.py): the per-grid-step
    #   predicate chain costs more than B pipeline-ramp restarts. False
    #   keeps the one-call kernel (always used when num_partitions > 1:
    #   the partitioned grid carries the partition axis in one call).
    fold_tile: int = 1              # slices buffered per Top-K fold in the
    #   fused kernel. 1 = exact per-slice argmin replacement. 2/4/8 buffer
    #   that many consecutive slice scores in VMEM scratch and fold ONE
    #   per-lane tile maximum (plus its slice id) — ~3x cheaper fold at the
    #   cost of keeping at most one candidate per (lane, tile): the TPU
    #   analog of the reference's LIMITED_FINISHED_ROWS per-packet cap
    #   (types.hpp:77), with the same remedy — the host merge/rescore pool
    #   absorbs the rare collision (topk_errors.py:29-42). Use with
    #   rescore_pool (bench.py production mode: fold_tile=8, pool=400).
    batch_subgroup: int = 0         # multi-query kernels: queries whose
    #   accumulators are live at once (0 = the whole group). Each chunk's
    #   query-independent decode (ops/kernel._codec_split) is shared
    #   within a sub-group and recomputed across sub-groups. Measured on
    #   v5e: all-live wins at EVERY group size (no register cliff even at
    #   64 live (8,128) accumulators — 258.5 vs 250.2 Gnnz/s/query at
    #   Q=64 with sub-groups of 8; sub-groups of 4 cost ~15% at Q=8).
    #   Keep 0 unless a future geometry shows spills.
    interpret: Optional[bool] = None  # None = auto (interpret off-TPU)

    def __post_init__(self):
        if self.tie_safe_topk is None:
            # ONE tie behavior per engine, every kernel honors it (see
            # tie_safe_topk docstring for the resolution rule).
            object.__setattr__(
                self, "tie_safe_topk",
                self.query_codec == "h16" and not self.rescore_pool)
        if self.layout != "bucketed":
            raise ValueError(
                f"unknown layout {self.layout!r}: 'bucketed' is the one "
                "production format (the 'streamed' layout was removed; "
                "its oracle lives in ops/xla_ref.py)")
        if self.max_cols % LANES != 0:
            raise ValueError(f"max_cols must be a multiple of {LANES}")
        if self.block_sublanes % self.chunk_sublanes != 0:
            raise ValueError("block_sublanes must be a multiple of chunk_sublanes")
        if self.slice_height != LANES:
            raise ValueError("slice_height must equal the TPU lane count (128)")
        if self.query_codec == "i8s" and self.max_cols > 1024:
            raise ValueError("i8s codec supports max_cols <= 1024 "
                             "(table-row select is a single sign bit)")
        if self.query_codec == "i4s" and self.max_cols > 2048:
            raise ValueError("i4s codec supports max_cols <= 2048")
        if self.query_codec == "h16" and self.max_cols > 1024:
            raise ValueError("h16 codec supports max_cols <= 1024 "
                             "(10-bit column field)")
        if self.query_codec not in ("f32", "int8x4", "i8s", "i4s", "h16"):
            raise ValueError(f"unknown query codec {self.query_codec!r}")
        if self.width_quantum not in (1, 2, 4, 8):
            raise ValueError("width_quantum must be 1, 2, 4 or 8")
        if self.fold_tile not in (1, 2, 4, 8):
            raise ValueError("fold_tile must be 1, 2, 4 or 8")
        if self.fused_layout not in ("slice", "octet"):
            raise ValueError("fused_layout must be 'slice' or 'octet'")
        if (self.fused_layout == "octet" and self.num_partitions > 1
                and not self.sigma_sort):
            raise ValueError(
                "fused_layout='octet' with num_partitions>1 requires "
                "sigma_sort=True: the shared partition skeleton cannot "
                "hold duplicate bucket widths in the transposed stream "
                "(unsorted rows produce positional same-width buckets)")
        if self.fused_layout == "octet" and self.fold_tile in (2, 4):
            raise ValueError(
                "the octet layout's fold is intrinsically top-2-of-8 "
                "(fold_tile=8) or exact (fold_tile=1); 2/4 are not "
                "expressible in the transposed stream")
        if self.batch_subgroup < 0:
            raise ValueError("batch_subgroup must be >= 0")

    @property
    def col_groups(self) -> int:
        """Number of 128-wide column groups the query table is split into."""
        return self.max_cols // LANES


DEFAULT_CONFIG = TopKSpMVConfig()
