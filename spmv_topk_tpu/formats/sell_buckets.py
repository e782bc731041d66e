"""Bucketed uniform-width SELL-128: the fast device layout.

Measurement on TPU v5e showed that per-sub-chunk scalar-conditioned folds
(`pl.when` on an SMEM metadata word, sell.py's streamed layout) stall the
vector pipeline ~2.5x. This layout removes ALL dynamic control flow from
the kernel:

  - slices are already degree-sorted (sigma-sort), so slices with equal
    padded width W form contiguous runs; W is quantized to a ~1.25-ratio
    ladder and each run becomes a *bucket*;
  - within a bucket every slice has the same static W, so the fold cadence
    (one row-sum + Top-K update per slice) is compile-time constant: no
    metadata stream, no SMEM reads, no branches, and the slice accumulator
    lives in vector registers instead of scratch;
  - each bucket is one pallas_call with its own grid; per-bucket candidate
    buffers are concatenated before the global merge.

This plays the role of the reference's single fixed BSCSR packet geometry
(types.hpp:61-73) — where the FPGA fixes B at synthesis time for all data,
the TPU fixes W per degree-bucket at trace time.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import LANES, TopKSpMVConfig, DEFAULT_CONFIG
from .coo import CooMatrix
from ..ops.fixedpoint import quantize as quantize_values, bf16_bits

# Quantized slice widths: multiples of the 8-sublane chunk with ~1.25
# geometric spacing above 64 (bounded padding from quantization).
W_LADDER = [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
            224, 256, 320, 384, 448, 512, 640, 768, 896, 1024, 1280, 1536,
            1792, 2048, 2560, 3072, 4096, 8192, 16384, 32768]

# Quantum-4 ladder: every multiple of 4 below 128 (a slice pair spans a
# whole number of 8-sublane chunks; the kernel folds the shared boundary
# chunk with static masks). Halves the width-quantization padding on
# low-degree corpora (1.18 -> 1.08 on gamma deg-20).
W_LADDER_Q4 = sorted(set(list(range(4, 129, 4)) + W_LADDER))

# Quantum-2 ladder: every even width below 32, multiples of 4 to 64,
# multiples of 8 beyond (relative quantization waste stays <= ~6%). A
# PERIOD of 8/gcd(W,8) consecutive slices spans whole chunks, so the
# fused kernel folds boundary chunks with static sublane splits — cuts
# the gamma deg-20 h16 padding 0.63 -> 0.58 words/nnz at 512-sublane
# blocks (the TPU counterpart of the reference's tighter 20-bit packets
# raising B from 11 to 15, types.hpp:71-73).
W_LADDER_Q2 = sorted(set(
    list(range(2, 33, 2)) + list(range(32, 65, 4)) + W_LADDER_Q4))

# Quantum-1 ladder: EVERY width below 32 (odd widths fold with Ps=8-slice
# periods), even to 64, multiples of 4 to 128, of 8 beyond. On the 10M-row
# gamma deg-20 h16 corpus this removes most of the remaining width-
# quantization waste: 0.551 -> 0.528 words/nnz at 1024-sublane blocks
# (simulated from the degree profile; the 0.513 floor is odd-degree rows'
# half-empty last word). Costs ~2x the bucket count (compiled branches).
W_LADDER_Q1 = sorted(set(
    list(range(1, 33)) + list(range(32, 65, 2)) + list(range(64, 129, 4))
    + W_LADDER_Q2))


def _quantize_w(w: int, quantum: int = 8) -> int:
    ladder = (W_LADDER_Q1 if quantum == 1
              else W_LADDER_Q2 if quantum == 2
              else W_LADDER_Q4 if quantum == 4 else W_LADDER)
    for q in ladder:
        if w <= q:
            return q
    return -(-w // 8) * 8


@dataclasses.dataclass
class SellBucket:
    """One uniform-W run of slices."""

    words: np.ndarray        # (num_blocks * block_sublanes, 128) int32
    width: int               # W: sublanes per slice (static)
    block_sublanes: int      # sublanes per grid block (multiple of W)
    num_blocks: int
    slice_base: int          # global index of the bucket's first slice
    num_slices: int          # real slices (before block padding)

    @property
    def slices_per_block(self) -> int:
        return self.block_sublanes // self.width


@dataclasses.dataclass
class BucketedSellMatrix:
    buckets: list
    row_ids: np.ndarray      # (num_slices_total + 1, 128); last row all -1
    num_rows: int
    num_cols: int
    num_nnz: int
    config: TopKSpMVConfig
    value_scale: float = 1.0  # h16: global 6-bit value quantization scale
    #   (scores from the kernel are integer sums; multiply by
    #   value_scale * query_scale to recover dot-product units)

    @property
    def num_slices(self) -> int:
        return self.row_ids.shape[0] - 1

    @property
    def hbm_bytes(self) -> int:
        return sum(int(b.words.nbytes) for b in self.buckets)

    @property
    def padded_nnz(self) -> int:
        return sum(b.words.shape[0] * LANES for b in self.buckets)

    @property
    def padding_ratio(self) -> float:
        return self.padded_nnz / max(self.num_nnz, 1)


@dataclasses.dataclass(frozen=True)
class FusedBucket:
    """Static descriptor of one bucket inside the fused block stream.

    Hashable: the tuple of these is a static argument of the fused kernel.
    Exactly one of (slices_per_block >= 1) or (blocks_per_slice > 1) modes
    applies: narrow buckets (width <= block) hold spb slices per block;
    wide buckets (width > block) span bps blocks per slice.
    """

    width: int
    slices_per_block: int
    blocks_per_slice: int
    slice_base: int
    blk_start: int
    num_blocks: int


@dataclasses.dataclass(frozen=True)
class OctetBucket:
    """Static descriptor of one bucket of the OCTET (slice-transposed)
    fused stream (config.fused_layout == "octet").

    Member slices of one octet are STRIDED across the bucket (member m of
    octet o is slice o + m * stride): within a bucket every slice already
    has the same quantized width, so strided grouping costs zero extra
    padding while keeping the top-2-of-8 octet fold's accuracy identical
    to the strided fold_tile=8 semantics of the slice layout (adjacent
    tile-mates measured 0.88-0.97 precision; strided lose nothing —
    ops/kernel.py fold notes).
    """

    width: int               # member slice width (sublanes) = chunks/octet
    octets_per_block: int    # octets per grid block (1 in wide mode)
    blocks_per_octet: int    # 1 normally; >1 when chunk_sublanes*width > block
    stride: int              # slice-id stride between octet members
    slice_base: int
    blk_start: int
    num_blocks: int


@dataclasses.dataclass
class FusedSellMatrix:
    """All buckets re-laid into one uniform-block word stream.

    One Pallas call processes the whole matrix: grid = total_blocks, with
    compile-time branches per bucket selected on the block index. This
    removes the per-bucket kernel-launch and pipeline-ramp overhead (8
    buckets cost ~45% of the query time on v5e when launched separately).
    """

    words: np.ndarray        # (total_blocks * block_sublanes, 128) int32
    plan: tuple              # tuple[FusedBucket, ...] (static, hashable)
    nreal: np.ndarray        # (num_buckets, 1) int32: real slices per bucket
    block_sublanes: int
    num_blocks: int
    row_ids: np.ndarray
    num_rows: int
    num_cols: int
    num_nnz: int
    value_scale: float = 1.0  # see BucketedSellMatrix.value_scale

    @property
    def hbm_bytes(self) -> int:
        return int(self.words.nbytes)

    @property
    def num_slices(self) -> int:
        return self.row_ids.shape[0] - 1

    @property
    def padding_ratio(self) -> float:
        return self.words.size / max(self.num_nnz, 1)


def fuse_buckets(m: BucketedSellMatrix, block_sublanes: int = 1024,
                 skeleton: "list | None" = None) -> FusedSellMatrix:
    """Re-lay a bucketed matrix into the fused uniform-block stream.

    skeleton: optional list of (width, num_blocks, slice_base) triples to
    conform to (sharded engines build a common skeleton across devices;
    widths absent from this matrix become zero blocks, block counts are
    padded up, and slice_base follows the skeleton's slice numbering —
    the caller's row_ids must use the same numbering).
    """
    tgt = block_sublanes
    if skeleton is None:
        # Pair each bucket with its own shape entry POSITIONALLY: with
        # sigma_sort=False, widths are non-monotone and several buckets may
        # share a width — a width-keyed dict would fill every same-width
        # plan entry with the LAST such bucket's words.
        shape = [(b.width, None, b.slice_base, b) for b in m.buckets]
    else:
        # Skeleton mode keys buckets by width, which requires widths to be
        # unique per shard (guaranteed by sigma_sort: widths are monotone
        # non-increasing, so equal-W slices form ONE contiguous run).
        have = {}
        for b in m.buckets:
            if b.width in have:
                raise ValueError(
                    "fuse_buckets(skeleton=...) needs unique bucket widths "
                    f"(width {b.width} appears twice; pack with "
                    "sigma_sort=True for sharded engines)")
            have[b.width] = b
        shape = [(w, nb, sb, have.get(w)) for w, nb, sb in skeleton]

    plan = []
    chunks = []
    nreal = []
    blk = 0
    for width, want_blocks, slice_base, b in shape:
        if width <= tgt:
            spb = tgt // width
            bps = 1
        else:
            spb = 1
            bps = -(-width // tgt)
        n_sl = b.num_slices if b is not None else 0
        nb = (-(-n_sl // spb)) * bps if bps == 1 else n_sl * bps
        if want_blocks is not None:
            assert nb <= want_blocks, (width, nb, want_blocks)
            nb = want_blocks
        if nb == 0:
            continue
        buf = np.zeros((nb * tgt, LANES), np.int32)
        if b is not None:
            # repack W-sublane consecutive slices into tgt-sublane blocks
            # (vectorized: a python loop over slices dominates pack time
            # on 1M-row corpora)
            W = width
            src3 = b.words[: n_sl * W].reshape(n_sl, W, LANES)
            if bps == 1:
                buf3 = buf.reshape(nb, tgt, LANES)
                nfull = n_sl // spb
                if nfull:
                    buf3[:nfull, : spb * W] = src3[: nfull * spb].reshape(
                        nfull, spb * W, LANES)
                rem = n_sl - nfull * spb
                if rem:
                    buf3[nfull, : rem * W] = src3[nfull * spb:].reshape(
                        rem * W, LANES)
            else:
                # skeleton mode may pad nb beyond n_sl*bps: reshape only
                # the real prefix of the buffer
                buf[: n_sl * bps * tgt].reshape(
                    n_sl, bps * tgt, LANES)[:, :W] = src3
        plan.append(FusedBucket(
            width=width, slices_per_block=spb if bps == 1 else 1,
            blocks_per_slice=bps, slice_base=slice_base,
            blk_start=blk, num_blocks=nb,
        ))
        chunks.append(buf)
        nreal.append(n_sl)
        blk += nb

    words = np.concatenate(chunks) if chunks else \
        np.zeros((0, LANES), np.int32)
    return FusedSellMatrix(
        words=words, plan=tuple(plan),
        nreal=np.asarray(nreal, np.int32).reshape(-1, 1),
        block_sublanes=tgt, num_blocks=blk,
        row_ids=m.row_ids, num_rows=m.num_rows, num_cols=m.num_cols,
        num_nnz=m.num_nnz, value_scale=m.value_scale,
    )


def fuse_buckets_octet(m: BucketedSellMatrix, block_sublanes: int = 1024,
                       skeleton: "list | None" = None) -> FusedSellMatrix:
    """Re-lay a bucketed matrix into the slice-TRANSPOSED fused stream.

    Slice layout (fuse_buckets): a slice's W words sit on W consecutive
    sublanes, so the kernel must reduce each slice across sublanes and
    split period-boundary chunks when W is not a multiple of the chunk
    (the quantum-2 tax measured at ~1.9 cyc/chunk, ROOFLINE.md §2).

    Octet layout: chunk j of an octet holds word j of EIGHT different
    slices, one per sublane — accumulating W chunks yields an (8, 128)
    tile whose row m IS slice (o + m*stride)'s 128 row-scores. No
    sublane reductions, no boundary splits, no width quantum needed for
    the VPU (any integer width streams as whole chunks); the harvest is
    the same strided top-2-of-8 fold as fold_tile=8. This is the TPU
    move the reference cannot make: its HLS packets must stitch rows
    across packet boundaries (loop_3, spmv_bscsr_top_k_multicore.hpp:
    246-326) because the stream is row-major by construction.

    Block-tail sublanes left by octets_per_block * 8W < block_sublanes
    are zero and never touched by the kernel body — DMA-only waste,
    hidden under the VPU-bound kernel's 2x bandwidth headroom.

    skeleton: optional list of (width, num_octets, slice_base) triples to
    conform to (partitioned/sharded engines share one compiled plan): the
    member stride becomes the skeleton's num_octets (the max across
    partitions), widths absent from this matrix become zero-real buckets,
    and slice_base follows the skeleton's numbering, which reserves
    chunk_sublanes * num_octets ids per width entry.
    """
    tgt = block_sublanes
    S = m.config.chunk_sublanes
    if skeleton is None:
        shape = [(b.width, None, b.slice_base, b) for b in m.buckets]
    else:
        have = {}
        for b in m.buckets:
            if b.width in have:
                raise ValueError(
                    "fuse_buckets_octet(skeleton=...) needs unique bucket "
                    f"widths (width {b.width} appears twice; pack with "
                    "sigma_sort=True for partitioned/sharded engines)")
            have[b.width] = b
        shape = [(w, g, sb, have.get(w)) for w, g, sb in skeleton]
    plan = []
    chunks = []
    nreal = []
    blk = 0
    for W, want_G, slice_base, b in shape:
        n_sl = b.num_slices if b is not None else 0
        G = -(-n_sl // S)                      # octets (= member stride)
        if want_G is not None:
            assert G <= want_G, (W, G, want_G)
            G = want_G
        if G == 0:
            continue
        src = np.zeros((S * G, W, LANES), np.int32)
        if n_sl:
            src[:n_sl] = b.words[: n_sl * W].reshape(n_sl, W, LANES)
        # member (o, m) = slice o + m*G: (S, G, W, L)[m, o] -> (G, W, S, L)
        octs = np.ascontiguousarray(
            src.reshape(S, G, W, LANES).transpose(1, 2, 0, 3)
        ).reshape(G, S * W, LANES)
        del src
        if S * W <= tgt:
            opb = tgt // (S * W)
            bpo = 1
            nb = -(-G // opb)
            buf = np.zeros((nb * tgt, LANES), np.int32)
            buf3 = buf.reshape(nb, tgt, LANES)
            nfull = G // opb
            if nfull:
                buf3[:nfull, : opb * S * W] = octs[: nfull * opb].reshape(
                    nfull, opb * S * W, LANES)
            rem = G - nfull * opb
            if rem:
                buf3[nfull, : rem * S * W] = octs[nfull * opb:].reshape(
                    rem * S * W, LANES)
        else:
            opb = 1
            bpo = -(-(S * W) // tgt)
            nb = G * bpo
            buf = np.zeros((nb * tgt, LANES), np.int32)
            buf.reshape(G, bpo * tgt, LANES)[:, : S * W] = octs
        plan.append(OctetBucket(
            width=W, octets_per_block=opb, blocks_per_octet=bpo,
            stride=G, slice_base=slice_base, blk_start=blk,
            num_blocks=nb,
        ))
        chunks.append(buf)
        nreal.append(n_sl)
        blk += nb

    words = np.concatenate(chunks) if chunks else \
        np.zeros((0, LANES), np.int32)
    return FusedSellMatrix(
        words=words, plan=tuple(plan),
        nreal=np.asarray(nreal, np.int32).reshape(-1, 1),
        block_sublanes=tgt, num_blocks=blk,
        row_ids=m.row_ids, num_rows=m.num_rows, num_cols=m.num_cols,
        num_nnz=m.num_nnz, value_scale=m.value_scale,
    )


@dataclasses.dataclass
class PartitionedFusedMatrix:
    """P row-partition streams sharing one fused plan skeleton.

    Device layout of the partition-parallel fused kernel
    (ops.kernel.topk_spmv_fused_part_device): the single-chip analog of
    the reference's 8 CU x 4 sub-partition hierarchy (types.hpp:36-38) —
    partitions are independent block streams that Mosaic may place on
    separate megacore cores. Stored slice indices are partition-local;
    candidates resolve against the stacked row_ids with a p * part_slices
    offset (applied inside the kernel).
    """

    words: np.ndarray        # (P * num_blocks * block_sublanes, 128) int32
    plan: tuple              # shared tuple[FusedBucket, ...]
    nreal: np.ndarray        # (P, num_buckets, 1) int32
    row_ids: np.ndarray      # (P * part_slices, 128) int32
    num_partitions: int
    part_slices: int         # total_slices + 1 (incl. sentinel) per partition
    block_sublanes: int
    num_blocks: int          # blocks per partition
    num_rows: int
    num_cols: int
    num_nnz: int
    value_scale: float = 1.0

    @property
    def hbm_bytes(self) -> int:
        return int(self.words.nbytes)

    @property
    def padding_ratio(self) -> float:
        return self.words.size / max(self.num_nnz, 1)


def pack_fused_partitions(
    coo: CooMatrix, config: TopKSpMVConfig, num_partitions: int,
    octet: bool = False,
) -> PartitionedFusedMatrix:
    """Pack `coo` as P contiguous row partitions with one common fused
    skeleton (the in-process analog of the sharded engine's cross-device
    skeleton; partition rule = host_spmv_bscsr.cpp:136-150).

    octet: lay each partition out in the slice-transposed octet stream
    (fuse_buckets_octet); the common skeleton then fixes the member
    stride (num_octets) per width across partitions."""
    P = num_partitions
    tgt = config.fused_block_sublanes
    if not coo.is_sorted_row_major():
        coo = coo.sort_row_major()

    vscale = None
    if config.query_codec == "h16":
        vmax = float(np.max(np.abs(coo.vals))) if coo.nnz else 0.0
        vscale = ((vmax or 1.0) / 31.0) or 1.0

    rows_per = -(-coo.num_rows // P)
    packs = []
    for p in range(P):
        lo = p * rows_per
        hi = min(lo + rows_per, coo.num_rows)
        local = coo.row_slice(lo, hi)
        if local.num_rows <= 0 or local.nnz == 0:
            raise ValueError(
                f"partition {p} is empty ({P} partitions over "
                f"{coo.num_rows} rows) — lower config.num_partitions")
        packs.append((lo, pack_sell_buckets(local, config,
                                            value_scale=vscale)))

    # Common skeleton: per-width maxima across partitions (same
    # construction as the sharded engine's cross-device skeleton).
    by_width: dict[int, int] = {}
    if octet:
        S = config.chunk_sublanes
        for _, m in packs:
            for b in m.buckets:
                g = -(-b.num_slices // S)
                by_width[b.width] = max(by_width.get(b.width, 0), g)
        skeleton = []
        base = 0
        for w in sorted(by_width, reverse=True):
            g = by_width[w]
            skeleton.append((w, g, base))
            base += S * g   # each width entry reserves S*G slice ids
        total_slices = base
        fused = [fuse_buckets_octet(m, block_sublanes=tgt,
                                    skeleton=skeleton)
                 for _, m in packs]
    else:
        for _, m in packs:
            for q in fuse_buckets(m, block_sublanes=tgt).plan:
                by_width[q.width] = max(by_width.get(q.width, 0),
                                        q.num_blocks)
        skeleton = []
        base = 0
        for w in sorted(by_width, reverse=True):
            nb = by_width[w]
            skeleton.append((w, nb, base))
            spb = tgt // w if w <= tgt else 1
            bps = 1 if w <= tgt else -(-w // tgt)
            base += (nb * spb) if bps == 1 else (nb // bps)
        total_slices = base
        fused = [fuse_buckets(m, block_sublanes=tgt, skeleton=skeleton)
                 for _, m in packs]
    plan = fused[0].plan
    num_blocks = fused[0].num_blocks
    nb_words = max(f.words.shape[0] for f in fused)

    words = np.zeros((P * nb_words, LANES), np.int32)
    nreal = np.zeros((P, len(plan), 1), np.int32)
    row_ids = np.full((P * (total_slices + 1), LANES), -1, np.int32)
    for p, ((row0, m), f) in enumerate(zip(packs, fused)):
        assert f.plan == plan, "skeleton plans must agree"
        words[p * nb_words: p * nb_words + f.words.shape[0]] = f.words
        nreal[p, :, 0] = f.nreal[:, 0]
        r0 = p * (total_slices + 1)
        for q, n_sl in zip(plan, f.nreal[:, 0]):
            if n_sl == 0:
                continue
            src = next(b for b in m.buckets if b.width == q.width)
            ids = m.row_ids[src.slice_base:src.slice_base + int(n_sl)].copy()
            ids[ids >= 0] += row0
            row_ids[r0 + q.slice_base: r0 + q.slice_base + int(n_sl)] = ids
    return PartitionedFusedMatrix(
        words=words, plan=plan, nreal=nreal, row_ids=row_ids,
        num_partitions=P, part_slices=total_slices + 1,
        block_sublanes=tgt, num_blocks=num_blocks,
        num_rows=coo.num_rows, num_cols=coo.num_cols, num_nnz=coo.nnz,
        value_scale=vscale if vscale is not None else 1.0,
    )


def pack_sell_buckets(
    coo: CooMatrix, config: TopKSpMVConfig = DEFAULT_CONFIG,
    target_block_sublanes: int | None = None,
    value_scale: float | None = None,
) -> BucketedSellMatrix:
    """value_scale: h16 only — the global 6-bit value quantization scale.
    None computes it from this matrix; sharded engines pass the global
    max so per-shard scores stay comparable across devices."""
    if coo.num_cols > config.max_cols:
        raise ValueError(
            f"matrix has {coo.num_cols} cols > config.max_cols={config.max_cols}"
        )
    if not coo.is_sorted_row_major():
        coo = coo.sort_row_major()
    from ..utils import native

    S = config.chunk_sublanes
    tgt = target_block_sublanes or config.block_sublanes
    h16 = config.query_codec == "h16"

    degrees = coo.row_degrees()
    num_slices = -(-coo.num_rows // LANES)
    pad_rows = num_slices * LANES - coo.num_rows
    vals_q = None if h16 else quantize_values(coo.vals, config.value_format)

    row_start = np.zeros(coo.num_rows + 1, dtype=np.int64)
    np.cumsum(degrees, out=row_start[1:])

    if h16:
        # h16 pairs two consecutive nnz of a row per 32-bit word: slice
        # widths, plan, and scatter all operate on WORD degrees
        # ceil(d/2); values are 6-bit signed with one global scale.
        if value_scale is None:
            vmax = float(np.max(np.abs(coo.vals))) if coo.nnz else 1.0
            value_scale = (vmax / 31.0) or 1.0
        plan_degrees = (-(-degrees // 2)).astype(np.int32)
    else:
        value_scale = 1.0
        plan_degrees = degrees

    Q = config.width_quantum
    plan = native.sell_plan(plan_degrees, Q, config.sigma_sort)
    if plan is not None:
        perm, rank_of_row, slice_w = plan
    else:
        perm = (np.argsort(-plan_degrees, kind="stable") if config.sigma_sort
                else np.arange(coo.num_rows))
        rank_of_row = np.empty(coo.num_rows, dtype=np.int64)
        rank_of_row[perm] = np.arange(coo.num_rows)
        deg_padded = np.concatenate(
            [plan_degrees[perm], np.zeros(pad_rows, np.int32)])
        slice_w = deg_padded.reshape(num_slices, LANES).max(axis=1)
        slice_w = np.maximum(-(-slice_w // Q) * Q, Q)

    # Quantize widths to the ladder; sigma-sorted slices make equal-W runs
    # contiguous (width is monotone when sigma_sort, nearly so otherwise).
    slice_wq = np.array([_quantize_w(int(w), Q) for w in slice_w], np.int64)

    # Merge runs into the previous (wider) one while a global padding
    # budget lasts: every distinct width is a compiled branch of the fused
    # kernel (and through the remote-compile tunnel each costs compile
    # seconds), but promotion widens slices, so the TOTAL widening across
    # all promotions is capped at ~1% of the packed sublanes — per-run
    # caps compound into large padding on width-diverse (quantum-4) packs.
    if config.sigma_sort and num_slices > 1:
        budget = max(2 * S, int(slice_wq.sum()) // 100)
        i = 0
        cur_w = None
        while i < num_slices:
            j = i
            w = int(slice_wq[i])
            while j < num_slices and slice_wq[j] == w:
                j += 1
            cost = (j - i) * (cur_w - w) if cur_w is not None else None
            if cost is not None and cost <= budget:
                slice_wq[i:j] = cur_w
                budget -= cost
            else:
                cur_w = w
            i = j

    perm_padded = np.concatenate([perm, np.full(pad_rows, -1, np.int64)])
    row_ids = np.concatenate([
        perm_padded.reshape(num_slices, LANES),
        np.full((1, LANES), -1, np.int64),           # sentinel slice
    ]).astype(np.int32)

    slice_off = np.zeros(num_slices + 1, dtype=np.int64)
    np.cumsum(slice_wq, out=slice_off[1:])
    total_sub = int(slice_off[-1])

    # Scatter all nnz once into the quantized-width global slab.
    if h16:
        words = _scatter_h16(coo, degrees, row_start, rank_of_row,
                             slice_off, total_sub, value_scale)
    else:
        words = native.sell_scatter(
            coo.rows, coo.cols, vals_q, row_start, rank_of_row, slice_off,
            total_sub,
        )
    if words is None:
        slice_of_row = rank_of_row // LANES
        lane_of_row = rank_of_row % LANES
        within_row = np.arange(coo.nnz, dtype=np.int64) - row_start[coo.rows]
        dest_sub = slice_off[slice_of_row[coo.rows]] + within_row
        dest_lane = lane_of_row[coo.rows]
        w32 = np.zeros((total_sub, LANES), dtype=np.uint32)
        w32[dest_sub, dest_lane] = (
            (coo.cols.astype(np.uint32) << 16)
            | bf16_bits(vals_q).astype(np.uint32)
        )
        words = w32.view(np.int32)

    # Sign-layout codecs move per-word gather arithmetic into the packed
    # word's high half (lane | shift-amount | table-row sign bit).
    if config.query_codec in ("i8s", "i4s"):
        from ..ops.quantized_query import encode_words_sign_layout

        words = encode_words_sign_layout(words, config.query_codec)

    # Cut into buckets = contiguous equal-W runs.
    buckets = []
    t = 0
    while t < num_slices:
        W = int(slice_wq[t])
        t_end = t
        while t_end < num_slices and slice_wq[t_end] == W:
            t_end += 1
        n_sl = t_end - t
        spb = max(1, tgt // W)
        block_sub = spb * W
        num_blocks = -(-n_sl // spb)
        sub0 = int(slice_off[t])
        sub1 = int(slice_off[t_end])
        bw = np.zeros((num_blocks * block_sub, LANES), np.int32)
        bw[: sub1 - sub0] = words[sub0:sub1]
        buckets.append(SellBucket(
            words=bw, width=W, block_sublanes=block_sub,
            num_blocks=num_blocks, slice_base=t, num_slices=n_sl,
        ))
        t = t_end

    return BucketedSellMatrix(
        buckets=buckets, row_ids=row_ids,
        num_rows=coo.num_rows, num_cols=coo.num_cols, num_nnz=coo.nnz,
        config=config, value_scale=value_scale,
    )


def _scatter_h16(coo: CooMatrix, degrees, row_start, rank_of_row,
                 slice_off, total_sub, value_scale: float) -> np.ndarray:
    """Pair-pack the COO for the h16 codec.

    Word layout (2 nnz per int32):
      bits [ 0:10)  col of nnz 2p      [10:16)  val6 of nnz 2p
      bits [16:26)  col of nnz 2p+1    [26:32)  val6 of nnz 2p+1
    val6 = two's-complement round(val / value_scale) in [-31, 31]; an odd
    row degree leaves the high half 0 (val6=0 contributes nothing, any
    col is safe). Slice geometry uses word degrees ceil(d/2).

    Dispatches to the native threaded scatter (runtime/spmv_runtime.cpp::
    h16_scatter) when built; this NumPy body is the fallback and the
    differential oracle (tests/test_native.py) — its temporaries are ~9x
    the packed size, prohibitive at the 2G-nnz BASELINE config.
    """
    from ..utils import native

    nw = native.h16_scatter(
        np.ascontiguousarray(coo.rows, np.int32),
        np.ascontiguousarray(coo.cols, np.int32),
        np.ascontiguousarray(coo.vals, np.float32),
        np.ascontiguousarray(row_start, np.int64),
        np.ascontiguousarray(rank_of_row, np.int64),
        np.ascontiguousarray(slice_off, np.int64),
        total_sub, value_scale)
    if nw is not None:
        return nw
    # memory hygiene: a 100M-row corpus (~2G nnz) peaks near host RAM —
    # keep temporaries int32 where ranges allow and free them eagerly
    v6 = np.clip(np.rint(coo.vals * np.float32(1.0 / value_scale)),
                 -31, 31).astype(np.int32)
    halves = (coo.cols.astype(np.uint32)
              | ((v6 & 0x3F).astype(np.uint32) << np.uint32(10)))
    del v6

    pair_degrees = -(-degrees.astype(np.int64) // 2)
    pair_start = np.zeros(coo.num_rows + 1, np.int64)
    np.cumsum(pair_degrees, out=pair_start[1:])
    total_pairs = int(pair_start[-1])

    within = np.arange(coo.nnz, dtype=np.int64)
    within -= row_start[coo.rows]
    pid = pair_start[coo.rows] + (within >> 1)
    hi = (within & 1).astype(bool)
    del within
    pw = np.zeros(total_pairs, np.uint32)
    pw[pid[~hi]] = halves[~hi]            # exactly one low half per pair
    pw[pid[hi]] |= halves[hi] << np.uint32(16)
    del pid, hi, halves

    pair_rows = np.repeat(
        np.arange(coo.num_rows, dtype=np.int32), pair_degrees)
    rk = rank_of_row[pair_rows]
    dest_sub = np.arange(total_pairs, dtype=np.int64)
    dest_sub -= pair_start[pair_rows]
    del pair_rows
    dest_sub += slice_off[rk // LANES]
    w32 = np.zeros((total_sub, LANES), np.uint32)
    w32[dest_sub, rk % LANES] = pw
    return w32.view(np.int32)
