"""Fused Top-K SpMV Pallas kernel (SELL-128 format).

TPU-native re-design of the reference's HLS dataflow kernel
(/root/reference/src/fpga/src/ip/spmv/spmv_bscsr_top_k_multicore.hpp:
loop_1 decode+gather :168-220, loop_2 multiply+segment-reduce :104-149,
loop_3 packet stitching :246-326, loop_4 argmin-replacement Top-K :331-409).
The mapping:

  loop_1  -> 32-bit word decode on the VPU + `dynamic_gather` of the query
             table along lanes (the URAM vector replicas, types.hpp:79,
             become one f32 table row per 128-column group: the TPU lane
             gather wraps mod 128, so the low 7 column bits index the lane
             and the high bits select the group via a masked-select chain).
  loop_2  -> elementwise multiply + per-lane accumulation: each lane IS one
             row (SELL), so the segmented reduction is a plain sublane sum.
  loop_3  -> eliminated by construction: slices are row-aligned, a sub-chunk
             metadata word carries (slice_index, is_last) and rows never
             straddle compute boundaries (no LIMITED_FINISHED_ROWS
             approximation).
  loop_4  -> per-lane running Top-K in VMEM scratch with the reference's
             argmin-replacement update (>= replaces the worst slot), over
             (lane_k, 128) registers; candidates are (value, slice) pairs
             resolved to row ids outside the kernel.

Grid = (partitions, blocks): the partition axis is declared "parallel" (the
analog of the 8 CUs x 4 sub-partitions, types.hpp:36-38); the block axis
streams (block_sublanes, 128) word slabs from HBM with Pallas' automatic
double-buffering (the II=1 HBM burst pipeline).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANES, TopKSpMVConfig

NEG_INF = float("-inf")


def _decode_val(w):
    """Low 16 bits are the bfloat16 value bit pattern -> exact f32."""
    return pltpu.bitcast(jax.lax.shift_left(w, 16), jnp.float32)


def _gather_query(tab_ref, w, num_groups, sublanes):
    """vec[col] for each packed word: masked multi-pass lane gather.

    The lane gather reaches 128 entries per table row; the low 7 column
    bits index the lane (masked explicitly — TPU hardware would wrap mod
    128 anyway, but interpret mode NaN-fills out-of-bounds indices) and the
    high column bits select which of the `num_groups` table rows wins.
    """
    lo = jax.lax.shift_right_logical(w, 16) & 0x7F
    shape = (sublanes, LANES)
    if num_groups == 1:
        bc = jnp.broadcast_to(tab_ref[0:1, :], shape)
        return jnp.take_along_axis(bc, lo, axis=1)
    hi = jax.lax.shift_right_logical(w, 23)
    sel = None
    for c in range(num_groups):
        bc = jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
        g = jnp.take_along_axis(bc, lo, axis=1)
        sel = g if sel is None else jnp.where(hi == c, g, sel)
    return sel


# Sentinel floor for Top-K buffer initialization: real scores of
# L2-normalized embeddings are O(1), so anything below this is an
# unfilled slot (finalize masks on it). The fast fold needs DISTINCT
# init values per slot (see _topk_init) so the all-tied first update
# cannot collapse the whole buffer onto one candidate.
TOPK_FLOOR = -1e38

# Unrolled-work cap for the batch kernels' per-bucket bodies (chunk-applies
# per branch); larger fans out to lax.fori_loop. Module-level so tests can
# force the fori path on small shapes.
_BATCH_UNROLL_LIMIT = 256


def _topk_init(lane_k):
    """(lane_k, 128) distinct finite sentinels, all below TOPK_FLOOR."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (lane_k, LANES), 0)
    return -2.8e38 - iota.astype(jnp.float32) * 1e32


def _topk_update(tv, tt, score, slice_idx, lane_k, tie_safe=False):
    """Argmin-replacement update of the per-lane Top-K buffers.

    Mirrors update_top_k (gold_algorithms.hpp:249-272) vectorized over 128
    lanes: replace each lane's current-worst slot when score >= worst.

    tie_safe=False (default): replace EVERY slot holding the current min
    (saves the first-argmin iota chain, ~9% kernel time at narrow widths).
    With continuous scores min-ties are vanishing; when a new score ties
    an incumbent that is also the lane min, the incumbent is overwritten —
    only one of an exactly-tied pair of rows is kept, and a score landing
    on several tied-min slots occupies all of them, so the final top-k may
    contain a duplicated row on exact-tie data. Set config.tie_safe_topk
    for tie-heavy data (e.g. pattern matrices) to get the reference's
    exact first-of-ties argmin semantics.
    """
    cur = tv[:]
    cur_min = jnp.min(cur, axis=0, keepdims=True)                  # (1, 128)
    if tie_safe:
        iota = jax.lax.broadcasted_iota(jnp.int32, (lane_k, LANES), 0)
        slot = jnp.min(
            jnp.where(cur == cur_min, iota, lane_k), axis=0, keepdims=True
        )                                                           # first argmin
        replace = (iota == slot) & (score >= cur_min)
    else:
        replace = (cur == cur_min) & (score >= cur_min)
    tv[:] = jnp.where(replace, score, cur)
    tt[:] = jnp.where(replace, slice_idx, tt[:])


def _gather_from_bcs(bcs, w, sublanes, mask_lanes=True):
    """vec[col] via hoisted broadcast table rows (see _gather_query)."""
    lo = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:  # TPU dynamic_gather wraps mod 128; interpret NaN-fills
        lo = lo & 0x7F
    if len(bcs) == 1:
        return jnp.take_along_axis(bcs[0], lo, axis=1)
    hi = jax.lax.shift_right_logical(w, 23)
    sel = None
    for c, bc in enumerate(bcs):
        g = jnp.take_along_axis(bc, lo, axis=1)
        sel = g if sel is None else jnp.where(hi == c, g, sel)
    return sel


def _gather_from_bcs_int8(bcs, w, sublanes, mask_lanes=True):
    """vec[col] from an int8x4-packed query table (see pack_query_int8).

    Each int32 table word packs 4 biased-uint8 quantized query entries, so
    one 128-lane table row covers 512 columns: C=1024 needs 2 gather
    passes instead of 8. Returns the *unscaled* (q - 128) value; the
    caller rescales final scores by the quantization scale (rank-safe).
    """
    lo = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:
        lo = lo & 0x7F
    sel = None
    for c, bc in enumerate(bcs):
        g = jnp.take_along_axis(bc, lo, axis=1)
        if sel is None:
            sel = g
        else:
            # word group = col >> 9 -> bit (25 + log2 terms) of w; compare
            # against pass index via the shifted column bits.
            hi9 = jax.lax.shift_right_logical(w, 25)
            sel = jnp.where(hi9 == c, g, sel)
    # byte index = (col >> 7) & 3; its bits sit at w[23:25] -> shift amount
    # ((col >> 7) & 3) * 8 == (w >> 20) & 0b11000.
    sh = jax.lax.shift_right_logical(w, 20) & 24
    byte = jax.lax.shift_right_logical(sel, sh) & 0xFF
    return (byte - 128).astype(jnp.float32)


def _gather_from_bcs_sign(bcs, w, sublanes, mask_lanes=True, *, shift):
    """vec[col] for the sign-layout codecs (i8s: shift=24, i4s: shift=28).

    The matrix word carries (see encode_words_sign_layout): lane bits at
    [16:23), a precomputed arithmetic-shift amount at [24:29), and the
    table-row select in the sign bit. Extraction is 2 shifts + 1 convert —
    no mask, no debias (table entries are two's-complement)."""
    lo = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:  # TPU dynamic_gather wraps mod 128; interpret NaN-fills
        lo = lo & 0x7F
    if len(bcs) == 1:
        sel = jnp.take_along_axis(bcs[0], lo, axis=1)
    elif len(bcs) == 2:
        g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
        g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
        sel = jnp.where(w < 0, g1, g0)
    else:
        raise ValueError("sign-layout codecs support at most 2 table rows")
    a = jax.lax.shift_right_logical(w, 24) & 31
    t = jax.lax.shift_left(sel, a)
    q = jax.lax.shift_right_arithmetic(t, shift)
    return q.astype(jnp.float32)


def _codec_gather(codec: str):
    if codec == "f32":
        return _gather_from_bcs
    if codec == "int8x4":
        return _gather_from_bcs_int8
    if codec == "i8s":
        return functools.partial(_gather_from_bcs_sign, shift=24)
    if codec == "i4s":
        return functools.partial(_gather_from_bcs_sign, shift=28)
    raise ValueError(f"unknown query codec {codec!r}")


def _prod_h16(bcs, w, mask_lanes=True):
    """Per-chunk score contribution for the h16 codec: TWO nnz per word.

    Word layout (formats/sell_buckets.py::_scatter_h16): each 16-bit half
    is col[0:10) | val6[10:16). Query via the single-row int4x8 table
    (pack_query_i4s): lane = col & 127 (the hardware gather wraps mod
    128, so both halves index RAW — i0 even carries half1's bits above
    bit 7, including a possibly-set sign bit; interpret mode masks
    because its gather NaN-fills out-of-range), nibble select
    = (col >> 7) * 4 taken from the word bits. Returns the INT32 product
    sum v0*q0 + v1*q1 (accumulated in int32, one f32 convert per slice
    at the fold — see _acc_dtype); the engine multiplies scores by
    value_scale * query_scale at finalize. Halves HBM bytes per nnz —
    the TPU analog of the reference's 20-bit BSCSR packets raising B
    from 11 to 15 (types.hpp:71-73).

    Nibble extraction uses the complement-shift form measured fastest in
    experiments/h16_lab.py: shift the nibble to the TOP with
    sh' = (~w >> s) & 28 == 28 - 4*(col >> 7), then one arithmetic
    right-shift sign-extends — replaces the mask/xor/subtract chain."""
    if len(bcs) != 1:
        raise ValueError("h16 codec supports max_cols <= 1024")
    bc = bcs[0]
    nw = ~w
    i0 = (w & 0x7F) if mask_lanes else w
    h1 = jax.lax.shift_right_logical(w, 16)
    i1 = (h1 & 0x7F) if mask_lanes else h1
    g0 = jnp.take_along_axis(bc, i0, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    sh0 = jax.lax.shift_right_logical(nw, 5) & 28
    sh1 = jax.lax.shift_right_logical(nw, 21) & 28
    n0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g0, sh0), 28)
    n1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g1, sh1), 28)
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return v0 * n0 + v1 * n1  # int32; |sum| < 2^31 for any real degree


def _acc_dtype(codec: str):
    """Accumulator dtype per codec: h16 products are small ints, so the
    chunk accumulate runs in int32 and converts to f32 once per slice at
    the fold (saves one VPU convert per word — experiments/h16_lab.py)."""
    return jnp.int32 if codec == "h16" else jnp.float32


def _to_f32(score):
    return score if score.dtype == jnp.float32 else score.astype(jnp.float32)


def _codec_prod(codec: str):
    """(bcs, w, sublanes, mask_lanes) -> per-element score contribution
    in _acc_dtype(codec).

    Default codecs: decoded bf16 value times the gathered query entry.
    h16 computes the full two-nnz product itself (no separate value
    decode)."""
    if codec == "h16":
        return lambda bcs, w, sublanes, mask_lanes=True: \
            _prod_h16(bcs, w, mask_lanes)
    g = _codec_gather(codec)
    return lambda bcs, w, sublanes, mask_lanes=True: \
        _decode_val(w) * g(bcs, w, sublanes, mask_lanes)


# --------------------------------------------------------------- batch split
# Multi-query kernels decode each chunk ONCE and share the query-independent
# word arithmetic (gather indices, shift amounts, matrix values) across the
# group — `_codec_split(codec)` returns (shared, apply) with
#   shared(w, mask_lanes) -> tuple of word-derived (S, 128) arrays
#   apply(bcs, shared)    -> per-element product in _acc_dtype(codec)
# so only the query-dependent tail (table gathers + extraction + multiply)
# scales with the group size. Measured NEUTRAL vs relying on Mosaic CSE to
# dedupe a repeated full decode (299.4 vs 292.3 Gnnz/s/query at group 16,
# experiments/batch_lab.py) — kept because it makes the shared/per-query
# boundary explicit and is what enables batch_subgroup partitioning.


def _h16_shared(w, mask_lanes):
    nw = ~w
    i0 = (w & 0x7F) if mask_lanes else w
    i1 = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:
        i1 = i1 & 0x7F
    sh0 = jax.lax.shift_right_logical(nw, 5) & 28
    sh1 = jax.lax.shift_right_logical(nw, 21) & 28
    v0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w, 16), 26)
    v1 = jax.lax.shift_right_arithmetic(w, 26)
    return (i0, i1, sh0, sh1, v0, v1)


def _h16_apply(bcs, s):
    i0, i1, sh0, sh1, v0, v1 = s
    bc = bcs[0]
    g0 = jnp.take_along_axis(bc, i0, axis=1)
    g1 = jnp.take_along_axis(bc, i1, axis=1)
    n0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g0, sh0), 28)
    n1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(g1, sh1), 28)
    return v0 * n0 + v1 * n1


def _f32_shared(w, mask_lanes):
    lo = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:
        lo = lo & 0x7F
    hi = jax.lax.shift_right_logical(w, 23)
    return (lo, hi, _decode_val(w))


def _f32_apply(bcs, s):
    lo, hi, val = s
    if len(bcs) == 1:
        return val * jnp.take_along_axis(bcs[0], lo, axis=1)
    sel = None
    for c, bc in enumerate(bcs):
        g = jnp.take_along_axis(bc, lo, axis=1)
        sel = g if sel is None else jnp.where(hi == c, g, sel)
    return val * sel


def _int8x4_shared(w, mask_lanes):
    lo = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:
        lo = lo & 0x7F
    hi9 = jax.lax.shift_right_logical(w, 25)
    sh = jax.lax.shift_right_logical(w, 20) & 24
    return (lo, hi9, sh, _decode_val(w))


def _int8x4_apply(bcs, s):
    lo, hi9, sh, val = s
    sel = None
    for c, bc in enumerate(bcs):
        g = jnp.take_along_axis(bc, lo, axis=1)
        sel = g if sel is None else jnp.where(hi9 == c, g, sel)
    byte = jax.lax.shift_right_logical(sel, sh) & 0xFF
    return val * (byte - 128).astype(jnp.float32)


def _sign_shared(w, mask_lanes):
    lo = jax.lax.shift_right_logical(w, 16)
    if mask_lanes:
        lo = lo & 0x7F
    a = jax.lax.shift_right_logical(w, 24) & 31
    return (lo, a, w, _decode_val(w))


def _sign_apply(bcs, s, *, shift):
    lo, a, w, val = s
    if len(bcs) == 1:
        sel = jnp.take_along_axis(bcs[0], lo, axis=1)
    else:
        g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
        g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
        sel = jnp.where(w < 0, g1, g0)
    t = jax.lax.shift_left(sel, a)
    q = jax.lax.shift_right_arithmetic(t, shift)
    return val * q.astype(jnp.float32)


def _codec_split(codec: str):
    """(shared, apply) pair for the multi-query kernels (see above)."""
    if codec == "h16":
        return _h16_shared, _h16_apply
    if codec == "f32":
        return _f32_shared, _f32_apply
    if codec == "int8x4":
        return _int8x4_shared, _int8x4_apply
    if codec == "i8s":
        return _sign_shared, functools.partial(_sign_apply, shift=24)
    if codec == "i4s":
        return _sign_shared, functools.partial(_sign_apply, shift=28)
    raise ValueError(f"unknown query codec {codec!r}")


def _bucket_kernel(nreal_ref, tab_ref, words_ref, topv_ref, topt_ref,
                   tv, tt, *, cfg: TopKSpMVConfig, num_groups: int,
                   width: int, slices_per_block: int, slice_base: int,
                   codec: str = "f32", mask_lanes: bool = True):
    """Uniform-W bucket kernel: zero dynamic control flow in the hot loop.

    Slice boundaries are static (every `width` sublanes), so the row
    accumulator is a vector-register value and the Top-K fold runs at a
    compile-time cadence — the streamed layout's per-sub-chunk metadata
    branch measured ~2.5x slower on v5e.
    """
    tie_safe = cfg.tie_safe_topk
    i = pl.program_id(0)
    S = cfg.chunk_sublanes
    K = cfg.lane_k

    @pl.when(i == 0)
    def _():
        tv[:] = (jnp.full_like(tv, NEG_INF) if tie_safe
                 else _topk_init(tv.shape[0]))
        tt[:] = jnp.zeros_like(tt)

    shape = (S, LANES)
    bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
           for c in range(tab_ref.shape[0])]
    prod = _codec_prod(codec)

    def do_slice(j):
        # Two independent accumulators break the serial add chain so the
        # VPU can overlap consecutive chunks' gather chains (+12% on v5e).
        n_acc = 2 if width // S >= 2 else 1
        accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                for _ in range(n_acc)]
        for u in range(width // S):
            w = words_ref[pl.ds(j * width + u * S, S), :]
            accs[u % n_acc] = (
                accs[u % n_acc] + prod(bcs, w, S, mask_lanes)
            )
        acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
        score = _to_f32(jnp.sum(acc, axis=0, keepdims=True))  # (1, 128)
        t = slice_base + i * slices_per_block + j
        # Block-padding slices (t beyond the bucket's real count — a
        # dynamic scalar, so device shards with fewer slices share one
        # compiled kernel) must not displace real candidates: add a
        # scalar-unit -inf penalty (branch-free, one vector-scalar add).
        pen = jnp.where(t < slice_base + nreal_ref[0, 0], 0.0, NEG_INF)
        _topk_update(tv, tt, score + pen, t, K, tie_safe=tie_safe)

    # Full unrolling of many-slice blocks explodes Mosaic compile time
    # (remote compiles cost tens of seconds); loop when the body is big.
    if slices_per_block * max(width // S, 1) <= 64:
        for j in range(slices_per_block):
            do_slice(j)
    else:
        def body(j, _):
            do_slice(j)
            return 0

        jax.lax.fori_loop(0, slices_per_block, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        topv_ref[:] = tv[:]
        topt_ref[:] = tt[:]


def _fused_kernel(nreal_ref, tab_ref, words_ref, topv_ref, topt_ref,
                  tv, tt, carry, tilebuf, *, cfg: TopKSpMVConfig,
                  plan: tuple, block_sublanes: int, codec: str = "f32",
                  mask_lanes: bool = True, part_slices: int = 0):
    """All buckets in ONE pallas_call: grid = total blocks, one static
    branch per bucket selected on the block index.

    Launching one kernel per bucket (8 for a 1M-row gamma matrix) spends
    ~45% of the query in dispatch + pipeline ramp; here the whole matrix
    is a single uniform-block stream (the analog of the reference's one
    sweep over all 32 HBM channels, host_spmv_bscsr.cpp:323-352) and the
    Top-K scratch is shared, so candidates come out already merged across
    buckets. Wide buckets (width > block) carry a partial row sum across
    blocks in `carry` scratch — the only loop_3-style stitching left.

    part_slices > 0 adds a leading PARALLEL grid axis of row partitions
    (the analog of the 8 CU x 4 sub-partition hierarchy, types.hpp:36-38;
    on megacore chips the partitions run on separate cores). Every
    partition shares one plan skeleton; stored slice indices are offset by
    p * part_slices so the stacked row_ids resolve them globally.
    """
    tie_safe = cfg.tie_safe_topk
    part = part_slices > 0
    i = pl.program_id(1 if part else 0)
    toff = pl.program_id(0) * part_slices if part else 0
    S = cfg.chunk_sublanes
    K = cfg.lane_k

    @pl.when(i == 0)
    def _():
        tv[:] = (jnp.full_like(tv, NEG_INF) if tie_safe
                 else _topk_init(tv.shape[0]))
        tt[:] = jnp.zeros_like(tt)
        carry[:] = jnp.zeros_like(carry)

    shape = (S, LANES)
    bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
           for c in range(tab_ref.shape[0])]
    prod = _codec_prod(codec)

    for bi, pb in enumerate(plan):
        W = pb.width
        spb = pb.slices_per_block
        bps = pb.blocks_per_slice

        @pl.when((i >= pb.blk_start) & (i < pb.blk_start + pb.num_blocks))
        def _(bi=bi, pb=pb, W=W, spb=spb, bps=bps):
            nreal = nreal_ref[0, bi, 0] if part else nreal_ref[bi, 0]

            def prod_at(sub):
                w = words_ref[pl.ds(sub, S), :]
                return prod(bcs, w, S, mask_lanes)

            def sum_span(sub0, n_chunks, extra=None):
                """Sum of n_chunks full chunks starting at sublane sub0
                (dual accumulators), plus an optional (1, 128) extra."""
                if n_chunks == 0:
                    return extra if extra is not None \
                        else jnp.zeros((1, LANES), _acc_dtype(codec))
                n_acc = 2 if n_chunks >= 2 else 1
                accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                        for _ in range(n_acc)]
                for u in range(n_chunks):
                    accs[u % n_acc] = accs[u % n_acc] + prod_at(sub0 + u * S)
                acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
                s = jnp.sum(acc, axis=0, keepdims=True)
                return s if extra is None else s + extra

            # Tiled fold (cfg.fold_tile > 1): buffer `tile` slice scores
            # per sub-tile in VMEM scratch, then fold the sub-tile's TWO
            # best scores per lane (plus their slice ids) — the Top-K
            # update runs ~tile/2 times less often (the reference's
            # LIMITED_FINISHED_ROWS per-packet cap, types.hpp:77).
            # Tile-mates are STRIDED ~spb/tile slices apart: sigma-sort
            # clusters high-score rows into adjacent slices (degree-score
            # correlation), so adjacent tile-mates measured 0.88-0.97
            # precision where strided ones lose nothing measurable; the
            # rescore pool absorbs the residual 3-per-(lane,tile)
            # collisions. Slice ids stay affine in the sub-tile row
            # (t = t0 + row * stride), so reconstruction is one
            # multiply-add. Engages only on fully-unrolled slice loops;
            # fori fallbacks fold per slice.
            tile = cfg.fold_tile
            # open rows per sub-tile: one sub-tile per slice of a period
            # (Ps = 8/gcd(W,8) <= 8; quantum-1 odd widths use all 8)
            cnt = [0] * (S // math.gcd(W, S) if W % S else 1)

            def score_pen(score, t):
                # Branch-free padding mask: t and the bucket's real count
                # are scalars, so the select computes on the scalar unit
                # and only ONE vector-scalar add reaches the VPU (the
                # vector `where` form measured ~1.6 cyc/chunk at W=16;
                # per-slice `pl.when` guards measured ~6x worse —
                # experiments/fold_lab.py).
                pen = jnp.where(t < pb.slice_base + nreal, 0.0, NEG_INF)
                return _to_f32(score) + pen

            def fold(score, t):
                _topk_update(tv, tt, score_pen(score, t), t + toff, K,
                             tie_safe=tie_safe)

            def tadd(s_idx, score):
                r = s_idx * tile + cnt[s_idx]
                tilebuf[r:r + 1, :] = score
                cnt[s_idx] += 1

            def tflush(s_idx, t0, dt):
                """Fold sub-tile s_idx holding slices t0, t0+dt, ..."""
                n = cnt[s_idx]
                if n == 0:
                    return
                r0 = s_idx * tile
                tb = tilebuf[r0:r0 + n, :]
                iota = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
                m1 = jnp.max(tb, axis=0, keepdims=True)
                sl1 = jnp.min(jnp.where(tb == m1, iota, n), axis=0,
                              keepdims=True)
                _topk_update(tv, tt, m1, t0 + sl1 * dt, K,
                             tie_safe=tie_safe)
                if n > 1:
                    tb2 = jnp.where(iota == sl1, NEG_INF, tb)
                    m2 = jnp.max(tb2, axis=0, keepdims=True)
                    sl2 = jnp.min(jnp.where(tb2 == m2, iota, n), axis=0,
                                  keepdims=True)
                    _topk_update(tv, tt, m2, t0 + sl2 * dt, K,
                                 tie_safe=tie_safe)
                cnt[s_idx] = 0

            if bps == 1 and W % S == 0:
                tb0 = pb.slice_base + (i - pb.blk_start) * spb

                def do_slice(j):
                    fold(sum_span(j * W, W // S), tb0 + j)

                unrolled = spb * max(W // S, 1) <= 128
                if unrolled and tile > 1:
                    G = -(-spb // tile)
                    for gi_ in range(G):
                        for m in range(tile):
                            j = gi_ + m * G
                            if j >= spb:
                                break
                            tadd(0, score_pen(sum_span(j * W, W // S),
                                              tb0 + j))
                        tflush(0, tb0 + toff + gi_, G)
                elif unrolled:
                    for j in range(spb):
                        do_slice(j)
                else:
                    jax.lax.fori_loop(
                        0, spb, lambda j, c: (do_slice(j), c)[1], 0)
            elif bps == 1:
                # Non-chunk-multiple widths (quantum 4: W = 8m + 4;
                # quantum 2: W = 4m + 2). A PERIOD of 8/gcd(W,8)
                # consecutive slices spans a whole number of chunks;
                # boundary chunks are decoded ONCE and split with static
                # sublane slices (no masks, no dynamic control flow).
                g = math.gcd(W, S)
                Ps = S // g                  # slices per period (2 or 4)
                Pc = Ps * W // S             # chunks per period
                t0 = pb.slice_base + (i - pb.blk_start) * spb

                def slice_sum(chunk_at, base, lo, hi):
                    """Sum of period-relative sublanes [lo, hi)."""
                    u_lo, r_lo = divmod(lo, S)
                    u_end, r_end = divmod(hi, S)
                    if u_lo == u_end:        # W < S: inside one chunk
                        return jnp.sum(chunk_at(u_lo)[r_lo:r_end],
                                       axis=0, keepdims=True)
                    extra = None
                    u_start = u_lo
                    if r_lo:
                        extra = jnp.sum(chunk_at(u_lo)[r_lo:], axis=0,
                                        keepdims=True)
                        u_start += 1
                    if r_end:
                        part = jnp.sum(chunk_at(u_end)[:r_end], axis=0,
                                       keepdims=True)
                        extra = part if extra is None else extra + part
                    return sum_span(base + u_start * S,
                                    u_end - u_start, extra)

                def period_scores(p):
                    """Per-slice penalized scores of period p (boundary
                    chunks decoded once via the cache)."""
                    base = p * Ps * W
                    cache = {}

                    def chunk_at(u):
                        if u not in cache:
                            cache[u] = prod_at(base + u * S)
                        return cache[u]

                    return [
                        score_pen(
                            slice_sum(chunk_at, base, m * W, (m + 1) * W),
                            t0 + Ps * p + m)
                        for m in range(Ps)
                    ]

                def do_period(p):
                    for m, s in enumerate(period_scores(p)):
                        _topk_update(tv, tt, s, t0 + Ps * p + m + toff, K,
                                     tie_safe=tie_safe)

                nper = spb // Ps
                unrolled = nper * Pc <= 128
                if unrolled and tile > 1:
                    # strided period groups: sub-tile s collects slice s of
                    # periods gi_, gi_+Gp, ... — slice ids affine with
                    # stride Ps*Gp
                    Gp = -(-nper // tile)
                    for gi_ in range(Gp):
                        for m in range(tile):
                            p = gi_ + m * Gp
                            if p >= nper:
                                break
                            for s_idx, s in enumerate(period_scores(p)):
                                tadd(s_idx, s)
                        for s_idx in range(Ps):
                            tflush(s_idx, t0 + toff + Ps * gi_ + s_idx,
                                   Ps * Gp)
                elif unrolled:
                    for p in range(nper):
                        do_period(p)
                else:
                    jax.lax.fori_loop(
                        0, nper, lambda p, c: (do_period(p), c)[1], 0)
                for j in range(nper * Ps, spb):
                    # tail slices of a short block (boundary decodes not
                    # shared with neighbours — at most Ps - 1 slices)
                    s = slice_sum(lambda u: prod_at(u * S), 0,
                                  j * W, (j + 1) * W)
                    fold(s, t0 + j)
            else:
                # wide slice: accumulate a partial row sum across bps
                # blocks; folded at the slice's last block. The final
                # (short) block may hold fewer than block_sublanes real
                # sublanes — trailing words are zero-padded, harmless.
                accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                        for _ in range(2)]
                for u in range(block_sublanes // S):
                    w = words_ref[pl.ds(u * S, S), :]
                    accs[u % 2] = accs[u % 2] + \
                        prod(bcs, w, S, mask_lanes)
                # carry scratch is f32: one convert per BLOCK is noise
                psum = _to_f32(jnp.sum(accs[0] + accs[1], axis=0,
                                       keepdims=True))
                off = i - pb.blk_start
                last = (off % bps) == (bps - 1)

                @pl.when(~last)
                def _():
                    carry[:] = carry[:] + psum

                @pl.when(last)
                def _():
                    score = carry[:] + psum
                    carry[:] = jnp.zeros_like(carry)
                    t = pb.slice_base + off // bps
                    pen = jnp.where(t < pb.slice_base + nreal, 0.0, NEG_INF)
                    _topk_update(tv, tt, score + pen, t + toff, K,
                                 tie_safe=tie_safe)

    @pl.when(i == pl.num_programs(1 if part else 0) - 1)
    def _():
        topv_ref[...] = tv[:].reshape(topv_ref.shape)
        topt_ref[...] = tt[:].reshape(topt_ref.shape)


def _octet_flush(tv, tt, sc, oidx, pb, nreal, toff, S, K, tie_safe,
                 exact: bool):
    """Harvest one octet's (S, 128) score tile into the Top-K buffers.

    sc row m holds slice (oidx + m*stride)'s 128 row-scores (f32, no
    penalties yet). Applies the padding penalties (block-padding octets:
    oidx >= stride; slice-padding members: id >= nreal), then either the
    strided top-2-of-S fold (the octet layout's intrinsic fold_tile=8 —
    same semantics as _fused_kernel's tflush) or, in exact mode
    (cfg.fold_tile == 1), one Top-K update per member slice.
    """
    G = pb.stride
    miota = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    # block-padding octets (scalar select) + slice-padding members
    # (vector select, once per octet — amortized over width chunks)
    pen = jnp.where(oidx < G, 0.0, NEG_INF)   # scalar-unit select
    sc = sc + pen
    sc = jnp.where(oidx + miota * G < nreal, sc, NEG_INF)
    if exact:
        for mrow in range(S):
            t = pb.slice_base + oidx + mrow * G
            _topk_update(tv, tt, sc[mrow:mrow + 1], t + toff, K,
                         tie_safe=tie_safe)
        return
    # top-3-of-8: one more chain than the slice layout's tflush top-2.
    # Strided members make every octet contain exactly ONE slice of the
    # bucket's sigma-hot head segment; that member almost always takes a
    # fold slot, so a 2-slot fold leaves just one slot for the other 7
    # members (measured 0.992 mean precision@100 vs 1.0 for the slice
    # layout on the 50k h16 corpus; 3 slots restore 1.0 — see
    # experiments/octet_lab.py).
    base = pb.slice_base + oidx + toff
    for _ in range(3):
        m1 = jnp.max(sc, axis=0, keepdims=True)
        sl1 = jnp.min(jnp.where(sc == m1, miota, S), axis=0, keepdims=True)
        _topk_update(tv, tt, m1, base + sl1 * G, K, tie_safe=tie_safe)
        sc = jnp.where(miota == sl1, NEG_INF, sc)


def _fused_kernel_octet(nreal_ref, tab_ref, words_ref, topv_ref, topt_ref,
                        tv, tt, carry, *, cfg: TopKSpMVConfig,
                        plan: tuple, block_sublanes: int, codec: str = "f32",
                        mask_lanes: bool = True, part_slices: int = 0):
    """Fused kernel over the OCTET (slice-transposed) stream.

    Each (8, 128) chunk holds word j of eight strided slices (see
    formats/sell_buckets.py::fuse_buckets_octet), so the whole body is
    `acc += decode(chunk)` with NO sublane reductions, NO period-boundary
    splits, and NO width quantum — the three VPU taxes that kept the
    slice-layout kernel at ~10.4 cyc/chunk against its own 8.5 bare-body
    floor (ROOFLINE.md §2). The harvest is the strided top-2-of-8 fold
    (fold_tile=8 semantics); cfg.fold_tile == 1 selects exact per-member
    folds. Reference mapping: this removes loop_3 entirely — packets
    never straddle rows by construction (spmv_bscsr_top_k_multicore.hpp:
    246-326 has no TPU counterpart here).
    """
    tie_safe = cfg.tie_safe_topk
    part = part_slices > 0
    i = pl.program_id(1 if part else 0)
    toff = pl.program_id(0) * part_slices if part else 0
    S = cfg.chunk_sublanes
    K = cfg.lane_k
    exact = cfg.fold_tile == 1

    @pl.when(i == 0)
    def _():
        tv[:] = (jnp.full_like(tv, NEG_INF) if tie_safe
                 else _topk_init(tv.shape[0]))
        tt[:] = jnp.zeros_like(tt)
        carry[:] = jnp.zeros_like(carry)

    shape = (S, LANES)
    bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
           for c in range(tab_ref.shape[0])]
    prod = _codec_prod(codec)

    for bi, pb in enumerate(plan):
        W = pb.width
        opb = pb.octets_per_block
        bpo = pb.blocks_per_octet

        @pl.when((i >= pb.blk_start) & (i < pb.blk_start + pb.num_blocks))
        def _(bi=bi, pb=pb, W=W, opb=opb, bpo=bpo):
            nreal = nreal_ref[0, bi, 0] if part else nreal_ref[bi, 0]

            def prod_at(sub):
                w = words_ref[pl.ds(sub, S), :]
                return prod(bcs, w, S, mask_lanes)

            def flush(sc, oidx):
                _octet_flush(tv, tt, sc, oidx, pb, nreal, toff, S, K,
                             tie_safe, exact)

            if bpo == 1:
                for o in range(opb):
                    n_acc = 2 if W >= 2 else 1
                    accs = [jnp.zeros(shape, _acc_dtype(codec))
                            for _ in range(n_acc)]
                    for j in range(W):
                        accs[j % n_acc] = accs[j % n_acc] + \
                            prod_at((o * W + j) * S)
                    acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
                    flush(_to_f32(acc), (i - pb.blk_start) * opb + o)
            else:
                # wide octet (8W > block): carry the (8, 128) partial tile
                # across bpo blocks (trailing zero words are harmless)
                accs = [jnp.zeros(shape, _acc_dtype(codec))
                        for _ in range(2)]
                for u in range(block_sublanes // S):
                    accs[u % 2] = accs[u % 2] + prod_at(u * S)
                psum = _to_f32(accs[0] + accs[1])
                off = i - pb.blk_start
                last = (off % bpo) == (bpo - 1)

                @pl.when(~last)
                def _():
                    carry[:] = carry[:] + psum

                @pl.when(last)
                def _():
                    flush(carry[:] + psum, off // bpo)
                    carry[:] = jnp.zeros_like(carry)

    @pl.when(i == pl.num_programs(1 if part else 0) - 1)
    def _():
        topv_ref[...] = tv[:].reshape(topv_ref.shape)
        topt_ref[...] = tt[:].reshape(topt_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "interpret", "codec"),
)
def topk_spmv_fused_device(
    words, table, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int,
    interpret: bool = False, codec: str = "f32",
):
    """Whole-matrix fused kernel (all buckets, one call).

    words: (num_blocks * block_sublanes, 128) int32 fused stream.
    nreal: (num_buckets, 1) int32 real slice count per bucket (dynamic —
      sharded shards with different fill share one compiled kernel).
    Returns (topv, topt) of (lane_k, 128): candidates already merged
    across all buckets.
    """
    K = cfg.lane_k
    kernel = functools.partial(
        _fused_kernel, cfg=cfg, plan=plan, block_sublanes=block_sublanes,
        codec=codec, mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((nreal.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.float32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.float32),
            # tilebuf: fold_tile (<=8) scores per sub-tile x Ps (<=8)
            # sub-tiles per period (quantum-1 odd widths use all 64)
            pltpu.VMEM((64, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nreal, table, words)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "num_partitions", "part_slices", "interpret", "codec"),
)
def topk_spmv_fused_part_device(
    words, table, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int, num_partitions: int,
    part_slices: int, interpret: bool = False, codec: str = "f32",
):
    """Partitioned fused kernel: P row partitions on a PARALLEL grid axis.

    The TPU analog of the reference's 8 CU x 4 sub-partition hierarchy
    (types.hpp:36-38, SLR placement Makefile:58-65): every partition
    shares one compiled plan skeleton and sweeps its own block stream; on
    megacore chips (v4/v5p) Mosaic places partitions on separate cores.

    words: (P * num_blocks * block_sublanes, 128) int32 — partition-major.
    nreal: (P, num_buckets, 1) int32 real slice counts per partition.
    part_slices: rows of one partition's row_ids table (total_slices + 1);
      stored candidate indices are offset by p * part_slices, so finalize
      resolves them against the (P * part_slices, 128) stacked row_ids.
    Returns (topv, topt) of (P, lane_k, 128).
    """
    K = cfg.lane_k
    kernel = functools.partial(
        _fused_kernel, cfg=cfg, plan=plan, block_sublanes=block_sublanes,
        codec=codec, mask_lanes=interpret, part_slices=part_slices,
    )
    P = num_partitions
    return pl.pallas_call(
        kernel,
        grid=(P, num_blocks),
        in_specs=[
            pl.BlockSpec((1, nreal.shape[1], 1), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((table.shape[0], LANES), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES),
                         lambda p, i, nb=num_blocks: (p * nb + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, LANES), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, LANES), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((P, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.float32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.float32),
            # tilebuf: fold_tile (<=8) scores per sub-tile x Ps (<=8)
            # sub-tiles per period (quantum-1 odd widths use all 64)
            pltpu.VMEM((64, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(nreal, table, words)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "interpret", "codec"),
)
def topk_spmv_fused_octet_device(
    words, table, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int,
    interpret: bool = False, codec: str = "f32",
):
    """Whole-matrix OCTET-layout kernel (see _fused_kernel_octet).

    Same contract as topk_spmv_fused_device but `words` is the
    slice-transposed stream of fuse_buckets_octet and `plan` is a tuple
    of OctetBucket. The carry scratch is a full (chunk_sublanes, 128)
    partial-score tile (wide octets span blocks whole, not per-slice).

    Dispatch (cfg.octet_multicall, default True): ONE pallas_call per
    bucket — each call has a single static width and ZERO bucket range
    predicates, its block range addressed by an index_map offset — then
    one per-lane top-K merge over the stacked per-bucket candidates.
    Removing the per-grid-step `pl.when` predicate chain (15 predicates
    at quantum-2) measured +2.5% on the 10M headline corpus (177.8 vs
    173.5 Gnnz/s, interleaved slopes — experiments/octet_multicall_lab)
    and compiles faster; the B pipeline-ramp restarts cost less than the
    predicates. cfg.octet_multicall=False keeps the single fused call
    (the only option for the partitioned grid, which needs one call per
    partition axis anyway — see topk_spmv_fused_octet_part_device).
    """
    if cfg.octet_multicall and len(plan) > 1:
        return _octet_multicall(words, table, nreal, cfg=cfg, plan=plan,
                                block_sublanes=block_sublanes,
                                interpret=interpret, codec=codec)
    K = cfg.lane_k
    S = cfg.chunk_sublanes
    kernel = functools.partial(
        _fused_kernel_octet, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec, mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((nreal.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.float32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((S, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nreal, table, words)


def _octet_multicall(words, table, nreal, *, cfg: TopKSpMVConfig,
                     plan: tuple, block_sublanes: int,
                     interpret: bool = False, codec: str = "f32"):
    """Per-bucket pallas_calls over the octet stream + candidate merge.

    Each bucket's call reuses _fused_kernel_octet with a one-entry plan
    rebased to blk_start=0; the words BlockSpec offsets grid step i to
    global block (bucket.blk_start + i), so the stream bytes move exactly
    once, same as the fused call. Candidate (value, tag) pairs merge with
    one lax.top_k per lane — B*lane_k values, trivially cheap next to the
    sweep. Tie caveat: the non-tie-safe _topk_update drops score-tied
    candidates order-dependently, so the bottom buffer slots can differ
    from the fused call at exact score ties (both variants drop ties;
    the rescore pool absorbs it — config.tie_safe_topk forces exactness).
    """
    K = cfg.lane_k
    S = cfg.chunk_sublanes
    tvs, tts = [], []
    for bidx, pb in enumerate(plan):
        pb0 = dataclasses.replace(pb, blk_start=0)
        kernel = functools.partial(
            _fused_kernel_octet, cfg=cfg, plan=(pb0,),
            block_sublanes=block_sublanes, codec=codec,
            mask_lanes=interpret)
        tv, tt = pl.pallas_call(
            kernel,
            grid=(pb.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_sublanes, LANES),
                             lambda i, s=pb.blk_start: (s + i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((K, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K, LANES), jnp.float32),
                jax.ShapeDtypeStruct((K, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((K, LANES), jnp.float32),
                pltpu.VMEM((K, LANES), jnp.int32),
                pltpu.VMEM((S, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(nreal[bidx:bidx + 1], table, words)
        tvs.append(tv)
        tts.append(tt)
    allv = jnp.concatenate(tvs, axis=0)        # (B * K, 128)
    allt = jnp.concatenate(tts, axis=0)
    mv, mi = jax.lax.top_k(allv.T, K)          # (128, K)
    mt = jnp.take_along_axis(allt.T, mi, axis=1)
    return mv.T, mt.T


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "num_partitions", "part_slices", "interpret", "codec"),
)
def topk_spmv_fused_octet_part_device(
    words, table, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int, num_partitions: int,
    part_slices: int, interpret: bool = False, codec: str = "f32",
):
    """Partitioned octet kernel: P row partitions on a PARALLEL grid axis
    (megacore), octet stream per partition. Same geometry contract as
    topk_spmv_fused_part_device."""
    K = cfg.lane_k
    S = cfg.chunk_sublanes
    kernel = functools.partial(
        _fused_kernel_octet, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec, mask_lanes=interpret,
        part_slices=part_slices,
    )
    P = num_partitions
    return pl.pallas_call(
        kernel,
        grid=(P, num_blocks),
        in_specs=[
            pl.BlockSpec((1, nreal.shape[1], 1), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((table.shape[0], LANES), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES),
                         lambda p, i, nb=num_blocks: (p * nb + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, LANES), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, LANES), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((P, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.float32),
            pltpu.VMEM((K, LANES), jnp.int32),
            pltpu.VMEM((S, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(nreal, table, words)


def _fused_kernel_batch(nreal_ref, tab_ref, words_ref, topv_ref, topt_ref,
                        tv, tt, carry, *, cfg: TopKSpMVConfig, plan: tuple,
                        block_sublanes: int, codec: str,
                        num_queries: int, table_rows: int,
                        mask_lanes: bool = True, part_slices: int = 0):
    """Multi-query fused kernel: one pallas_call over all buckets AND all
    queries of a group — each matrix block is decoded once and its HBM
    traffic is amortized across the Q query tables (the SpMM analog of
    multi_spmv_gold, gold_algorithms.hpp:21-35).

    Queries are processed in sub-groups of cfg.batch_subgroup (0 = all
    live at once — the measured v5e optimum at every group size up to 64:
    no register-spill cliff, see config.batch_subgroup); each chunk's
    query-independent decode is computed once per sub-group via
    _codec_split. The explicit split measured neutral vs Mosaic CSE of a
    repeated full decode (experiments/batch_lab.py) and is kept for the
    explicit shared/per-query boundary it gives the sub-group loop.

    part_slices > 0 adds a leading PARALLEL grid axis of row partitions
    exactly as in _fused_kernel (the megacore P2 analog, types.hpp:36-38):
    stored slice indices are offset by p * part_slices so the (Q, P, K,
    128) candidates resolve against the stacked row_ids."""
    tie_safe = cfg.tie_safe_topk
    part = part_slices > 0
    i = pl.program_id(1 if part else 0)
    toff = pl.program_id(0) * part_slices if part else 0
    S = cfg.chunk_sublanes
    K = cfg.lane_k
    Q = num_queries
    TR = table_rows
    QG = cfg.batch_subgroup or Q
    subgroups = [(q0, min(QG, Q - q0)) for q0 in range(0, Q, QG)]

    @pl.when(i == 0)
    def _():
        tv[:] = (jnp.full_like(tv, NEG_INF) if tie_safe
                 else jnp.broadcast_to(_topk_init(K), tv.shape))
        tt[:] = jnp.zeros_like(tt)
        carry[:] = jnp.zeros_like(carry)

    shape = (S, LANES)
    bcs_q = [
        [jnp.broadcast_to(tab_ref[q * TR + c:q * TR + c + 1, :], shape)
         for c in range(TR)]
        for q in range(Q)
    ]
    shared_fn, apply_fn = _codec_split(codec)

    def fold(q, score, t, nreal, slice_base):
        # scalar-unit padding penalty (see _fused_kernel.fold)
        pen = jnp.where(t < slice_base + nreal, 0.0, NEG_INF)
        score = _to_f32(score) + pen
        cur = tv[q]
        cur_min = jnp.min(cur, axis=0, keepdims=True)
        if tie_safe:
            iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
            slot = jnp.min(jnp.where(cur == cur_min, iota, K), axis=0,
                           keepdims=True)
            replace = (iota == slot) & (score >= cur_min)
        else:
            replace = (cur == cur_min) & (score >= cur_min)
        tv[q] = jnp.where(replace, score, cur)
        tt[q] = jnp.where(replace, t + toff, tt[q])

    for bi, pb in enumerate(plan):
        W = pb.width
        spb = pb.slices_per_block
        bps = pb.blocks_per_slice

        @pl.when((i >= pb.blk_start) & (i < pb.blk_start + pb.num_blocks))
        def _(bi=bi, pb=pb, W=W, spb=spb, bps=bps):
            nreal = nreal_ref[0, bi, 0] if part else nreal_ref[bi, 0]

            def shared_at(sub):
                w = words_ref[pl.ds(sub, S), :]
                return shared_fn(w, mask_lanes)

            def sums_span_sub(q0, ng, sub0, n_chunks, extras=None):
                """Per-subgroup-query sums of n_chunks full chunks."""
                accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                        for _ in range(ng)]
                for u in range(n_chunks):
                    sh = shared_at(sub0 + u * S)
                    for dq in range(ng):
                        accs[dq] = accs[dq] + apply_fn(bcs_q[q0 + dq], sh)
                out = [jnp.sum(a, axis=0, keepdims=True) for a in accs]
                if extras is not None:
                    out = [o + e for o, e in zip(out, extras)]
                return out

            if bps == 1 and W % S == 0:
                def do_slice(j):
                    t = pb.slice_base + (i - pb.blk_start) * spb + j
                    for q0, ng in subgroups:
                        for dq, s in enumerate(
                                sums_span_sub(q0, ng, j * W, W // S)):
                            fold(q0 + dq, s, t, nreal, pb.slice_base)

                if spb * max(W // S, 1) * Q <= _BATCH_UNROLL_LIMIT:
                    for j in range(spb):
                        do_slice(j)
                else:
                    jax.lax.fori_loop(
                        0, spb, lambda j, c: (do_slice(j), c)[1], 0)
            elif bps == 1:
                # generic even-width period fold (see _fused_kernel) — run
                # per sub-group so boundary-chunk products are cached for
                # ng queries at a time
                g = math.gcd(W, S)
                Ps = S // g
                Pc = Ps * W // S
                t0 = pb.slice_base + (i - pb.blk_start) * spb

                def slices_sum(q0, ng, chunks_at, base, lo, hi):
                    """Sub-group sums of period-relative sublanes [lo, hi)."""
                    u_lo, r_lo = divmod(lo, S)
                    u_end, r_end = divmod(hi, S)
                    if u_lo == u_end:
                        return [jnp.sum(c[r_lo:r_end], axis=0, keepdims=True)
                                for c in chunks_at(u_lo)]
                    extras = None
                    u_start = u_lo
                    if r_lo:
                        extras = [jnp.sum(c[r_lo:], axis=0, keepdims=True)
                                  for c in chunks_at(u_lo)]
                        u_start += 1
                    if r_end:
                        parts = [jnp.sum(c[:r_end], axis=0, keepdims=True)
                                 for c in chunks_at(u_end)]
                        extras = parts if extras is None else \
                            [e + p_ for e, p_ in zip(extras, parts)]
                    return sums_span_sub(q0, ng, base + u_start * S,
                                         u_end - u_start, extras)

                def do_period(p):
                    base = p * Ps * W
                    for q0, ng in subgroups:
                        cache = {}

                        def chunks_at(u, q0=q0, ng=ng, cache=cache):
                            if u not in cache:
                                sh = shared_at(base + u * S)
                                cache[u] = [apply_fn(bcs_q[q0 + dq], sh)
                                            for dq in range(ng)]
                            return cache[u]

                        for m in range(Ps):
                            ss = slices_sum(q0, ng, chunks_at, base,
                                            m * W, (m + 1) * W)
                            for dq in range(ng):
                                fold(q0 + dq, ss[dq], t0 + Ps * p + m,
                                     nreal, pb.slice_base)

                nper = spb // Ps
                if nper * Pc * Q <= _BATCH_UNROLL_LIMIT:
                    for p in range(nper):
                        do_period(p)
                else:
                    jax.lax.fori_loop(
                        0, nper, lambda p, c: (do_period(p), c)[1], 0)
                for j in range(nper * Ps, spb):
                    for q0, ng in subgroups:
                        cache = {}

                        def tail_at(u, q0=q0, ng=ng, cache=cache):
                            if u not in cache:
                                sh = shared_at(u * S)
                                cache[u] = [apply_fn(bcs_q[q0 + dq], sh)
                                            for dq in range(ng)]
                            return cache[u]

                        ss = slices_sum(q0, ng, tail_at, 0,
                                        j * W, (j + 1) * W)
                        for dq in range(ng):
                            fold(q0 + dq, ss[dq], t0 + j, nreal,
                                 pb.slice_base)
            else:
                # wide slice: per-sub-group accumulate across the block
                psums = [None] * Q
                for q0, ng in subgroups:
                    accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                            for _ in range(ng)]
                    for u in range(block_sublanes // S):
                        sh = shared_at(u * S)
                        for dq in range(ng):
                            accs[dq] = accs[dq] + apply_fn(
                                bcs_q[q0 + dq], sh)
                    for dq in range(ng):
                        psums[q0 + dq] = _to_f32(
                            jnp.sum(accs[dq], axis=0))
                off = i - pb.blk_start
                last = (off % bps) == (bps - 1)

                @pl.when(~last)
                def _():
                    for q in range(Q):
                        carry[q] = carry[q] + psums[q]

                @pl.when(last)
                def _():
                    t = pb.slice_base + off // bps
                    for q in range(Q):
                        score = (carry[q] + psums[q])[None, :]
                        carry[q] = jnp.zeros_like(carry[q])
                        fold(q, score, t, nreal, pb.slice_base)

    @pl.when(i == pl.num_programs(1 if part else 0) - 1)
    def _():
        topv_ref[...] = tv[:].reshape(topv_ref.shape)
        topt_ref[...] = tt[:].reshape(topt_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "interpret", "codec"),
)
def topk_spmv_fused_batch_device(
    words, tables, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int,
    interpret: bool = False, codec: str = "f32",
):
    """Fused multi-query kernel. tables: (Q, table_rows, 128); returns
    (topv, topt) of (Q, lane_k, 128)."""
    Q, TR, _ = tables.shape
    K = cfg.lane_k
    kernel = functools.partial(
        _fused_kernel_batch, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec,
        num_queries=Q, table_rows=TR, mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((nreal.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q * TR, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Q, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, K, LANES), jnp.float32),
            pltpu.VMEM((Q, K, LANES), jnp.int32),
            pltpu.VMEM((Q, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nreal, tables.reshape(Q * TR, LANES), words)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "num_partitions", "part_slices", "interpret", "codec"),
)
def topk_spmv_fused_batch_part_device(
    words, tables, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int, num_partitions: int,
    part_slices: int, interpret: bool = False, codec: str = "f32",
):
    """Partitioned multi-query kernel: P row partitions on a PARALLEL
    grid axis (megacore, like topk_spmv_fused_part_device) sweeping Q
    query tables per block decode — the batch path keeps both cores of a
    v4/v5p chip busy instead of falling back to one query at a time.

    words: (P * num_blocks * block_sublanes, 128) int32, partition-major.
    tables: (Q, table_rows, 128); nreal: (P, num_buckets, 1) int32.
    Returns (topv, topt) of (Q, P, lane_k, 128) — vmap finalize_topk over
    axis 0 against the (P * part_slices, 128) stacked row_ids.
    """
    Q, TR, _ = tables.shape
    K = cfg.lane_k
    P = num_partitions
    kernel = functools.partial(
        _fused_kernel_batch, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec,
        num_queries=Q, table_rows=TR, mask_lanes=interpret,
        part_slices=part_slices,
    )
    return pl.pallas_call(
        kernel,
        grid=(P, num_blocks),
        in_specs=[
            pl.BlockSpec((1, nreal.shape[1], 1), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q * TR, LANES), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES),
                         lambda p, i, nb=num_blocks: (p * nb + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, 1, K, LANES), lambda p, i: (0, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1, K, LANES), lambda p, i: (0, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, P, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Q, P, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, K, LANES), jnp.float32),
            pltpu.VMEM((Q, K, LANES), jnp.int32),
            pltpu.VMEM((Q, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(nreal, tables.reshape(Q * TR, LANES), words)


def _fused_kernel_batch_octet(nreal_ref, tab_ref, words_ref, topv_ref,
                              topt_ref, tv, tt, carry, *,
                              cfg: TopKSpMVConfig, plan: tuple,
                              block_sublanes: int, codec: str,
                              num_queries: int, table_rows: int,
                              mask_lanes: bool = True,
                              part_slices: int = 0):
    """Multi-query kernel over the OCTET stream (see _fused_kernel_octet).

    The octet layout's win compounds with batching: the slice batch
    kernel pays Q per-slice sublane reductions and Q sets of boundary-
    chunk stitches per block; here each query's work is exactly
    `acc_q += apply(bcs_q, shared)` per chunk plus one strided fold per
    octet — the shared decode is still computed once per chunk for the
    whole sub-group (_codec_split)."""
    tie_safe = cfg.tie_safe_topk
    part = part_slices > 0
    i = pl.program_id(1 if part else 0)
    toff = pl.program_id(0) * part_slices if part else 0
    S = cfg.chunk_sublanes
    K = cfg.lane_k
    Q = num_queries
    TR = table_rows
    QG = cfg.batch_subgroup or Q
    subgroups = [(q0, min(QG, Q - q0)) for q0 in range(0, Q, QG)]
    exact = cfg.fold_tile == 1

    @pl.when(i == 0)
    def _():
        tv[:] = (jnp.full_like(tv, NEG_INF) if tie_safe
                 else jnp.broadcast_to(_topk_init(K), tv.shape))
        tt[:] = jnp.zeros_like(tt)
        carry[:] = jnp.zeros_like(carry)

    shape = (S, LANES)
    bcs_q = [
        [jnp.broadcast_to(tab_ref[q * TR + c:q * TR + c + 1, :], shape)
         for c in range(TR)]
        for q in range(Q)
    ]
    shared_fn, apply_fn = _codec_split(codec)
    miota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    def flush(q, sc, oidx, pb, nreal):
        """Per-query octet harvest (same fold as _octet_flush, inline
        buffer update on the (Q, K, 128) scratch)."""
        G = pb.stride
        pen = jnp.where(oidx < G, 0.0, NEG_INF)      # block-pad octets
        sc = sc + pen
        sc = jnp.where(oidx + miota * G < nreal, sc, NEG_INF)
        base = pb.slice_base + oidx + toff

        def upd(score, t):
            cur = tv[q]
            cur_min = jnp.min(cur, axis=0, keepdims=True)
            if tie_safe:
                iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
                slot = jnp.min(jnp.where(cur == cur_min, iota, K), axis=0,
                               keepdims=True)
                replace = (iota == slot) & (score >= cur_min)
            else:
                replace = (cur == cur_min) & (score >= cur_min)
            tv[q] = jnp.where(replace, score, cur)
            tt[q] = jnp.where(replace, t, tt[q])

        if exact:
            for m in range(S):
                upd(sc[m:m + 1], base + m * G)
            return
        for _ in range(3):                           # top-3-of-8
            m1 = jnp.max(sc, axis=0, keepdims=True)
            sl1 = jnp.min(jnp.where(sc == m1, miota, S), axis=0,
                          keepdims=True)
            upd(m1, base + sl1 * G)
            sc = jnp.where(miota == sl1, NEG_INF, sc)

    for bi, pb in enumerate(plan):
        W = pb.width
        opb = pb.octets_per_block
        bpo = pb.blocks_per_octet

        @pl.when((i >= pb.blk_start) & (i < pb.blk_start + pb.num_blocks))
        def _(bi=bi, pb=pb, W=W, opb=opb, bpo=bpo):
            nreal = nreal_ref[0, bi, 0] if part else nreal_ref[bi, 0]

            def shared_at(sub):
                w = words_ref[pl.ds(sub, S), :]
                return shared_fn(w, mask_lanes)

            if bpo == 1:
                def do_octet(o):
                    oidx = (i - pb.blk_start) * opb + o
                    for q0, ng in subgroups:
                        accs = [jnp.zeros(shape, _acc_dtype(codec))
                                for _ in range(ng)]
                        for j in range(W):
                            sh = shared_at((o * W + j) * S)
                            for dq in range(ng):
                                accs[dq] = accs[dq] + apply_fn(
                                    bcs_q[q0 + dq], sh)
                        for dq in range(ng):
                            flush(q0 + dq, _to_f32(accs[dq]), oidx, pb,
                                  nreal)

                # bound the unrolled program: opb*W*Q chunk-applies per
                # branch explode at batch sizes (same guard as the slice
                # batch kernel's spb*(W/S)*Q <= 256)
                if opb * W * Q <= _BATCH_UNROLL_LIMIT:
                    for o in range(opb):
                        do_octet(o)
                else:
                    jax.lax.fori_loop(
                        0, opb, lambda o, c: (do_octet(o), c)[1], 0)
            else:
                # wide octet: carry each query's (8, 128) partial tile.
                # fori over chunks with ONE stacked (Q, 8, 128) carry —
                # unrolling 128 chunks x Q live accumulators blew Mosaic's
                # scoped-vmem stack at Q=64 (29.6M > 16M limit).
                def chunk_body(u, acc):
                    sh = shared_at(u * S)
                    return acc + jnp.stack(
                        [apply_fn(bcs_q[q], sh) for q in range(Q)])

                acc = jax.lax.fori_loop(
                    0, block_sublanes // S, chunk_body,
                    jnp.zeros((Q, S, LANES), _acc_dtype(codec)))
                psums = _to_f32(acc)
                off = i - pb.blk_start
                last = (off % bpo) == (bpo - 1)

                @pl.when(~last)
                def _():
                    carry[:] = carry[:] + psums

                @pl.when(last)
                def _():
                    oidx = off // bpo
                    for q in range(Q):
                        flush(q, carry[q] + psums[q], oidx, pb, nreal)
                    carry[:] = jnp.zeros_like(carry)

    @pl.when(i == pl.num_programs(1 if part else 0) - 1)
    def _():
        topv_ref[...] = tv[:].reshape(topv_ref.shape)
        topt_ref[...] = tt[:].reshape(topt_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "interpret", "codec"),
)
def topk_spmv_fused_batch_octet_device(
    words, tables, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int,
    interpret: bool = False, codec: str = "f32",
):
    """Multi-query octet kernel. tables: (Q, table_rows, 128); returns
    (topv, topt) of (Q, lane_k, 128)."""
    Q, TR, _ = tables.shape
    K = cfg.lane_k
    S = cfg.chunk_sublanes
    kernel = functools.partial(
        _fused_kernel_batch_octet, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec,
        num_queries=Q, table_rows=TR, mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((nreal.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q * TR, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Q, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, K, LANES), jnp.float32),
            pltpu.VMEM((Q, K, LANES), jnp.int32),
            pltpu.VMEM((Q, S, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nreal, tables.reshape(Q * TR, LANES), words)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "num_partitions", "part_slices", "interpret", "codec"),
)
def topk_spmv_fused_batch_octet_part_device(
    words, tables, nreal, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int, num_partitions: int,
    part_slices: int, interpret: bool = False, codec: str = "f32",
):
    """Partitioned multi-query octet kernel (megacore parallel axis).
    Same geometry contract as topk_spmv_fused_batch_part_device."""
    Q, TR, _ = tables.shape
    K = cfg.lane_k
    S = cfg.chunk_sublanes
    P = num_partitions
    kernel = functools.partial(
        _fused_kernel_batch_octet, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec,
        num_queries=Q, table_rows=TR, mask_lanes=interpret,
        part_slices=part_slices,
    )
    return pl.pallas_call(
        kernel,
        grid=(P, num_blocks),
        in_specs=[
            pl.BlockSpec((1, nreal.shape[1], 1), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q * TR, LANES), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES),
                         lambda p, i, nb=num_blocks: (p * nb + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, 1, K, LANES), lambda p, i: (0, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1, K, LANES), lambda p, i: (0, p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, P, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Q, P, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, K, LANES), jnp.float32),
            pltpu.VMEM((Q, K, LANES), jnp.int32),
            pltpu.VMEM((Q, S, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(nreal, tables.reshape(Q * TR, LANES), words)


def _fused_scores_kernel(tab_ref, words_ref, out_ref, carry, *,
                         cfg: TopKSpMVConfig, plan: tuple,
                         block_sublanes: int, max_spb: int, codec: str,
                         mask_lanes: bool = True, part: bool = False):
    """Plain SpMV over the FUSED stream: per-slice dense scores, no Top-K.

    The production-config scores path (parity with the reference's
    SpMV-only hosts, host_spmv_csr_gpu.cu:171-231): same bucket plan,
    period folds, and wide-slice carry as _fused_kernel, but every slice
    score is written to the output block instead of entering the Top-K
    buffers — so it works for any width_quantum, partitioned engines
    (leading parallel grid axis), and load()ed snapshots (needs only the
    fused stream). Output block row j holds slice slice_base + blk*spb + j;
    rows past a bucket's slices_per_block (and block-padding slices) are
    left unwritten/garbage — the host scatter reads only real slices.
    """
    i = pl.program_id(1 if part else 0)
    S = cfg.chunk_sublanes

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    shape = (S, LANES)
    bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
           for c in range(tab_ref.shape[0])]
    prod = _codec_prod(codec)

    if part:  # out_ref block is (1, 1, max_spb, L) / (1, max_spb, L)
        def write(j, score):
            out_ref[0, 0, pl.ds(j, 1), :] = score
    else:
        def write(j, score):
            out_ref[0, pl.ds(j, 1), :] = score

    for bi, pb in enumerate(plan):
        W = pb.width
        spb = pb.slices_per_block
        bps = pb.blocks_per_slice

        @pl.when((i >= pb.blk_start) & (i < pb.blk_start + pb.num_blocks))
        def _(bi=bi, pb=pb, W=W, spb=spb, bps=bps):
            def prod_at(sub):
                w = words_ref[pl.ds(sub, S), :]
                return prod(bcs, w, S, mask_lanes)

            def sum_span(sub0, n_chunks, extra=None):
                if n_chunks == 0:
                    return extra if extra is not None \
                        else jnp.zeros((1, LANES), _acc_dtype(codec))
                n_acc = 2 if n_chunks >= 2 else 1
                accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                        for _ in range(n_acc)]
                for u in range(n_chunks):
                    accs[u % n_acc] = accs[u % n_acc] + prod_at(sub0 + u * S)
                acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
                s = jnp.sum(acc, axis=0, keepdims=True)
                return s if extra is None else s + extra

            if bps == 1 and W % S == 0:
                def do_slice(j):
                    write(j, _to_f32(sum_span(j * W, W // S)))

                if spb * max(W // S, 1) <= 128:
                    for j in range(spb):
                        do_slice(j)
                else:
                    jax.lax.fori_loop(
                        0, spb, lambda j, c: (do_slice(j), c)[1], 0)
            elif bps == 1:
                # period fold for non-chunk-multiple widths (see
                # _fused_kernel): boundary chunks decoded once per period
                g = math.gcd(W, S)
                Ps = S // g
                Pc = Ps * W // S

                def slice_sum(chunk_at, base, lo, hi):
                    u_lo, r_lo = divmod(lo, S)
                    u_end, r_end = divmod(hi, S)
                    if u_lo == u_end:
                        return jnp.sum(chunk_at(u_lo)[r_lo:r_end],
                                       axis=0, keepdims=True)
                    extra = None
                    u_start = u_lo
                    if r_lo:
                        extra = jnp.sum(chunk_at(u_lo)[r_lo:], axis=0,
                                        keepdims=True)
                        u_start += 1
                    if r_end:
                        part_ = jnp.sum(chunk_at(u_end)[:r_end], axis=0,
                                        keepdims=True)
                        extra = part_ if extra is None else extra + part_
                    return sum_span(base + u_start * S,
                                    u_end - u_start, extra)

                def do_period(p):
                    base = p * Ps * W
                    cache = {}

                    def chunk_at(u):
                        if u not in cache:
                            cache[u] = prod_at(base + u * S)
                        return cache[u]

                    for m in range(Ps):
                        write(p * Ps + m,
                              _to_f32(slice_sum(chunk_at, base,
                                                m * W, (m + 1) * W)))

                nper = spb // Ps
                if nper * Pc <= 128:
                    for p in range(nper):
                        do_period(p)
                else:
                    jax.lax.fori_loop(
                        0, nper, lambda p, c: (do_period(p), c)[1], 0)
                for j in range(nper * Ps, spb):
                    s = slice_sum(lambda u: prod_at(u * S), 0,
                                  j * W, (j + 1) * W)
                    write(j, _to_f32(s))
            else:
                # wide slice: carry the partial sum across bps blocks
                psum = _to_f32(sum_span(0, block_sublanes // S))
                off = i - pb.blk_start
                last = (off % bps) == (bps - 1)

                @pl.when(~last)
                def _():
                    carry[:] = carry[:] + psum

                @pl.when(last)
                def _():
                    write(0, carry[:] + psum)
                    carry[:] = jnp.zeros_like(carry)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "num_partitions", "interpret", "codec"),
)
def spmv_fused_scores_device(
    words, table, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int, num_partitions: int = 1,
    interpret: bool = False, codec: str = "f32",
):
    """Dense per-slice scores over the fused stream.

    Returns (P, num_blocks, max_spb, 128) f32 — P = num_partitions (1 for
    plain engines): block b's row j holds the score of the j-th slice of
    that block under its bucket's geometry; only the first
    slices_per_block rows of each block (and only real slices) are
    meaningful — see TopKSpMV.scores() for the host scatter."""
    max_spb = max(pb.slices_per_block for pb in plan)
    P = num_partitions
    part = P > 1
    kernel = functools.partial(
        _fused_scores_kernel, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, max_spb=max_spb, codec=codec,
        mask_lanes=interpret, part=part,
    )
    grid = (P, num_blocks) if part else (num_blocks,)
    if part:
        in_specs = [
            pl.BlockSpec((table.shape[0], LANES), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES),
                         lambda p, i, nb=num_blocks: (p * nb + i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, 1, max_spb, LANES),
                                 lambda p, i: (p, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        in_specs = [
            pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, max_spb, LANES), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct(
            ((P, num_blocks, max_spb, LANES) if part
             else (num_blocks, max_spb, LANES)), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")) if part
            else None),
        interpret=interpret,
    )(table, words)
    return out if part else out[None]


def _fused_scores_kernel_octet(tab_ref, words_ref, out_ref, carry, *,
                               cfg: TopKSpMVConfig, plan: tuple,
                               block_sublanes: int, codec: str,
                               mask_lanes: bool = True, part: bool = False):
    """Plain SpMV over the OCTET stream: each octet's accumulated (8, 128)
    tile IS eight slices' scores — written straight to the output block at
    rows [o*8, (o+1)*8). Member row m of octet oidx holds slice
    oidx + m*stride (see TopKSpMV.scores for the host transpose)."""
    i = pl.program_id(1 if part else 0)
    S = cfg.chunk_sublanes

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    shape = (S, LANES)
    bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
           for c in range(tab_ref.shape[0])]
    prod = _codec_prod(codec)

    if part:
        def write(r, tile):
            out_ref[0, 0, pl.ds(r, S), :] = tile
    else:
        def write(r, tile):
            out_ref[0, pl.ds(r, S), :] = tile

    for bi, pb in enumerate(plan):
        W = pb.width
        opb = pb.octets_per_block
        bpo = pb.blocks_per_octet

        @pl.when((i >= pb.blk_start) & (i < pb.blk_start + pb.num_blocks))
        def _(bi=bi, pb=pb, W=W, opb=opb, bpo=bpo):
            def prod_at(sub):
                w = words_ref[pl.ds(sub, S), :]
                return prod(bcs, w, S, mask_lanes)

            if bpo == 1:
                for o in range(opb):
                    n_acc = 2 if W >= 2 else 1
                    accs = [jnp.zeros(shape, _acc_dtype(codec))
                            for _ in range(n_acc)]
                    for j in range(W):
                        accs[j % n_acc] = accs[j % n_acc] + \
                            prod_at((o * W + j) * S)
                    acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
                    write(o * S, _to_f32(acc))
            else:
                accs = [jnp.zeros(shape, _acc_dtype(codec))
                        for _ in range(2)]
                for u in range(block_sublanes // S):
                    accs[u % 2] = accs[u % 2] + prod_at(u * S)
                psum = _to_f32(accs[0] + accs[1])
                off = i - pb.blk_start
                last = (off % bpo) == (bpo - 1)

                @pl.when(~last)
                def _():
                    carry[:] = carry[:] + psum

                @pl.when(last)
                def _():
                    write(0, carry[:] + psum)
                    carry[:] = jnp.zeros_like(carry)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "plan", "block_sublanes", "num_blocks",
                     "num_partitions", "interpret", "codec"),
)
def spmv_fused_scores_octet_device(
    words, table, *, cfg: TopKSpMVConfig, plan: tuple,
    block_sublanes: int, num_blocks: int, num_partitions: int = 1,
    interpret: bool = False, codec: str = "f32",
):
    """Dense per-slice scores over the OCTET stream.

    Returns (P, num_blocks, max_rows, 128) f32 where max_rows = 8 * max
    octets-per-block: block b rows [o*8, (o+1)*8) hold octet
    (b - blk_start)*opb + o's member tiles (wide octets land at the last
    block of their span, rows [0, 8))."""
    S = cfg.chunk_sublanes
    max_rows = max(pb.octets_per_block for pb in plan) * S
    P = num_partitions
    part = P > 1
    kernel = functools.partial(
        _fused_scores_kernel_octet, cfg=cfg, plan=plan,
        block_sublanes=block_sublanes, codec=codec,
        mask_lanes=interpret, part=part,
    )
    grid = (P, num_blocks) if part else (num_blocks,)
    if part:
        in_specs = [
            pl.BlockSpec((table.shape[0], LANES), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES),
                         lambda p, i, nb=num_blocks: (p * nb + i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, 1, max_rows, LANES),
                                 lambda p, i: (p, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        in_specs = [
            pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec((1, max_rows, LANES), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct(
            ((P, num_blocks, max_rows, LANES) if part
             else (num_blocks, max_rows, LANES)), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, LANES), jnp.float32)],
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")) if part
            else None),
        interpret=interpret,
    )(table, words)
    return out if part else out[None]


def _bucket_scores_kernel(tab_ref, words_ref, out_ref, *,
                          cfg: TopKSpMVConfig, width: int,
                          slices_per_block: int,
                          codec: str = "f32", mask_lanes: bool = True):
    """Plain SpMV over a bucket: per-slice dense scores, no Top-K.

    Parity with the reference's SpMV-only baselines (the GPU hosts that
    compute the full result vector, host_spmv_csr_gpu.cu) and the building
    block for users who want raw scores."""
    S = cfg.chunk_sublanes
    shape = (S, LANES)
    bcs = [jnp.broadcast_to(tab_ref[c:c + 1, :], shape)
           for c in range(tab_ref.shape[0])]
    prod = _codec_prod(codec)

    def do_slice(j):
        n_acc = 2 if width // S >= 2 else 1
        accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                for _ in range(n_acc)]
        for u in range(width // S):
            w = words_ref[pl.ds(j * width + u * S, S), :]
            accs[u % n_acc] = (
                accs[u % n_acc] + prod(bcs, w, S, mask_lanes)
            )
        acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
        out_ref[j, :] = _to_f32(jnp.sum(acc, axis=0))

    if slices_per_block * max(width // S, 1) <= 64:
        for j in range(slices_per_block):
            do_slice(j)
    else:
        jax.lax.fori_loop(
            0, slices_per_block, lambda j, c: (do_slice(j), c)[1], 0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "slices_per_block", "num_blocks",
                     "interpret", "codec"),
)
def spmv_bucket_scores_device(
    words, table, *, cfg: TopKSpMVConfig, width: int, slices_per_block: int,
    num_blocks: int, interpret: bool = False, codec: str = "f32",
):
    """Dense per-slice scores for one bucket: (num_blocks*spb, 128) f32."""
    block_sub = width * slices_per_block
    kernel = functools.partial(
        _bucket_scores_kernel, cfg=cfg, width=width,
        slices_per_block=slices_per_block, codec=codec,
        mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((table.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((slices_per_block, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_blocks * slices_per_block, LANES), jnp.float32),
        interpret=interpret,
    )(table, words)


def _bucket_kernel_batch(nreal_ref, tab_ref, words_ref, topv_ref, topt_ref,
                         tv, tt, *, cfg: TopKSpMVConfig, width: int,
                         slices_per_block: int, slice_base: int,
                         codec: str, num_queries: int,
                         table_rows: int, mask_lanes: bool = True):
    """Multi-query bucket kernel: the matrix block is decoded once per
    sub-chunk and all queries' gathers share it (the SpMM analog of
    multi_spmv_gold, gold_algorithms.hpp:21-35 — here the batch amortizes
    both HBM traffic and the word decode). Queries run in sub-groups of
    cfg.batch_subgroup with an explicitly shared decode (_codec_split)."""
    tie_safe = cfg.tie_safe_topk
    i = pl.program_id(0)
    S = cfg.chunk_sublanes
    K = cfg.lane_k
    Q = num_queries
    TR = table_rows
    QG = cfg.batch_subgroup or Q
    subgroups = [(q0, min(QG, Q - q0)) for q0 in range(0, Q, QG)]

    @pl.when(i == 0)
    def _():
        tv[:] = (jnp.full_like(tv, NEG_INF) if tie_safe
                 else jnp.broadcast_to(_topk_init(K), tv.shape))
        tt[:] = jnp.zeros_like(tt)

    shape = (S, LANES)
    bcs_q = [
        [jnp.broadcast_to(tab_ref[q * TR + c:q * TR + c + 1, :], shape)
         for c in range(TR)]
        for q in range(Q)
    ]
    shared_fn, apply_fn = _codec_split(codec)

    def do_slice(j):
        t = slice_base + i * slices_per_block + j
        for q0, ng in subgroups:
            accs = [jnp.zeros((S, LANES), _acc_dtype(codec))
                    for _ in range(ng)]
            for u in range(width // S):
                w = words_ref[pl.ds(j * width + u * S, S), :]
                sh = shared_fn(w, mask_lanes)
                for dq in range(ng):
                    accs[dq] = accs[dq] + apply_fn(bcs_q[q0 + dq], sh)
            for dq in range(ng):
                q = q0 + dq
                score = _to_f32(jnp.sum(accs[dq], axis=0, keepdims=True))
                score = jnp.where(t < slice_base + nreal_ref[0, 0],
                                  score, NEG_INF)
                # per-query Top-K buffers live at tv[q], tt[q]
                cur = tv[q]
                cur_min = jnp.min(cur, axis=0, keepdims=True)
                if tie_safe:
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (K, LANES), 0)
                    slot = jnp.min(jnp.where(cur == cur_min, iota, K),
                                   axis=0, keepdims=True)
                    replace = (iota == slot) & (score >= cur_min)
                else:
                    replace = (cur == cur_min) & (score >= cur_min)
                tv[q] = jnp.where(replace, score, cur)
                tt[q] = jnp.where(replace, t, tt[q])

    # Cap compile size: unroll small blocks, loop big ones (see
    # _bucket_kernel).
    if slices_per_block * max(width // S, 1) * Q <= 128:
        for j in range(slices_per_block):
            do_slice(j)
    else:
        def body(j, _):
            do_slice(j)
            return 0

        jax.lax.fori_loop(0, slices_per_block, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        topv_ref[:] = tv[:]
        topt_ref[:] = tt[:]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "slices_per_block", "slice_base",
                     "num_blocks", "interpret", "codec"),
)
def topk_spmv_bucket_batch_device(
    words, tables, num_real, *, cfg: TopKSpMVConfig, width: int,
    slices_per_block: int, slice_base: int, num_blocks: int,
    interpret: bool = False, codec: str = "f32",
):
    """Batched bucket kernel. tables: (Q, table_rows, 128); num_real a
    (1, 1) int32 array; returns (topv, topt) of (Q, lane_k, 128)."""
    Q, TR, _ = tables.shape
    K = cfg.lane_k
    block_sub = width * slices_per_block
    kernel = functools.partial(
        _bucket_kernel_batch, cfg=cfg, width=width,
        slices_per_block=slices_per_block, slice_base=slice_base,
        codec=codec, num_queries=Q, table_rows=TR,
        mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q * TR, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, K, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Q, K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, K, LANES), jnp.float32),
            pltpu.VMEM((Q, K, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(num_real, tables.reshape(Q * TR, LANES), words)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_groups", "width", "slices_per_block",
                     "slice_base", "num_blocks", "interpret", "codec"),
)
def topk_spmv_bucket_device(
    words, table, num_real, *, cfg: TopKSpMVConfig, num_groups: int,
    width: int, slices_per_block: int, slice_base: int, num_blocks: int,
    interpret: bool = False, codec: str = "f32",
):
    """Run the uniform-W bucket kernel; returns (topv, topt) of (K, 128).

    num_real is a (1, 1) int32 array (dynamic: sharded engines reuse one
    compiled kernel across devices whose shards differ in slice count).
    """
    K = cfg.lane_k
    block_sub = width * slices_per_block
    kernel = functools.partial(
        _bucket_kernel, cfg=cfg, num_groups=num_groups, width=width,
        slices_per_block=slices_per_block, slice_base=slice_base,
        codec=codec, mask_lanes=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (table.shape[0], LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, LANES), jnp.float32),
            jax.ShapeDtypeStruct((K, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, LANES), jnp.float32),
            pltpu.VMEM((K, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(num_real, table, words)


@functools.partial(jax.jit, static_argnames=("k",))
def finalize_topk(topv, topt, row_ids, k: int):
    """Host-free global Top-K merge.

    Replaces the reference's host-side read_result (offset + hash-dedupe +
    sort, host_spmv_bscsr.cpp:399-448): candidates are already unique
    (one per (slice, lane)), so the merge is a single jax.lax.top_k over
    all per-lane candidates, with padding lanes masked out.
    """
    L = row_ids.shape[1]
    flat_v = topv.reshape(-1)
    # Block-padding candidates may carry slice indices past the end; clamp
    # into the sentinel (-1) row so they mask out.
    flat_t = jnp.clip(topt.reshape(-1), 0, row_ids.shape[0] - 1)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, topv.shape, len(topv.shape) - 1
    ).reshape(-1)
    rows = row_ids.reshape(-1)[flat_t * L + lane]
    valid = (rows >= 0) & (flat_v > TOPK_FLOOR)
    masked = jnp.where(valid, flat_v, NEG_INF)
    # The candidate pool holds lane_k * 128 * partitions entries; a larger
    # k cannot be served (raise lane_k / partitions to widen the pool).
    vals, pos = jax.lax.top_k(masked, min(k, masked.shape[0]))
    return rows[pos], vals
