"""Fused whole-matrix kernel and sign-layout codec tests (interpret mode).

The fused kernel (ops/kernel.py::_fused_kernel) processes every bucket in
one pallas_call with per-bucket static branches; these tests cover the
branch select, the wide-slice (width > block) carry stitching, and the
i8s/i4s codec word layouts against the exact gold
(the reference's differential-oracle protocol, host_spmv_bscsr.cpp:638-663).
"""

import numpy as np
import pytest

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import (
    CooMatrix, create_sparse_matrix, create_sample_vector)
from spmv_topk_tpu.formats.sell_buckets import pack_sell_buckets, fuse_buckets
from spmv_topk_tpu.ops.gold import topk_exact
from spmv_topk_tpu.ops.quantized_query import (
    pack_query_i8s, dequantize_query_i8s,
    pack_query_i4s, dequantize_query_i4s,
    encode_words_sign_layout,
)


def _precision(a, b):
    a = np.asarray(a).tolist()
    b = np.asarray(b).tolist()
    return len(set(a) & set(b)) / len(a)


def test_fuse_plan_covers_all_slices():
    coo = create_sparse_matrix(4000, 512, 16, "gamma", seed=60)
    m = pack_sell_buckets(coo, TopKSpMVConfig(max_cols=512,
                                              block_sublanes=128))
    f = fuse_buckets(m, block_sublanes=128)
    assert f.num_blocks == sum(p.num_blocks for p in f.plan)
    assert f.words.shape[0] == f.num_blocks * f.block_sublanes
    assert int(f.nreal.sum()) == m.num_slices
    # plan block ranges are contiguous and disjoint
    blk = 0
    for p in f.plan:
        assert p.blk_start == blk
        blk += p.num_blocks
    # every real nnz word survives the re-layout
    nz_src = sum(int(np.count_nonzero(b.words)) for b in m.buckets)
    assert int(np.count_nonzero(f.words)) == nz_src


@pytest.mark.parametrize("codec", ["f32", "i8s", "i4s", "int8x4"])
def test_fused_engine_vs_exact(codec):
    coo = create_sparse_matrix(3000, 1024, 14, "gamma", seed=61)
    cfg = TopKSpMVConfig(k=40, max_cols=1024, query_codec=codec,
                         block_sublanes=128, fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(1024, seed=62)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 40)
    floor = 0.9 if codec == "i4s" else 0.97
    assert _precision(gi, ki) >= floor
    tol = 6e-3 if codec == "i4s" else 1e-3
    assert np.abs(np.sort(kv) - np.sort(gv)).max() < tol


def test_fused_wide_slices_span_blocks():
    """Rows denser than a whole block exercise the carry stitching."""
    rng = np.random.default_rng(63)
    rows_l, cols_l, vals_l = [], [], []
    N, C = 1500, 512
    for r in range(N):
        d = 300 if r % 400 == 0 else int(rng.integers(1, 10))
        cs = rng.choice(C, size=d, replace=False)
        v = rng.random(d).astype(np.float32)
        v /= np.linalg.norm(v)
        rows_l += [r] * d
        cols_l += cs.tolist()
        vals_l += v.tolist()
    coo = CooMatrix(np.array(rows_l, np.int32), np.array(cols_l, np.int32),
                    np.array(vals_l, np.float32), N, C).sort_row_major()
    cfg = TopKSpMVConfig(k=30, max_cols=512, block_sublanes=64,
                         fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    assert any(p.blocks_per_slice > 1 for p in eng.fused.plan), \
        "test should contain a wide bucket"
    q = create_sample_vector(C, seed=64)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 30)
    assert _precision(gi, ki) >= 0.95
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=1e-3)


def test_query_i8s_roundtrip():
    rng = np.random.default_rng(65)
    q = rng.standard_normal(1024).astype(np.float32)
    tab, scale = pack_query_i8s(q)
    assert tab.shape == (2, 128)
    back = dequantize_query_i8s(tab, scale, 1024)
    assert np.abs(back - q).max() <= scale / 2 + 1e-7


def test_query_i4s_roundtrip():
    rng = np.random.default_rng(66)
    q = rng.standard_normal(1024).astype(np.float32)
    tab, scale = pack_query_i4s(q)
    assert tab.shape == (1, 128)
    back = dequantize_query_i4s(tab, scale, 1024)
    assert np.abs(back - q).max() <= scale / 2 + 1e-7


def test_sign_layout_word_encode():
    """encode_words_sign_layout: value bits kept, lane/shift/pass correct."""
    cols = np.array([0, 127, 128, 511, 512, 1023], np.uint32)
    vals = np.arange(1, 7, dtype=np.uint32)  # fake bf16 bit patterns
    words = ((cols << 16) | vals).view(np.int32)
    out = encode_words_sign_layout(words, "i8s").view(np.uint32)
    assert np.all((out & 0xFFFF) == vals)
    assert np.all(((out >> 16) & 0x7F) == (cols & 127))
    a = (out >> 24) & 31
    assert np.all(a == 24 - 8 * ((cols >> 7) & 3))
    assert np.all((out >> 31) == (cols >> 9))


def test_i8s_rejects_wide_matrices():
    with pytest.raises(ValueError):
        TopKSpMVConfig(max_cols=2048, query_codec="i8s")


@pytest.mark.parametrize("codec", ["f32", "i8s"])
def test_width_quantum4_pair_fold(codec):
    """W % 8 == 4 buckets: adjacent slices share a boundary chunk that the
    kernel splits with static sublane halves; odd slices-per-block leave a
    trailing unpaired slice read against block-tail zeros."""
    coo = create_sparse_matrix(6000, 512, 19, "uniform", seed=83)
    cfg = TopKSpMVConfig(k=50, max_cols=512, query_codec=codec,
                         width_quantum=4, block_sublanes=64,
                         fused_block_sublanes=80)
    eng = TopKSpMV(coo, cfg)
    assert any(p.width % 8 == 4 for p in eng.fused.plan), \
        "config should produce a quantum-4 bucket"
    assert any(p.slices_per_block % 2 == 1 for p in eng.fused.plan), \
        "config should exercise the trailing unpaired slice"
    q = create_sample_vector(512, seed=84)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 50)
    assert _precision(gi, ki) >= 0.96
    tol = 1e-3 if codec != "f32" else 3e-4
    assert np.abs(np.sort(kv) - np.sort(gv)).max() < tol


@pytest.mark.parametrize("codec", ["f32", "h16"])
def test_width_quantum2_quad_fold(codec):
    """W % 4 == 2 buckets: a period of four consecutive slices spans whole
    chunks; the kernel decodes boundary chunks once and splits them with
    static sublane slices. Tail slices of a short block are folded
    individually."""
    coo = create_sparse_matrix(6000, 512, 17, "uniform", seed=93)
    cfg = TopKSpMVConfig(k=50, max_cols=512, query_codec=codec,
                         width_quantum=2, block_sublanes=64,
                         fused_block_sublanes=80,
                         rescore_pool=200 if codec == "h16" else 0)
    eng = TopKSpMV(coo, cfg)
    assert any(p.width % 4 == 2 for p in eng.fused.plan), \
        "config should produce a quantum-2 bucket"
    assert any(p.slices_per_block % 4 != 0 for p in eng.fused.plan), \
        "config should exercise tail slices"
    q = create_sample_vector(512, seed=94)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 50)
    assert _precision(gi, ki) >= 0.96
    tol = 1e-3 if codec != "f32" else 3e-4
    assert np.abs(np.sort(kv) - np.sort(gv)).max() < tol


def test_width_quantum2_narrow_widths():
    """Widths below one chunk (W in {2, 4, 6}): several slices live inside
    a single 8-sublane chunk; every slice is a static sub-chunk segment."""
    coo = create_sparse_matrix(6000, 256, 3, "uniform", seed=95)
    cfg = TopKSpMVConfig(k=30, max_cols=256, width_quantum=2,
                         block_sublanes=128, fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    assert any(p.width < 8 for p in eng.fused.plan)
    q = create_sample_vector(256, seed=96)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 30)
    assert _precision(gi, ki) >= 0.96
    # bf16-stored values: deg-3 rows leave little cancellation headroom
    assert np.abs(np.sort(kv) - np.sort(gv)).max() < 1e-3


def test_width_quantum2_batch_matches_single():
    """The multi-query kernel's quad-fold path agrees with per-query."""
    coo = create_sparse_matrix(2000, 512, 13, "gamma", seed=97)
    cfg = TopKSpMVConfig(k=25, max_cols=512, width_quantum=2,
                         block_sublanes=64, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    qs = np.stack([create_sample_vector(512, seed=98 + i) for i in range(3)])
    bi, bv = map(np.asarray, eng.query_batch(qs, group_size=3))
    for n, q in enumerate(qs):
        si, sv = map(np.asarray, eng.query(q))
        np.testing.assert_array_equal(np.sort(bi[n]), np.sort(si))
        np.testing.assert_allclose(np.sort(bv[n]), np.sort(sv), atol=1e-5)


@pytest.mark.parametrize("codec", ["f32", "h16"])
def test_partitioned_batch_matches_single(codec):
    """query_batch on a num_partitions>1 engine (the partitioned
    multi-query kernel, megacore P2 for the batch path) agrees with the
    partitioned single-query path query by query."""
    coo = create_sparse_matrix(2400, 512, 12, "gamma", seed=160)
    cfg = TopKSpMVConfig(k=30, max_cols=512, num_partitions=3,
                         block_sublanes=64, fused_block_sublanes=64,
                         query_codec=codec,
                         rescore_pool=120 if codec == "h16" else None)
    eng = TopKSpMV(coo, cfg)
    qs = np.stack([create_sample_vector(512, seed=161 + i)
                   for i in range(3)])
    bi, bv = map(np.asarray, eng.query_batch(qs))
    for n, q in enumerate(qs):
        si, sv = map(np.asarray, eng.query(q))
        np.testing.assert_array_equal(np.sort(bi[n]), np.sort(si))
        np.testing.assert_allclose(np.sort(bv[n]), np.sort(sv), atol=1e-5)
    gi, _ = topk_exact(coo, qs[0], 30)
    assert _precision(gi, bi[0]) >= (1.0 if codec == "h16" else 0.96)


def test_partitioned_batch_wide_slices():
    """Partitioned batch kernel with wide buckets: the per-query carry
    must not leak across partitions (each partition's block run ends on a
    slice boundary by construction)."""
    rng = np.random.default_rng(163)
    from spmv_topk_tpu.formats.coo import CooMatrix
    rows, cols, vals = [], [], []
    for r in range(384):
        d = 600 if r < 128 else 8
        c = np.sort(rng.choice(1024, size=d, replace=False))
        rows.append(np.full(d, r)); cols.append(c)
        vals.append(rng.random(d, dtype=np.float32))
    coo = CooMatrix(np.concatenate(rows), np.concatenate(cols),
                    np.concatenate(vals), 384, 1024)
    cfg = TopKSpMVConfig(k=20, max_cols=1024, num_partitions=2,
                         block_sublanes=64, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    qs = np.stack([create_sample_vector(1024, seed=164 + i)
                   for i in range(2)])
    bi, bv = map(np.asarray, eng.query_batch(qs))
    for n, q in enumerate(qs):
        gi, gv = topk_exact(coo, q, 20)
        assert _precision(gi, bi[n]) >= 0.95
        assert np.abs(np.sort(bv[n]) - np.sort(gv)).max() < 2e-3


def test_batch_subgroup_matches_all_live():
    """batch_subgroup > 0 (sub-grouped accumulators, non-dividing size)
    returns exactly the all-live (default 0) results."""
    coo = create_sparse_matrix(2000, 512, 13, "gamma", seed=97)
    base = dict(k=25, max_cols=512, width_quantum=2,
                block_sublanes=64, fused_block_sublanes=64)
    eng0 = TopKSpMV(coo, TopKSpMVConfig(**base))
    eng3 = TopKSpMV(coo, TopKSpMVConfig(batch_subgroup=3, **base))
    qs = np.stack([create_sample_vector(512, seed=70 + i) for i in range(5)])
    bi0, bv0 = map(np.asarray, eng0.query_batch(qs, group_size=5))
    bi3, bv3 = map(np.asarray, eng3.query_batch(qs, group_size=5))
    np.testing.assert_array_equal(bi0, bi3)
    np.testing.assert_allclose(bv0, bv3, atol=1e-6)


@pytest.mark.parametrize("tile", [2, 8])
def test_fold_tile_top2(tile):
    """Tiled Top-K fold: one top-2 fold per `tile` slices. Sigma-sort
    clusters high-score rows into adjacent slices (degree-score
    correlation), so the flush keeps the TWO best scores per (lane, tile)
    — top-1 measured 0.88 precision@50 on exactly this workload."""
    coo = create_sparse_matrix(8000, 512, 17, "gamma", seed=11)
    cfg = TopKSpMVConfig(k=50, max_cols=512, width_quantum=2,
                         fold_tile=tile, block_sublanes=64,
                         fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    for seed in (12, 13):
        q = create_sample_vector(512, seed=seed)
        ki, kv = map(np.asarray, eng.query(q))
        gi, gv = topk_exact(coo, q, 50)
        assert _precision(gi, ki) >= 0.98
        assert np.abs(np.sort(kv) - np.sort(gv)).max() < 1e-3


def test_fold_tile_h16_rescore():
    """Production bench mode: h16 codec + fold_tile=8 + exact rescore."""
    coo = create_sparse_matrix(5000, 512, 19, "gamma", seed=21)
    cfg = TopKSpMVConfig(k=50, max_cols=512, query_codec="h16",
                         width_quantum=2, fold_tile=8, rescore_pool=200,
                         block_sublanes=64, fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=22)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 50)
    assert _precision(gi, ki) >= 0.96


def test_width_quantum2_reduces_padding():
    # pack-level comparison: quantization waste isolated from block-tail
    # waste (more q2 buckets mean more part-filled trailing blocks, so at
    # tiny test-size blocks the FUSED ratio can go either way; production
    # pairs quantum 2 with 512-sublane blocks where it wins end-to-end).
    # Low-degree corpus: quantum 2 matters most at small slice widths
    # (h16's word-degrees halve again — bench.py's production case).
    coo = create_sparse_matrix(60000, 512, 9, "gamma", seed=85)
    pads = {}
    for quantum in (4, 2):
        cfg = TopKSpMVConfig(max_cols=512, width_quantum=quantum,
                             block_sublanes=128, fused_block_sublanes=128)
        pads[quantum] = pack_sell_buckets(coo, cfg).padding_ratio
    assert pads[2] < pads[4]


def test_width_quantum4_reduces_padding():
    # large-matrix regime: small blocks so width quantization (not block
    # tails) dominates the padding, as on production-size corpora
    coo = create_sparse_matrix(60000, 512, 20, "gamma", seed=85)
    pads = {}
    for quantum in (8, 4):
        cfg = TopKSpMVConfig(max_cols=512, width_quantum=quantum,
                             block_sublanes=128, fused_block_sublanes=128)
        eng = TopKSpMV(coo, cfg)
        pads[quantum] = eng.fused.padding_ratio
    assert pads[4] < pads[8]


def test_save_load_roundtrip(tmp_path):
    """Packed-engine persistence: identical results after load()."""
    coo = create_sparse_matrix(5000, 512, 14, "gamma", seed=90)
    cfg = TopKSpMVConfig(k=40, max_cols=512, query_codec="i8s",
                         width_quantum=4, block_sublanes=128,
                         fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=91)
    i1, v1 = map(np.asarray, eng.query(q))
    p = str(tmp_path / "eng.npz")
    eng.save(p)
    eng2 = TopKSpMV.load(p)
    assert eng2.config == eng.config
    i2, v2 = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(v1, v2)
    # scores() works on loaded engines too (the fused scores path needs
    # only the snapshot's fused stream + row_ids)
    np.testing.assert_allclose(eng2.scores(q), eng.scores(q), atol=1e-6)


def test_tie_safe_topk_on_tied_scores():
    """Pattern-style data (all values equal) produces heavy score ties;
    tie_safe_topk keeps distinct tied rows in the lane buffers where the
    fast fold may collapse them onto one candidate."""
    rng = np.random.default_rng(110)
    n, c, d = 2000, 256, 6
    rows = np.repeat(np.arange(n, dtype=np.int32), d)
    cols = np.concatenate(
        [rng.choice(c, d, replace=False) for _ in range(n)]).astype(np.int32)
    vals = np.ones(n * d, np.float32)           # pattern: every value 1
    coo = CooMatrix(rows, cols, vals, n, c).sort_row_major()
    q = np.ones(c, np.float32)                  # score = d for EVERY row
    cfg = TopKSpMVConfig(k=64, max_cols=256, tie_safe_topk=True,
                         block_sublanes=128, fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    idx, vals_out = map(np.asarray, eng.query(q))
    # all scores tie at d: any 64 distinct rows are correct; the buffers
    # must not collapse (distinct indices, exact value)
    assert len(set(idx.tolist())) == 64
    np.testing.assert_allclose(vals_out, d, atol=1e-5)


def test_fuse_buckets_duplicate_widths_positional():
    """ADVICE r1 (high): with sigma_sort=False quantized widths are
    non-monotone, so several buckets can share a width; fuse_buckets must
    pair plan entries with buckets positionally, not by a width-keyed
    dict (which filled every same-width entry with the LAST bucket)."""
    coo = create_sparse_matrix(3000, 512, 14, "gamma", seed=140)
    cfg = TopKSpMVConfig(k=40, max_cols=512, sigma_sort=False,
                         block_sublanes=128, fused_block_sublanes=128)
    m = pack_sell_buckets(coo, cfg)
    widths = [b.width for b in m.buckets]
    assert len(set(widths)) < len(widths), (
        "fixture must produce duplicate-width buckets")
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=141)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 40)
    assert _precision(gi, ki) >= 0.97
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=2e-3)


def test_fuse_buckets_skeleton_rejects_duplicate_widths():
    coo = create_sparse_matrix(3000, 512, 14, "gamma", seed=142)
    cfg = TopKSpMVConfig(max_cols=512, sigma_sort=False,
                         block_sublanes=128, fused_block_sublanes=128)
    m = pack_sell_buckets(coo, cfg)
    if len({b.width for b in m.buckets}) == len(m.buckets):
        pytest.skip("fixture did not produce duplicate widths")
    skeleton = [(b.width, 1, b.slice_base) for b in m.buckets]
    with pytest.raises(ValueError, match="unique bucket widths"):
        fuse_buckets(m, block_sublanes=128, skeleton=skeleton)


def test_save_load_without_npz_suffix(tmp_path):
    """ADVICE r1 (low): save('eng.bin') then load('eng.bin') must work
    (np.savez silently appended '.npz' to bare-string paths)."""
    coo = create_sparse_matrix(2000, 512, 10, "uniform", seed=143)
    cfg = TopKSpMVConfig(k=20, max_cols=512, block_sublanes=128,
                         fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    p = str(tmp_path / "eng.bin")
    eng.save(p)
    eng2 = TopKSpMV.load(p)
    q = create_sample_vector(512, seed=144)
    i1, _ = map(np.asarray, eng.query(q))
    i2, _ = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)


def test_tie_safe_default_resolution():
    """ADVICE r1 (medium): h16 without a rescore pool yields small-integer
    scores where exact min-ties are common -> tie_safe defaults on; every
    other combination keeps the fast fold."""
    from spmv_topk_tpu.config import TopKSpMVConfig as C
    assert C(query_codec="h16").tie_safe_topk is True
    assert C(query_codec="h16", rescore_pool=400).tie_safe_topk is False
    assert C().tie_safe_topk is False
    assert C(tie_safe_topk=True).tie_safe_topk is True


@pytest.mark.parametrize("codec", ["f32", "h16"])
def test_partitioned_engine_vs_exact(codec):
    """num_partitions>1: P row partitions on a parallel grid axis share
    one plan skeleton (VERDICT r1 weak #5 / P2, types.hpp:36-38)."""
    coo = create_sparse_matrix(2000, 512, 12, "gamma", seed=150)
    q = create_sample_vector(512, seed=151)
    gi, gv = topk_exact(coo, q, 50)
    cfg = TopKSpMVConfig(k=50, max_cols=512, num_partitions=4,
                         block_sublanes=64, fused_block_sublanes=64,
                         query_codec=codec,
                         rescore_pool=200 if codec == "h16" else None)
    eng = TopKSpMV(coo, cfg)
    idx, vals = map(np.asarray, eng.query(q))
    if codec == "h16":  # rescore pool: exact re-ranking
        assert _precision(gi, idx) == 1.0
        np.testing.assert_allclose(np.sort(vals), np.sort(gv), atol=1e-5)
    else:  # bf16 matrix values: same regime as test_fused_engine_vs_exact
        assert _precision(gi, idx) >= 0.97
        assert np.abs(np.sort(vals) - np.sort(gv)).max() < 1e-3


def test_partitioned_matches_unpartitioned():
    """P=3 and P=1 engines return identical top-k on the same matrix."""
    coo = create_sparse_matrix(1500, 256, 10, "uniform", seed=152)
    q = create_sample_vector(256, seed=153)
    cfg1 = TopKSpMVConfig(k=30, max_cols=256, num_partitions=1,
                          block_sublanes=64, fused_block_sublanes=64)
    cfg3 = TopKSpMVConfig(k=30, max_cols=256, num_partitions=3,
                          block_sublanes=64, fused_block_sublanes=64)
    i1, v1 = map(np.asarray, TopKSpMV(coo, cfg1).query(q))
    i3, v3 = map(np.asarray, TopKSpMV(coo, cfg3).query(q))
    np.testing.assert_array_equal(np.sort(i1), np.sort(i3))
    np.testing.assert_allclose(np.sort(v1), np.sort(v3), atol=1e-6)


def test_partitioned_wide_slices():
    """Partitioned kernel with wide buckets (width > block: the carry
    path) — per-partition carries must not leak across partitions."""
    rng = np.random.default_rng(154)
    # 256 heavy rows (deg ~600 > 64*8 nnz/block) + light tail
    from spmv_topk_tpu.formats.coo import CooMatrix
    rows, cols, vals = [], [], []
    for r in range(512):
        d = 600 if r < 256 else 8
        c = np.sort(rng.choice(1024, size=d, replace=False))
        rows.append(np.full(d, r, np.int32))
        cols.append(c.astype(np.int32))
        vals.append(rng.random(d, dtype=np.float32))
    coo = CooMatrix(np.concatenate(rows), np.concatenate(cols),
                    np.concatenate(vals), 512, 1024)
    q = create_sample_vector(1024, seed=155)
    gi, gv = topk_exact(coo, q, 20)
    cfg = TopKSpMVConfig(k=20, max_cols=1024, num_partitions=2,
                         block_sublanes=64, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    assert any(p.blocks_per_slice > 1 for p in eng.fused.plan), \
        "test should contain a wide bucket"
    idx, vals_ = map(np.asarray, eng.query(q))
    # heavy rows score ~8.5 where bf16 value rounding (~3e-3 abs) reorders
    # near-ties vs the exact gold: check recall, not exact gold values
    assert _precision(gi, idx) >= 0.9
    # strongest check: value-identical to the unpartitioned engine (same
    # quantization), so per-partition carries cannot have leaked
    cfg1 = TopKSpMVConfig(k=20, max_cols=1024, num_partitions=1,
                          block_sublanes=64, fused_block_sublanes=64)
    i1, v1 = map(np.asarray, TopKSpMV(coo, cfg1).query(q))
    np.testing.assert_allclose(np.sort(v1), np.sort(vals_), atol=1e-6)


def test_save_load_partitioned_engine(tmp_path):
    """Partitioned (megacore) engines persist too (VERDICT r3 #3): the
    snapshot keeps the partition-major stream + part geometry; query,
    query_batch and scores() all work after load()."""
    coo = create_sparse_matrix(1500, 256, 10, "gamma", seed=96)
    cfg = TopKSpMVConfig(k=25, max_cols=256, num_partitions=2,
                         width_quantum=2, block_sublanes=64,
                         fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=97)
    i1, v1 = map(np.asarray, eng.query(q))
    s1 = eng.scores(q)
    p = str(tmp_path / "part_eng.npz")
    eng.save(p)
    eng2 = TopKSpMV.load(p)
    assert eng2.config == eng.config
    assert eng2.fused.num_partitions == 2
    i2, v2 = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(eng2.scores(q), s1, atol=1e-6)
    qs = np.stack([create_sample_vector(256, seed=98 + i) for i in range(3)])
    b1 = np.asarray(eng.query_batch(qs, group_size=3)[0])
    b2 = np.asarray(eng2.query_batch(qs, group_size=3)[0])
    np.testing.assert_array_equal(b1, b2)


@pytest.mark.parametrize("codec,fold_tile", [("f32", 1), ("h16", 8)])
def test_width_quantum1_odd_widths(codec, fold_tile):
    """Quantum-1 ladder: ODD widths fold with Ps=8-slice periods (every
    boundary chunk split by static sublane slices); fold_tile=8 exercises
    all 8 sub-tile buffers of the strided tile fold."""
    coo = create_sparse_matrix(6000, 512, 21, "uniform", seed=101)
    cfg = TopKSpMVConfig(k=50, max_cols=512, query_codec=codec,
                         width_quantum=1, block_sublanes=64,
                         fused_block_sublanes=80, fold_tile=fold_tile,
                         rescore_pool=200 if codec == "h16" else 0)
    eng = TopKSpMV(coo, cfg)
    assert any(p.width % 2 == 1 for p in eng.fused.plan), \
        "config should produce odd-width buckets"
    q = create_sample_vector(512, seed=102)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 50)
    assert _precision(gi, ki) >= 0.96
    tol = 1e-3 if codec != "f32" else 3e-4
    assert np.abs(np.sort(kv) - np.sort(gv)).max() < tol


def test_width_quantum1_padding_below_quantum2():
    """Quantum-1 removes width-quantization waste. Compare the sum of
    quantized slice widths (at this test's corpus size the fused stream's
    per-bucket LAST-block padding would dominate padding_ratio; at the
    10M-row bench scale that term is negligible — see the measured
    breakdown in ROOFLINE.md)."""
    coo = create_sparse_matrix(30000, 512, 20, "gamma", seed=103)
    width_sums = {}
    for quantum in (2, 1):
        cfg = TopKSpMVConfig(max_cols=512, query_codec="h16",
                             width_quantum=quantum, rescore_pool=100,
                             fused_block_sublanes=1024)
        eng = TopKSpMV(coo, cfg)
        width_sums[quantum] = sum(b.width * b.num_slices
                                  for b in eng.sell.buckets)
    assert width_sums[1] < width_sums[2]
