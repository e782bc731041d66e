"""Differential tests of the fused Pallas kernel (interpret mode on CPU).

Follows the reference's testing pattern — randomized queries against exact
golds every iteration (host_spmv_bscsr.cpp:602-663) — as pytest units.
"""

import numpy as np
import pytest

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import CooMatrix, create_sparse_matrix, create_sample_vector
from spmv_topk_tpu.ops.gold import topk_exact
from spmv_topk_tpu.ops.xla_ref import topk_spmv_sell_xla, sell_scores_np, topk_spmv_segment_xla


def _precision(a, b):
    a = np.asarray(a).tolist(); b = np.asarray(b).tolist()
    return len(set(a) & set(b)) / len(a)


@pytest.mark.parametrize("dist", ["uniform", "gamma"])
@pytest.mark.parametrize("partitions", [1, 2])
def test_kernel_vs_exact(dist, partitions):
    coo = create_sparse_matrix(1100, 512, 16, dist, seed=10)
    cfg = TopKSpMVConfig(k=50, lane_k=8, num_partitions=partitions,
                         max_cols=512, block_sublanes=64,
                         fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    # Gold on the bf16-quantized matrix: the kernel computes exactly this,
    # so precision must be 1.0 (no LFR / stitching approximations survive
    # the SELL design); vs the unquantized matrix only rank-boundary
    # flips from bf16 rounding are possible.
    from spmv_topk_tpu.ops.fixedpoint import quantize_bf16
    qcoo = CooMatrix(coo.rows, coo.cols, quantize_bf16(coo.vals),
                     coo.num_rows, coo.num_cols)
    for trial in range(2):
        q = create_sample_vector(512, seed=100 + trial)
        ki, kv = map(np.asarray, eng.query(q))
        gi, gv = topk_exact(qcoo, q, 50)
        assert _precision(gi, ki) == 1.0
        np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=1e-5)
        fi, fv = topk_exact(coo, q, 50)
        assert _precision(fi, ki) >= 0.96


def test_kernel_matches_sell_oracle_bitwise():
    """Against the packet-accurate software model (the analog of
    spmv_coo_gold_top_k_packet, gold_algorithms.hpp:277-362).

    The partitioned (megacore) engine drops the per-bucket layout, so the
    oracle reads an unpartitioned pack of the same matrix — per-row scores
    agree to f32 accumulation-order noise (< the 1e-5 tolerance)."""
    coo = create_sparse_matrix(700, 256, 12, "gamma", seed=11)
    cfg = TopKSpMVConfig(k=30, num_partitions=2, max_cols=256,
                         block_sublanes=32, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    import dataclasses
    oracle_eng = TopKSpMV(coo, dataclasses.replace(cfg, num_partitions=1))
    q = create_sample_vector(256, seed=12)
    ki, kv = map(np.asarray, eng.query(q))
    oi, ov = topk_spmv_sell_xla(oracle_eng.sell, q, 30)
    assert _precision(oi, ki) == 1.0
    np.testing.assert_allclose(kv, ov, atol=1e-5)


def test_kernel_negative_scores_and_empty_rows():
    """Empty rows score 0; negative queries must not be displaced by
    padding lanes (padding is masked with -inf, not 0)."""
    rng = np.random.default_rng(13)
    rows = np.repeat(np.arange(0, 300, 2, dtype=np.int32), 5)  # odd rows empty
    cols = rng.integers(0, 256, len(rows)).astype(np.int32)
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    coo = CooMatrix(rows, cols, vals, 300, 256).sort_row_major()
    q = rng.standard_normal(256).astype(np.float32)
    cfg = TopKSpMVConfig(k=290, num_partitions=1, max_cols=256,
                         block_sublanes=32, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    ki, kv = map(np.asarray, eng.query(q, k=290))
    scores = sell_scores_np(eng.sell, q)
    order = np.argsort(-scores, kind="stable")[:290]
    assert set(ki.tolist()) == set(order.tolist())


def test_kernel_lane_k_approximation_recall():
    """Per-lane K smaller than the number of slices per lane makes results
    approximate, the analog of per-partition K=8 (types.hpp:51) — recall
    should still be high, as modeled by topk_errors.py."""
    coo = create_sparse_matrix(4000, 256, 10, "uniform", seed=14)
    cfg = TopKSpMVConfig(k=100, lane_k=8, num_partitions=1, max_cols=256,
                         block_sublanes=64, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=15)
    ki, _ = map(np.asarray, eng.query(q, k=100))
    gi, _ = topk_exact(coo, q, 100)
    assert _precision(gi, ki) >= 0.97


@pytest.mark.parametrize("partitions", [1, 2])
def test_octet_layout_exact(partitions):
    """The slice-transposed octet stream (fused_layout='octet') with
    fold_tile=1 is exact: every member slice gets its own Top-K fold.
    Covers narrow (bpo=1) and wide (bpo>1) octets via quantum-2 widths
    at 64-sublane blocks."""
    coo = create_sparse_matrix(1100, 512, 16, "gamma", seed=30)
    from spmv_topk_tpu.ops.fixedpoint import quantize_bf16
    qcoo = CooMatrix(coo.rows, coo.cols, quantize_bf16(coo.vals),
                     coo.num_rows, coo.num_cols)
    cfg = TopKSpMVConfig(k=50, lane_k=8, num_partitions=partitions,
                         max_cols=512, block_sublanes=64,
                         fused_block_sublanes=64, width_quantum=2,
                         fused_layout="octet", fold_tile=1)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=31)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(qcoo, q, 50)
    assert _precision(gi, ki) == 1.0
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=1e-5)


def test_octet_layout_production_fold():
    """Octet + h16 + intrinsic top-2-of-8 fold + rescore pool (the
    production recipe) recovers the exact top-k."""
    coo = create_sparse_matrix(4000, 512, 16, "gamma", seed=32)
    cfg = TopKSpMVConfig(k=100, lane_k=8, max_cols=512, block_sublanes=64,
                         fused_block_sublanes=64, width_quantum=2,
                         fused_layout="octet", fold_tile=8,
                         query_codec="h16", rescore_pool=400)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=33)
    ki, _ = map(np.asarray, eng.query(q))
    gi, _ = topk_exact(coo, q, 100)
    assert _precision(gi, ki) >= 0.97


def test_segment_xla_baseline():
    coo = create_sparse_matrix(900, 256, 10, "uniform", seed=16)
    q = create_sample_vector(256, seed=17)
    i, v = topk_spmv_segment_xla(coo.rows, coo.cols, coo.vals, q,
                                 coo.num_rows, 20)
    gi, gv = topk_exact(coo, q, 20)
    assert _precision(gi, np.asarray(i)) == 1.0


def test_query_batch():
    coo = create_sparse_matrix(600, 256, 10, "uniform", seed=18)
    cfg = TopKSpMVConfig(k=10, num_partitions=1, max_cols=256,
                         block_sublanes=32, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    Q = np.stack([create_sample_vector(256, seed=200 + i) for i in range(3)])
    bi, bv = map(np.asarray, eng.query_batch(Q, k=10))
    assert bi.shape == (3, 10)
    for qi in range(3):
        gi, _ = topk_exact(coo, Q[qi], 10)
        assert _precision(gi, bi[qi]) == 1.0
