"""Fused scores path: plain SpMV parity on every bucketed configuration.

Parity target: the reference's SpMV-only hosts that materialize the full
result vector (/root/reference/src/gpu/host_spmv_csr_gpu.cu:171-231),
checked against spmv_gold (:206-213). Unlike the round-3 per-bucket
scores kernel, the fused path must cover the PRODUCTION configuration:
width_quantum=2 + h16 + partitioned engines + load()ed snapshots.
"""

import numpy as np
import pytest

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sample_vector, create_sparse_matrix
from spmv_topk_tpu.formats.coo import CooMatrix
from spmv_topk_tpu.ops.fixedpoint import quantize_bf16
from spmv_topk_tpu.ops.gold import spmv_exact


def _bf16_oracle(coo):
    return CooMatrix(coo.rows, coo.cols, quantize_bf16(coo.vals),
                     coo.num_rows, coo.num_cols)


def _h16_oracle(coo, value_scale):
    v6 = np.clip(np.rint(coo.vals / value_scale), -31, 31) * value_scale
    return CooMatrix(coo.rows, coo.cols, v6.astype(np.float32),
                     coo.num_rows, coo.num_cols)


def test_scores_production_config_quantum2_h16():
    """The shipped TUNING.md config (h16 + quantum-2 + fold_tile + rescore)
    can produce dense scores; exact vs the 6-bit-quantized oracle."""
    coo = create_sparse_matrix(2000, 512, 20, "gamma", seed=70)
    cfg = TopKSpMVConfig(k=50, max_cols=512, query_codec="h16",
                         width_quantum=2, fused_block_sublanes=256,
                         fold_tile=8, rescore_pool=200)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=71)
    s = eng.scores(q)
    # h16 quantizes values to 6 bits AND the query to int4; against the
    # fully-quantized oracle the kernel is EXACT (integer products)
    from spmv_topk_tpu.ops.quantized_query import (dequantize_query_i4s,
                                                   pack_query_table)

    tab, qscale = pack_query_table(q.astype(np.float32), "h16")
    qq = dequantize_query_i4s(tab, qscale, 512)
    ref_q = spmv_exact(_h16_oracle(coo, eng._value_scale), qq)
    np.testing.assert_allclose(s, ref_q, atol=1e-6)
    # and against the unquantized-query oracle the codec error is bounded
    ref = spmv_exact(_h16_oracle(coo, eng._value_scale), q)
    assert np.abs(s - ref).max() < 2e-2
    # ranking sanity: dense scores and spmv_exact agree on the top rows
    assert len(set(np.argsort(-s)[:20]) & set(np.argsort(-ref)[:20])) >= 16


def test_scores_quantum2_f32_exact():
    coo = create_sparse_matrix(1500, 256, 7, "gamma", seed=72)
    cfg = TopKSpMVConfig(max_cols=256, width_quantum=2,
                         fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=73)
    np.testing.assert_allclose(eng.scores(q), spmv_exact(_bf16_oracle(coo), q),
                               atol=1e-5)


def test_scores_partitioned_engine():
    coo = create_sparse_matrix(1800, 256, 10, "uniform", seed=74)
    cfg = TopKSpMVConfig(max_cols=256, num_partitions=3,
                         fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=75)
    np.testing.assert_allclose(eng.scores(q), spmv_exact(_bf16_oracle(coo), q),
                               atol=1e-5)


def test_scores_wide_slices_carry():
    """Hub rows wider than the fused block exercise the cross-block carry
    (blocks_per_slice > 1) in the scores kernel."""
    coo = create_sparse_matrix(700, 1024, 12, "uniform", seed=76)
    hub_rows = np.repeat(np.arange(4, dtype=np.int32), 900)
    rng = np.random.default_rng(77)
    hub_cols = rng.integers(0, 1024, hub_rows.size).astype(np.int32)
    hub_vals = rng.random(hub_rows.size, dtype=np.float32) * 0.05
    coo = CooMatrix(np.concatenate([coo.rows, hub_rows]),
                    np.concatenate([coo.cols, hub_cols]),
                    np.concatenate([coo.vals, hub_vals]),
                    coo.num_rows, coo.num_cols).sort_row_major()
    cfg = TopKSpMVConfig(max_cols=1024, fused_block_sublanes=128)
    eng = TopKSpMV(coo, cfg)
    assert any(pb.blocks_per_slice > 1 for pb in eng.fused.plan)
    q = create_sample_vector(1024, seed=78)
    np.testing.assert_allclose(eng.scores(q), spmv_exact(_bf16_oracle(coo), q),
                               atol=1e-5)


def test_scores_empty_rows_stay_zero():
    """Rows with no nnz must score exactly 0 (SELL keeps them legal)."""
    rows = np.array([1, 1, 5, 5, 5], np.int32)
    cols = np.array([0, 3, 1, 2, 100], np.int32)
    vals = np.ones(5, np.float32)
    coo = CooMatrix(rows, cols, vals, 200, 128)
    eng = TopKSpMV(coo, TopKSpMVConfig(max_cols=128,
                                       fused_block_sublanes=64))
    q = np.ones(128, np.float32)
    s = eng.scores(q)
    assert s[1] == pytest.approx(2.0) and s[5] == pytest.approx(3.0)
    mask = np.ones(200, bool)
    mask[[1, 5]] = False
    assert np.all(s[mask] == 0.0)
