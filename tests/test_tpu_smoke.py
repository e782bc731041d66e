"""On-TPU smoke suite (`-m tpu`): hardware-only kernel behaviors.

The CPU suite runs every Pallas kernel in interpret mode, which cannot
exercise Mosaic lowering or the hardware lane-gather semantics
(mask_lanes=False relies on the TPU dynamic_gather wrapping indices mod
128 — interpret mode NaN-fills out-of-bounds, kernel.py:50-69). These
tests run the real compiled kernels on one chip with tiny matrices so a
Mosaic regression is caught by `pytest -m tpu` before a bench run is.

Run:  SPMV_TPU_TESTS=1 python -m pytest tests -m tpu -q
(~2-4 min: each distinct kernel shape costs one remote compile.)

The differential protocol matches the reference hosts: exact gold top-k
on the same matrix+query, index-set precision + value tolerance
(host_spmv_bscsr.cpp:638-663).
"""

import numpy as np
import pytest

import jax

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_sample_vector
from spmv_topk_tpu.ops.gold import topk_exact

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def chip():
    assert jax.default_backend() in ("tpu",), (
        f"TPU smoke suite needs the real chip (backend="
        f"{jax.default_backend()}); run without JAX_PLATFORMS=cpu")
    return jax.devices()[0]


def _precision(a, b):
    return len(set(np.asarray(a).tolist())
               & set(np.asarray(b).tolist())) / len(a)


@pytest.fixture(scope="module")
def small():
    coo = create_sparse_matrix(20_000, 1024, 20, "gamma", seed=70)
    q = create_sample_vector(1024, seed=71)
    gi, gv = topk_exact(coo, q, 100)
    return coo, q, gi, gv


def test_fused_bf16_vs_gold(chip, small):
    """Production fused kernel, hardware lane wrap (mask_lanes=False)."""
    coo, q, gi, gv = small
    eng = TopKSpMV(coo, TopKSpMVConfig(k=100))
    ki, kv = map(np.asarray, eng.query(q))
    assert _precision(gi, ki) >= 0.97
    assert np.abs(np.sort(kv) - np.sort(gv)).max() < 1e-3


def test_fused_h16_rescore_exact(chip, small):
    """h16 codec (2 nnz/word, unmasked negative gather indices) + exact
    host rescore: production headline configuration."""
    coo, q, gi, gv = small
    eng = TopKSpMV(coo, TopKSpMVConfig(
        k=100, query_codec="h16", width_quantum=4, rescore_pool=400))
    ki, kv = map(np.asarray, eng.query(q))
    assert _precision(gi, ki) == 1.0
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=1e-5)


def test_fused_octet_headline(chip, small):
    """The bench.py headline engine on hardware: octet transposed stream
    at width_quantum=1, h16 codec, strided fold, exact rescore."""
    coo, q, gi, gv = small
    eng = TopKSpMV(coo, TopKSpMVConfig(
        k=100, query_codec="h16", fused_layout="octet", width_quantum=1,
        fold_tile=8, rescore_pool=400))
    ki, kv = map(np.asarray, eng.query(q))
    assert _precision(gi, ki) == 1.0
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=1e-5)


def test_fused_i4s_codec(chip, small):
    coo, q, gi, _ = small
    eng = TopKSpMV(coo, TopKSpMVConfig(k=100, query_codec="i4s",
                                       rescore_pool=400))
    ki, _ = map(np.asarray, eng.query(q))
    assert _precision(gi, ki) == 1.0


def test_batch_kernel(chip, small):
    """Multi-query fused kernel (group of 8)."""
    coo, q, gi, _ = small
    eng = TopKSpMV(coo, TopKSpMVConfig(k=100))
    qs = np.stack([create_sample_vector(1024, seed=80 + i)
                   for i in range(8)])
    idx, _ = map(np.asarray, eng.query_batch(qs, group_size=8))
    for i in range(8):
        ei, _ = topk_exact(coo, qs[i], 100)
        assert _precision(ei, idx[i]) >= 0.97


def test_partitioned_kernel(chip, small):
    """Parallel-partition grid axis compiles and matches on hardware."""
    coo, q, gi, _ = small
    eng = TopKSpMV(coo, TopKSpMVConfig(k=100, num_partitions=2))
    ki, _ = map(np.asarray, eng.query(q))
    assert _precision(gi, ki) >= 0.97


def test_save_load_roundtrip(chip, small, tmp_path):
    coo, q, _, _ = small
    eng = TopKSpMV(coo, TopKSpMVConfig(k=100))
    p = str(tmp_path / "eng.npz")
    eng.save(p)
    eng2 = TopKSpMV.load(p)
    i1, _ = map(np.asarray, eng.query(q))
    i2, _ = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)


def test_dense_engine(chip, small):
    """Dense MXU engine (bf16 matmul + approx_max_k)."""
    from spmv_topk_tpu.ops.dense import DenseTopKSpMV

    coo, q, gi, _ = small
    deng = DenseTopKSpMV(coo, TopKSpMVConfig(k=100),
                         hbm_budget_bytes=2 << 30)
    idx, _ = map(np.asarray, deng.query_batch(q[None]))
    assert _precision(gi, idx[0]) >= 0.95
