"""Bucketed sharded engine on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_sample_vector
from spmv_topk_tpu.ops.gold import topk_exact
from spmv_topk_tpu.parallel import make_mesh
from spmv_topk_tpu.parallel.sharded_buckets import ShardedBucketedTopKSpMV


def _precision(a, b):
    a = np.asarray(a).tolist(); b = np.asarray(b).tolist()
    return len(set(a) & set(b)) / len(a)


@pytest.mark.parametrize("ndev", [2, 8])
@pytest.mark.parametrize("codec", ["f32", "int8x4"])
def test_sharded_bucketed_matches_exact(ndev, codec):
    mesh = make_mesh(jax.devices()[:ndev])
    coo = create_sparse_matrix(2200, 256, 12, "gamma", seed=70)
    cfg = TopKSpMVConfig(k=50, max_cols=256, block_sublanes=64,
                         query_codec=codec)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    q = create_sample_vector(256, seed=71)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 50)
    want = 1.0 if codec == "f32" else 0.9
    assert _precision(gi, ki) >= min(want, 0.98)
    if codec == "f32":
        np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=2e-3)


def test_sharded_bucketed_equals_single_device():
    from spmv_topk_tpu.api import TopKSpMV
    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(2000, 256, 10, "uniform", seed=72)
    cfg = TopKSpMVConfig(k=30, max_cols=256, block_sublanes=64)
    sharded = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    single = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=73)
    si, sv = map(np.asarray, sharded.query(q))
    di, dv = map(np.asarray, single.query(q))
    assert _precision(di, si) == 1.0
    np.testing.assert_allclose(np.sort(sv), np.sort(dv), atol=1e-6)


def test_sharded_bucketed_query_batch():
    from spmv_topk_tpu.formats import create_query_batch

    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(3000, 256, 10, "gamma", seed=74)
    cfg = TopKSpMVConfig(k=25, max_cols=256, block_sublanes=64)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    Q = create_query_batch(5, 256, seed=75)
    bi, bv = map(np.asarray, eng.query_batch(Q, group_size=4))
    assert bi.shape == (5, 25)
    for qi in (0, 1, 4):
        gi, gv = topk_exact(coo, Q[qi], 25)
        assert _precision(gi, bi[qi]) >= 0.96
        np.testing.assert_allclose(np.sort(bv[qi]), np.sort(gv), atol=2e-3)


def test_sharded_rescore_i4s():
    """Quantized sweep + widened merge + host exact rescore on the mesh."""
    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(2600, 512, 12, "gamma", seed=77)
    cfg = TopKSpMVConfig(k=40, max_cols=512, block_sublanes=64,
                         query_codec="i4s", rescore_pool=160)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    q = create_sample_vector(512, seed=78)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 40)
    assert _precision(gi, ki) >= 0.97
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), rtol=1e-5)
    Q = np.stack([create_sample_vector(512, seed=79 + i) for i in range(3)])
    bi, bv = map(np.asarray, eng.query_batch(Q, group_size=2))
    assert bi.shape == (3, 40)
    for qi in range(3):
        g2, _ = topk_exact(coo, Q[qi], 40)
        assert _precision(g2, bi[qi]) >= 0.97
