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
                         fused_block_sublanes=64, query_codec=codec)
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
    cfg = TopKSpMVConfig(k=30, max_cols=256, block_sublanes=64,
                         fused_block_sublanes=64)
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
    cfg = TopKSpMVConfig(k=25, max_cols=256, block_sublanes=64,
                         fused_block_sublanes=64)
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
                         fused_block_sublanes=64,
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


def test_sharded_megacore_partitions_match_exact():
    """Megacore composed with sharding (VERDICT r3 #2): every device
    sweeps config.num_partitions partition streams on the parallel grid
    axis (the CU hierarchy, types.hpp:36-38) under shard_map."""
    mesh = make_mesh(jax.devices()[:8])
    coo = create_sparse_matrix(4100, 256, 10, "gamma", seed=80)
    cfg = TopKSpMVConfig(k=40, max_cols=256, num_partitions=2,
                         fused_block_sublanes=64)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    q = create_sample_vector(256, seed=81)
    ki, kv = map(np.asarray, eng.query(q))
    gi, gv = topk_exact(coo, q, 40)
    assert _precision(gi, ki) == 1.0
    np.testing.assert_allclose(np.sort(kv), np.sort(gv), atol=2e-3)


def test_sharded_megacore_batch_and_single_device_agree():
    from spmv_topk_tpu.api import TopKSpMV

    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(2600, 256, 9, "uniform", seed=82)
    cfg = TopKSpMVConfig(k=25, max_cols=256, num_partitions=2,
                         fused_block_sublanes=64)
    sharded = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    single = TopKSpMV(coo, TopKSpMVConfig(k=25, max_cols=256,
                                          fused_block_sublanes=64))
    qs = np.stack([create_sample_vector(256, seed=83 + i) for i in range(5)])
    bi, bv = map(np.asarray, sharded.query_batch(qs, group_size=3))
    for i in range(5):
        di, dv = map(np.asarray, single.query(qs[i]))
        assert _precision(di, bi[i]) == 1.0
        np.testing.assert_allclose(np.sort(bv[i]), np.sort(dv), atol=1e-5)


@pytest.mark.parametrize("num_partitions", [1, 2])
def test_sharded_save_load_roundtrip(tmp_path, num_partitions):
    """Per-shard snapshot (VERDICT r3 #3): save writes one file per device
    position + meta; load reconstructs bit-identical serving, including
    the partitioned composition and the rescore CSR via matrix=."""
    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(2300, 256, 11, "gamma", seed=84)
    cfg = TopKSpMVConfig(k=20, max_cols=256, query_codec="h16",
                         width_quantum=2, fused_block_sublanes=64,
                         num_partitions=num_partitions, rescore_pool=80)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    q = create_sample_vector(256, seed=85)
    i1, v1 = map(np.asarray, eng.query(q))

    path = str(tmp_path / "sharded_eng")
    eng.save(path)
    import os

    files = sorted(os.listdir(tmp_path))
    assert f"sharded_eng.meta.npz" in files
    assert sum(f.startswith("sharded_eng.shard") for f in files) == 4

    # full production load: matrix= restores exact rescoring
    eng2 = ShardedBucketedTopKSpMV.load(path, mesh=mesh, matrix=coo)
    i2, v2 = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)

    # degraded load (no matrix): un-rescored but serving
    with pytest.warns(UserWarning, match="rescore_pool"):
        eng3 = ShardedBucketedTopKSpMV.load(path, mesh=mesh)
    i3, _ = map(np.asarray, eng3.query(q))
    gi, _ = topk_exact(coo, q, 20)
    assert _precision(gi, i3) >= 0.8  # raw h16 ranking, no rescore


def test_sharded_skeleton_exchange_single_process():
    """exchange_skeleton=True runs the multi-host skeleton/scale/size
    exchange code path on one process (used by dryrun_multichip)."""
    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(2000, 256, 10, "gamma", seed=86)
    cfg = TopKSpMVConfig(k=30, max_cols=256, query_codec="h16",
                         width_quantum=2, fused_block_sublanes=64,
                         rescore_pool=120)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh,
                                  exchange_skeleton=True)
    q = create_sample_vector(256, seed=87)
    ki, _ = map(np.asarray, eng.query(q))
    gi, _ = topk_exact(coo, q, 30)
    assert _precision(gi, ki) >= 0.97
