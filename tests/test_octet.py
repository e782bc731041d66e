"""Octet (slice-transposed) layout coverage: batch, partitioned, sharded,
save/load, scores — every live octet path (VERDICT r4 #2).

The octet stream (formats/sell_buckets.fuse_buckets_octet) is the
headline bench layout; these tests lock the batch kernels
(ops/kernel.py::_fused_kernel_batch_octet), the sharded composition, the
snapshot round-trip, and the scores() decode to the same differential
oracle the slice layout has (the reference runs its oracle on the
SHIPPED config, host_spmv_bscsr.cpp:638-663).

Shapes are deliberately tiny: on this box each distinct interpret-mode
program costs ~3-12 s of XLA:CPU compile, so the tests minimize DISTINCT
jit programs (shared geometry, one batch group size) — the kernels'
code-path coverage is identical at 700 rows and at 10M.
"""

import jax
import numpy as np
import pytest

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import (create_sample_vector,
                                   create_sparse_matrix,
                                   create_query_batch)
from spmv_topk_tpu.ops.gold import spmv_exact, topk_exact
from spmv_topk_tpu.parallel import make_mesh
from spmv_topk_tpu.parallel.sharded_buckets import ShardedBucketedTopKSpMV


def _precision(a, b):
    a = np.asarray(a).tolist()
    b = np.asarray(b).tolist()
    return len(set(a) & set(b)) / len(a)


@pytest.mark.parametrize("partitions", [1, 2])
def test_octet_batch_matches_single(partitions):
    """Octet multi-query kernel agrees with per-query octet, incl. the
    partitioned (megacore) batch variant."""
    coo = create_sparse_matrix(900, 256, 9, "gamma", seed=200)
    cfg = TopKSpMVConfig(k=20, max_cols=256, width_quantum=1,
                         num_partitions=partitions,
                         block_sublanes=32, fused_block_sublanes=32,
                         fused_layout="octet", fold_tile=1)
    eng = TopKSpMV(coo, cfg)
    qs = np.stack([create_sample_vector(256, seed=201 + i)
                   for i in range(2)])
    bi, bv = map(np.asarray, eng.query_batch(qs, group_size=2))
    for n, q in enumerate(qs):
        si, sv = map(np.asarray, eng.query(q))
        np.testing.assert_array_equal(np.sort(bi[n]), np.sort(si))
        np.testing.assert_allclose(np.sort(bv[n]), np.sort(sv), atol=1e-5)
    gi, _ = topk_exact(coo, qs[0], 20)
    assert _precision(gi, bi[0]) >= 0.95


def test_octet_batch_fori_path(monkeypatch):
    """Force the batch kernel's fori_loop body (the big-shape path the
    unrolled guard fans out to) and check it matches the unrolled one."""
    import spmv_topk_tpu.ops.kernel as kmod

    coo = create_sparse_matrix(900, 256, 9, "gamma", seed=204)
    cfg = TopKSpMVConfig(k=20, max_cols=256, width_quantum=1,
                         block_sublanes=32, fused_block_sublanes=32,
                         fused_layout="octet", fold_tile=1)
    eng = TopKSpMV(coo, cfg)
    qs = np.stack([create_sample_vector(256, seed=205 + i)
                   for i in range(2)])
    bi0, bv0 = map(np.asarray, eng.query_batch(qs, group_size=2))
    monkeypatch.setattr(kmod, "_BATCH_UNROLL_LIMIT", 1)
    # the jit cache key does not see the module constant: force a retrace
    # so the patched limit actually selects the fori path
    jax.clear_caches()
    bi1, bv1 = map(np.asarray, eng.query_batch(qs, group_size=2))
    np.testing.assert_array_equal(bi0, bi1)
    np.testing.assert_allclose(bv0, bv1, atol=1e-6)


def test_octet_production_batch_rescore():
    """Headline bench mode (octet + h16 + fold_tile=8 + rescore) through
    query_batch: threaded host rescore restores ~exact ranking."""
    coo = create_sparse_matrix(3000, 256, 12, "gamma", seed=210)
    cfg = TopKSpMVConfig(k=30, max_cols=256, query_codec="h16",
                         width_quantum=1, fused_layout="octet",
                         fold_tile=8, rescore_pool=120,
                         block_sublanes=32, fused_block_sublanes=64)
    eng = TopKSpMV(coo, cfg)
    qs = create_query_batch(2, 256, seed=211)
    bi, bv = map(np.asarray, eng.query_batch(qs, group_size=2))
    for n, q in enumerate(qs):
        gi, gv = topk_exact(coo, q, 30)
        assert _precision(gi, bi[n]) >= 0.96
        # rescored values are exact f32 dot products
        np.testing.assert_allclose(
            np.sort(bv[n])[-10:], np.sort(gv)[-10:], atol=1e-5)


def test_octet_scores_vs_oracle():
    """scores() on an octet engine reproduces A @ q (bf16-storage
    oracle) in original row order — the octet branch of
    spmv_fused_scores_octet_device and api.scores's (o, m) transpose,
    incl. the wide-octet (blocks_per_octet > 1) span decode at
    quantum 2."""
    from spmv_topk_tpu.formats.coo import CooMatrix
    from spmv_topk_tpu.ops.fixedpoint import quantize_bf16

    coo = create_sparse_matrix(1100, 256, 8, "gamma", seed=215)
    oracle = CooMatrix(coo.rows, coo.cols, quantize_bf16(coo.vals),
                       coo.num_rows, coo.num_cols)
    ref = None
    for wq, bs in ((1, 32), (2, 64)):
        cfg = TopKSpMVConfig(k=20, max_cols=256, width_quantum=wq,
                             fused_layout="octet", block_sublanes=32,
                             fused_block_sublanes=bs)
        eng = TopKSpMV(coo, cfg)
        q = create_sample_vector(256, seed=216)
        s = eng.scores(q)
        if ref is None:
            ref = spmv_exact(oracle, q)
        np.testing.assert_allclose(s, ref, atol=2e-3)


def test_octet_scores_partitioned():
    coo = create_sparse_matrix(1000, 256, 8, "gamma", seed=218)
    cfg = TopKSpMVConfig(k=20, max_cols=256, width_quantum=1,
                         fused_layout="octet", num_partitions=2,
                         block_sublanes=32, fused_block_sublanes=32)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=219)
    s = eng.scores(q)
    ref = spmv_exact(coo, q)
    np.testing.assert_allclose(s, ref, atol=2e-3)


def test_octet_save_load_roundtrip(tmp_path):
    """Octet snapshot: plan (OctetBucket tuple) + stream survive the
    save/load cycle; matrix= reattaches the rescore CSR (bench.py's
    warm-start path)."""
    coo = create_sparse_matrix(1400, 256, 9, "gamma", seed=220)
    cfg = TopKSpMVConfig(k=20, max_cols=256, query_codec="h16",
                         width_quantum=1, fused_layout="octet",
                         fold_tile=8, rescore_pool=80,
                         block_sublanes=32, fused_block_sublanes=32)
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(256, seed=221)
    i1, v1 = map(np.asarray, eng.query(q))

    path = str(tmp_path / "octet_eng.npz")
    eng.save(path)

    # production reload: matrix= keeps rescore_pool armed. The loaded
    # engine shares geometry/config with eng, so its query() reuses the
    # already-compiled kernel (no extra XLA:CPU compile).
    eng2 = TopKSpMV.load(path, matrix=coo)
    assert eng2.config.rescore_pool == 80
    i2, v2 = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)

    # degraded reload (no matrix): un-rescored serving with a warning
    with pytest.warns(UserWarning, match="rescore"):
        eng3 = TopKSpMV.load(path)
    i3, _ = map(np.asarray, eng3.query(q))
    gi, _ = topk_exact(coo, q, 20)
    assert _precision(gi, i3) >= 0.7  # raw h16 ranking


def test_octet_sharded_matches_exact():
    """Sharded octet engine (skeletonized transposed streams) matches the
    exact gold and the single-device engine — the regression the round-4
    _tmp_dbg2.py probe chased."""
    mesh = make_mesh(jax.devices()[:2])
    coo = create_sparse_matrix(1300, 256, 9, "gamma", seed=70)
    q = create_query_batch(3, 256, seed=75)[0]
    gi, _ = topk_exact(coo, q, 30)
    cfg = TopKSpMVConfig(k=30, max_cols=256, block_sublanes=32,
                         fused_block_sublanes=32, width_quantum=1,
                         fused_layout="octet")
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    ki, _ = map(np.asarray, eng.query(q))
    assert _precision(gi, ki) >= 0.96
    s = TopKSpMV(coo, cfg)
    si, _ = map(np.asarray, s.query(q))
    np.testing.assert_array_equal(np.sort(ki), np.sort(si))


def test_octet_sharded_batch_matches_single():
    """Sharded octet query_batch equals the sharded single-query path
    query by query (the round-4 _tmp_dbg_sharded.py probe)."""
    mesh = make_mesh(jax.devices()[:2])
    coo = create_sparse_matrix(1300, 256, 9, "gamma", seed=70)
    cfg = TopKSpMVConfig(k=30, max_cols=256, block_sublanes=32,
                         fused_block_sublanes=32, width_quantum=1,
                         fused_layout="octet")
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    Q = create_query_batch(3, 256, seed=75)
    bi, bv = map(np.asarray, eng.query_batch(Q, group_size=2))
    for qi in range(len(Q)):
        si, sv = map(np.asarray, eng.query(Q[qi]))
        np.testing.assert_array_equal(np.sort(bi[qi]), np.sort(si))
        np.testing.assert_allclose(np.sort(bv[qi]), np.sort(sv), atol=1e-5)
        gi, _ = topk_exact(coo, Q[qi], 30)
        assert _precision(gi, bi[qi]) >= 0.96


def test_octet_sharded_save_load(tmp_path):
    """Per-shard octet snapshots round-trip bit-identically."""
    mesh = make_mesh(jax.devices()[:2])
    coo = create_sparse_matrix(1300, 256, 9, "gamma", seed=84)
    cfg = TopKSpMVConfig(k=20, max_cols=256, query_codec="h16",
                         width_quantum=1, fused_layout="octet",
                         fused_block_sublanes=32, block_sublanes=32,
                         rescore_pool=80)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    q = create_sample_vector(256, seed=85)
    i1, v1 = map(np.asarray, eng.query(q))
    path = str(tmp_path / "sharded_octet")
    eng.save(path)
    eng2 = ShardedBucketedTopKSpMV.load(path, mesh=mesh, matrix=coo)
    i2, v2 = map(np.asarray, eng2.query(q))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_octet_config_rejects_unsorted_partitions():
    """octet + num_partitions>1 + sigma_sort=False fails at config
    construction (ADVICE r4: it used to surface as a deep packing error)."""
    with pytest.raises(ValueError, match="sigma_sort"):
        TopKSpMVConfig(fused_layout="octet", num_partitions=2,
                       sigma_sort=False)
    with pytest.raises(ValueError, match="sigma_sort"):
        coo = create_sparse_matrix(600, 256, 8, "gamma", seed=1)
        ShardedBucketedTopKSpMV(
            coo,
            TopKSpMVConfig(k=10, max_cols=256, fused_layout="octet",
                           sigma_sort=False, block_sublanes=32,
                           fused_block_sublanes=32),
            mesh=make_mesh(jax.devices()[:2]))


def test_octet_multicall_matches_onecall():
    """The per-bucket multicall dispatch (config.octet_multicall, the
    shipped default — ops/kernel._octet_multicall) returns the same
    top-k as the one-call fused kernel, modulo bottom-slot score ties
    (the non-tie-safe buffers drop tied candidates order-dependently in
    both variants; on this continuous-score corpus there are none)."""
    import dataclasses

    coo = create_sparse_matrix(1400, 256, 9, "gamma", seed=230)
    base = TopKSpMVConfig(k=25, max_cols=256, width_quantum=2,
                          block_sublanes=32, fused_block_sublanes=32,
                          fused_layout="octet", fold_tile=1)
    eng = TopKSpMV(coo, dataclasses.replace(base, octet_multicall=True))
    assert len(eng.fused.plan) > 1  # multicall must actually fan out
    q = create_sample_vector(256, seed=231)
    mi, mv = map(np.asarray, eng.query(q))
    eng.config = dataclasses.replace(base, octet_multicall=False)
    oi, ov = map(np.asarray, eng.query(q))
    np.testing.assert_array_equal(np.sort(mi), np.sort(oi))
    np.testing.assert_allclose(np.sort(mv), np.sort(ov), atol=1e-5)
    gi, _ = topk_exact(coo, q, 25)
    assert _precision(gi, mi) >= 0.95
