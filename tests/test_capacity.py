"""Capacity planner model checks + sharded serving-loop validation.

The planner (bench/capacity.py) projects BASELINE config 5 (500M rows on
v4-32) from measured single-chip constants; these tests pin its model
invariants. The serving loop itself (bench/service.py, the config-5
execution path) is validated end-to-end on the virtual 8-device mesh with
a sharded engine — the functional analog of running the service on a pod
slice, matching the reference's sw_emu strategy (Makefile:114-138).
"""

import jax
import pytest

from spmv_topk_tpu.bench.capacity import CHIPS, MEASURED, parse_mesh, plan
from spmv_topk_tpu.bench.service import run_service
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix
from spmv_topk_tpu.parallel import make_mesh
from spmv_topk_tpu.parallel.sharded_buckets import ShardedBucketedTopKSpMV


def test_mesh_parsing():
    chip, chips, hosts = parse_mesh("v4-32")
    assert (chips, hosts) == (16, 4)          # 32 TensorCores = 16 chips
    chip, chips, hosts = parse_mesh("v5e-8")
    assert (chips, hosts) == (8, 2)
    with pytest.raises(ValueError):
        parse_mesh("v9-4")


def test_config5_projection_fits_and_scales():
    p = plan(rows=500_000_000, cols=1024, mesh="v4-32", batch=64)
    assert p.fits and p.hbm_utilization < 0.1
    # north-star scaling bar: >= 80% efficiency at N >= 2 hosts
    assert p.scaling_efficiency >= 0.8
    assert p.qps > 100
    # the merge + rescore overheads must stay small against the sweep
    assert p.merge_ms + p.rescore_ms < p.sweep_ms


def test_dma_ceiling_clamp():
    # narrow-word codec on a high-rate chip: demand above 85% of HBM must
    # clamp the per-core rate, never exceed it
    p = plan(rows=10_000_000, mesh="v4-2", batch=64)
    demand = (p.nnz / p.sweep_ms / 1e6) * MEASURED["h16"]["words_per_nnz"] \
        * 4 / 1e3 / 1  # GB/s on the single chip
    assert demand <= CHIPS["v4"]["hbm_gbps"] * 0.85 * 1.001


def test_single_query_vs_batch_latency_model():
    lone = plan(rows=50_000_000, mesh="v5e-1", batch=1)
    grouped = plan(rows=50_000_000, mesh="v5e-1", batch=32)
    # batching amortizes decode: per-query time strictly improves
    assert grouped.per_query_ms < lone.per_query_ms
    # single-chip single-query must reproduce the measured headline to
    # first order: 1G nnz / 167 Gnnz/s ~= 6 ms
    assert 4.0 < lone.sweep_ms < 8.0


def test_sharded_service_loop_recall():
    """Config-5 execution path on the virtual mesh: sharded engine under
    the streaming service loop, recall vs the exact oracle."""
    mesh = make_mesh(jax.devices()[:4])
    coo = create_sparse_matrix(3000, 256, 10, "gamma", seed=5)
    cfg = TopKSpMVConfig(k=20, max_cols=256, block_sublanes=64,
                         rescore_pool=80)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    out = run_service(eng, coo, num_batches=2, batch_size=4, k=20,
                      oracle_every=1, seed=9)
    assert out["recall_at_10"] >= 0.9
    assert out["recall_at_100"] >= 0.9
    assert out["num_queries"] == 8
