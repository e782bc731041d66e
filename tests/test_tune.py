"""Autotuner: candidate ranking, precision gating, dense recommendation.

Runs with measure=False (the off-TPU mode): candidates are ranked by the
measured v5e ladder and precision is verified by real interpret-mode
engine runs on the sample. A small-geometry base config keeps the
interpret-mode compiles cheap.
"""

import numpy as np

from spmv_topk_tpu import TopKSpMV, TopKSpMVConfig, autotune
from spmv_topk_tpu.formats import create_sparse_matrix, create_sample_vector
from spmv_topk_tpu.ops.gold import topk_exact

SMALL = TopKSpMVConfig(block_sublanes=64, fused_block_sublanes=64)


def test_autotune_picks_h16_with_rescore():
    coo = create_sparse_matrix(3000, 512, 10, "gamma", seed=30)
    cfg, report = autotune(coo, k=50, target_precision=0.98,
                           measure=False, num_queries=2, base=SMALL,
                           codecs=("h16", "i8s"))
    # h16 + rescore is the fastest ladder entry and rescore makes it
    # exact-in-practice, so it must win on this corpus
    assert cfg.query_codec == "h16"
    assert cfg.rescore_pool and cfg.rescore_pool >= 4 * 50
    assert cfg.max_cols == 512
    winners = [r for r in report if r.get("meets_target")]
    assert winners, report
    # the returned config really delivers the target end to end
    eng = TopKSpMV(coo, cfg)
    q = create_sample_vector(512, seed=33)
    gi, _ = topk_exact(coo, q, 50)
    idx, _ = eng.query(q)
    assert len(set(np.asarray(idx).tolist()) & set(gi.tolist())) / 50 >= 0.98


def test_autotune_headlines_octet():
    """The winning config is the bench.py headline: octet transposed
    layout at width_quantum=2 (the padding-vs-branch-count sweet spot)
    with the strided fold (VERDICT r4 #4)."""
    coo = create_sparse_matrix(3000, 512, 10, "gamma", seed=35)
    cfg, report = autotune(coo, k=50, target_precision=0.98,
                           measure=False, num_queries=2, base=SMALL,
                           codecs=("h16",))
    assert cfg.fused_layout == "octet"
    assert cfg.width_quantum == 2
    assert cfg.fold_tile == 8
    assert all(r.get("fused_layout") for r in report if "codec" in r)


def test_autotune_batch_workloads_prefer_slice_layout():
    """expected_batch >= 16 flips the h16 layout to slice: the octet
    batch kernel measured 2x slower (118 vs 227 Gnnz/s/query at group 32,
    BENCH r5) — ranking must reflect the serving workload."""
    from spmv_topk_tpu.tune import _candidates

    single = _candidates(50, 512, 200, expected_batch=1)
    batch = _candidates(50, 512, 200, expected_batch=32)
    assert single[0]["fused_layout"] == "octet"
    assert single[0]["width_quantum"] == 2
    assert batch[0]["fused_layout"] == "slice"
    assert batch[0]["width_quantum"] == 2


def test_autotune_unreachable_target_falls_back_exact():
    coo = create_sparse_matrix(1500, 256, 8, "uniform", seed=31)
    cfg, report = autotune(coo, k=20, target_precision=1.01,  # impossible
                           measure=False, num_queries=1, base=SMALL,
                           codecs=("h16",))
    assert cfg.query_codec == "f32"
    assert any("fallback" in r.get("note", "") for r in report)


def test_autotune_recommends_dense_for_batched_small_corpus():
    coo = create_sparse_matrix(1500, 256, 8, "uniform", seed=32)
    _, report = autotune(coo, k=20, measure=False, num_queries=1,
                         expected_batch=32, base=SMALL, codecs=("h16",))
    assert report[0].get("engine") == "DenseTopKSpMV"
    # single-query workloads must NOT get the dense recommendation
    _, report1 = autotune(coo, k=20, measure=False, num_queries=1,
                          expected_batch=1, base=SMALL, codecs=("h16",))
    assert not any(r.get("engine") == "DenseTopKSpMV" for r in report1)


def test_autotune_samples_large_corpus():
    coo = create_sparse_matrix(5000, 256, 8, "gamma", seed=34)
    cfg, report = autotune(coo, k=20, measure=False, num_queries=1,
                           sample_rows=1500, base=SMALL, codecs=("i8s",))
    assert cfg.k == 20
    assert all("error" not in r for r in report if "codec" in r), report
