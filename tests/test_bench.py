"""Benchmark harness smoke tests (CSV protocol, warm-up statistics)."""

import numpy as np

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.bench import run_benchmark, CSV_HEADER
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix


def test_harness_csv_and_stats():
    coo = create_sparse_matrix(800, 256, 10, "uniform", seed=40)
    cfg = TopKSpMVConfig(k=10, num_partitions=1, max_cols=256, block_sublanes=32)
    eng = TopKSpMV(coo, cfg)
    res = run_benchmark(eng, coo, num_tests=4, k=10, seed=41)
    lines = res.csv.strip().split("\n")
    assert lines[0] == CSV_HEADER
    assert len(lines) == 5
    assert res.mean_precision == 1.0
    assert res.mean_exec_ms > 0
    assert np.isfinite(res.nnz_per_sec)
