"""CPU Top-K SpMV baseline.

Port of the reference's CPU benchmark (/root/reference/test_cpu.py): load
or synthesize the matrix, build a scipy CSR, run Top-K against random
L2-normalized queries, write a timing CSV. The reference uses
sparse_dot_topn's awesome_cossim_topn (test_cpu.py:104); this uses it when
installed and otherwise scipy matvec + argpartition (the same O(nnz + N)
work without the fused C++ loop).

  python -m spmv_topk_tpu.bench.cpu_baseline --rows 100000 -k 100 -t 10
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..formats.synthetic import create_sparse_matrix, create_sample_vector
from ..formats.mtx import read_mtx


def topk_cpu(csr, query: np.ndarray, k: int):
    try:
        import sparse_dot_topn  # noqa: F401
        from sparse_dot_topn import awesome_cossim_topn

        res = awesome_cossim_topn(csr, np.asmatrix(query).T.tocsr(), k, 0.0)
        return res.indices[:k], res.data[:k]
    except Exception:
        scores = csr @ query
        idx = np.argpartition(-scores, min(k, len(scores) - 1))[:k]
        idx = idx[np.argsort(-scores[idx], kind="stable")]
        return idx.astype(np.int32), scores[idx].astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--matrix")
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--deg", type=int, default=20)
    ap.add_argument("--dist", default="gamma")
    ap.add_argument("-k", type=int, default=100)
    ap.add_argument("-t", "--num-tests", type=int, default=10)
    args = ap.parse_args(argv)

    coo = (read_mtx(args.matrix) if args.matrix else
           create_sparse_matrix(args.rows, args.cols, args.deg, args.dist, seed=1))
    csr = coo.to_scipy()

    times = []
    for it in range(args.num_tests):
        q = create_sample_vector(coo.num_cols, seed=it)
        t0 = time.perf_counter()
        topk_cpu(csr, q, args.k)
        times.append(time.perf_counter() - t0)
    mean_s = float(np.mean(times[min(2, len(times) - 1):]))
    print(json.dumps(dict(
        metric="cpu_topk_spmv", mean_ms=round(mean_s * 1e3, 3),
        gnnz_per_sec=round(coo.nnz / mean_s / 1e9, 3), nnz=coo.nnz, k=args.k,
    )))


if __name__ == "__main__":
    main()
