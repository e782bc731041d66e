"""Benchmark grid on TPU: cols in {512,1024}, dists, codecs, GloVe shape."""
import time
import jax, jax.numpy as jnp, numpy as np
from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.ops.gold import topk_exact

def measure(tag, coo, cfg, nq=22):
    eng = TopKSpMV(coo, cfg)
    tabs = jnp.stack([eng._table(q)[0] for q in create_query_batch(nq, coo.num_cols, seed=2)])
    @jax.jit
    def run(tabs):
        def step(c, tab):
            tv, tt = eng.candidates_traceable(tab)
            return c, (tv.max(), tt.max())
        return jax.lax.scan(step, 0, tabs)[1]
    r = lambda n: np.asarray(jax.tree.leaves(run(tabs[:n]))[0])
    r(2); r(nq)
    def tme(n):
        best = 9e9
        for _ in range(3):
            t0=time.perf_counter(); r(n); best=min(best, time.perf_counter()-t0)
        return best
    per = (tme(nq)-tme(2))/(nq-2)
    q = create_query_batch(1, coo.num_cols, seed=3)[0]
    ki, _ = map(np.asarray, eng.query(q))
    gi, _ = topk_exact(coo, q, 100)
    prec = len(set(gi.tolist()) & set(ki.tolist()))/100
    print(f"{tag}: {per*1e3:.3f} ms/q  {coo.nnz/per/1e9:6.1f} GNNZ/s  "
          f"{eng.hbm_bytes/per/1e9:4.0f} GB/s  pad={eng.sell.padding_ratio:.2f}  prec@100={prec}")

coo512 = create_sparse_matrix(1_000_000, 512, 20, "gamma", seed=1)
measure("512c gamma f32   ", coo512, TopKSpMVConfig(k=100, max_cols=512))
measure("512c gamma int8x4", coo512, TopKSpMVConfig(k=100, max_cols=512, query_codec="int8x4"))
del coo512
coou = create_sparse_matrix(1_000_000, 1024, 40, "uniform", seed=1)
measure("1024c uni40 int8x4", coou, TopKSpMVConfig(k=100, query_codec="int8x4"))
del coou
glove = create_sparse_matrix(2_196_017, 300, 25, "uniform", seed=1)  # GloVe shape
measure("glove 2.2Mx300 f32   ", glove, TopKSpMVConfig(k=100, max_cols=384))
measure("glove 2.2Mx300 int8x4", glove, TopKSpMVConfig(k=100, max_cols=384, query_codec="int8x4"))
