"""Compare layouts/codecs on TPU at 1M rows."""
import time, json
import jax, jax.numpy as jnp, numpy as np
from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig, LANES
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.ops.gold import topk_exact

coo = create_sparse_matrix(1_000_000, 1024, 20, "gamma", seed=1)
gq = create_query_batch(1, 1024, seed=3)[0]
gi, _ = topk_exact(coo, gq, 100)

def measure(name, cfg):
    eng = TopKSpMV(coo, cfg)
    NQ = 22
    tabs_scales = [eng._table(q) for q in create_query_batch(NQ, 1024, seed=2)]
    tabs = jnp.stack([t for t, _ in tabs_scales])
    @jax.jit
    def run(tabs):
        def step(c, tab):
            tv, tt = eng.candidates_traceable(tab)
            return c, (tv.max(), tt.max())
        return jax.lax.scan(step, 0, tabs)[1]
    r = lambda n: np.asarray(jax.tree.leaves(run(tabs[:n]))[0])
    r(2); r(NQ)
    def tme(n):
        best=9e9
        for _ in range(3):
            t0=time.perf_counter(); r(n); best=min(best,time.perf_counter()-t0)
        return best
    per = (tme(NQ)-tme(2))/(NQ-2)
    ki, kv = map(np.asarray, eng.query(gq))
    prec = len(set(gi.tolist()) & set(ki.tolist()))/100
    print(f"{name}: {per*1e3:.3f} ms/q  {coo.nnz/per/1e9:6.1f} GNNZ/s  "
          f"{eng.hbm_bytes/per/1e9:5.0f} GB/s  pad={eng.sell.padding_ratio:.3f}  prec@100={prec}")

measure("streamed f32   ", TopKSpMVConfig(k=100, layout="streamed"))
measure("bucketed f32   ", TopKSpMVConfig(k=100, layout="bucketed"))
measure("bucketed int8x4", TopKSpMVConfig(k=100, layout="bucketed", query_codec="int8x4"))
