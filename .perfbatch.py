import time
import jax, jax.numpy as jnp, numpy as np
from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch

coo = create_sparse_matrix(1_000_000, 1024, 20, "gamma", seed=1)
for codec in ("int8x4", "f32"):
    cfg = TopKSpMVConfig(k=100, query_codec=codec)
    eng = TopKSpMV(coo, cfg)
    G = 8
    qs = create_query_batch(G, 1024, seed=2)
    tabs = jnp.stack([eng._table(q)[0] for q in qs])
    f = jax.jit(eng.batch_candidates_traceable)
    r = lambda: np.asarray(f(tabs)[0])
    r()
    # time NREP batched kernel invocations via scan
    import functools
    @functools.partial(jax.jit, static_argnames=("n",))
    def rep(tabs, n):
        def step(c, _):
            tv, tt = eng.batch_candidates_traceable(tabs)
            return c, tv.max()
        return jax.lax.scan(step, 0, jnp.arange(n))[1]
    g = lambda n: np.asarray(rep(tabs, n=n))
    g(2); g(10)
    def tme(n):
        best=9e9
        for _ in range(3):
            t0=time.perf_counter(); g(n); best=min(best,time.perf_counter()-t0)
        return best
    per_call = (tme(10)-tme(2))/8
    per_q = per_call / G
    print(f"batched {codec}: {per_call*1e3:.3f} ms per {G}-query group -> "
          f"{per_q*1e3:.3f} ms/q, {coo.nnz/per_q/1e9:.1f} GNNZ/s/q aggregate")
