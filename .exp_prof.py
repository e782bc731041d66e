"""Isolate the real kernel's slowdown vs the micro loop."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spmv_topk_tpu.config import TopKSpMVConfig, LANES
from spmv_topk_tpu.formats import create_sparse_matrix, pack_sell, create_query_batch
from spmv_topk_tpu.ops import kernel as KM

cfg = TopKSpMVConfig(k=100, lane_k=8, num_partitions=1, max_cols=1024)
coo = create_sparse_matrix(500_000, 1024, 20, "gamma", seed=1)
m = pack_sell(coo, cfg)
cpb = cfg.block_sublanes // cfg.chunk_sublanes
words = jax.device_put(m.words)
meta3d = jax.device_put(m.meta.reshape(-1, 1, cpb))
tabs = jnp.asarray(create_query_batch(8, 1024, seed=2).reshape(8, -1, LANES))
NNZ_PAD = m.words.shape[0]*128
print("padded words MB:", words.nbytes/1e6)

def scan_time(step_fn, n):
    @jax.jit
    def run(tabs):
        def step(c, tab):
            out = step_fn(tab)
            return c, jax.tree.map(lambda x: x.max(), out)
        return jax.lax.scan(step, 0, tabs)[1]
    r = lambda k_: np.asarray(jax.tree.leaves(run(tabs[:k_]))[0])
    r(2); r(n)
    def tme(k_):
        best = 9e9
        for _ in range(3):
            t0=time.perf_counter(); r(k_); best=min(best, time.perf_counter()-t0)
        return best
    per = (tme(n) - tme(2)) / (n - 2)
    return per

# A: full real kernel
per = scan_time(lambda tab: KM.topk_spmv_sell_device(words, meta3d, tab, cfg=cfg, interpret=False), 8)
print(f"A full kernel: {per*1e3:.3f} ms -> {NNZ_PAD/per/1e9:.1f} Gpadded-nnz/s, {words.nbytes/per/1e9:.0f} GB/s")

# B: same but no fold/meta/topk (accumulate only) - structural copy
def kernel_nofold(tab_ref, words_ref, o_ref, acc):
    i = pl.program_id(1)
    @pl.when(i == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    S = cfg.chunk_sublanes
    for s in range(cfg.block_sublanes // S):
        w = words_ref[s*S:(s+1)*S, :]
        val = KM._decode_val(w)
        vec = KM._gather_query(tab_ref, w, 8, S)
        acc[:] += val * vec
    @pl.when(i == pl.num_programs(1) - 1)
    def _(): o_ref[:] = acc[:]

P, pb = 1, meta3d.shape[0]
f_nofold = jax.jit(lambda tab: pl.pallas_call(kernel_nofold, grid=(P, pb),
    in_specs=[pl.BlockSpec((8, LANES), lambda p,i: (0,0), memory_space=pltpu.VMEM),
              pl.BlockSpec((cfg.block_sublanes, LANES), lambda p,i,pb=pb: (p*pb+i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8,LANES), lambda p,i: (0,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,LANES), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8,LANES), jnp.float32)],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","arbitrary")))(tab, words))
per = scan_time(f_nofold, 8)
print(f"B no-fold:     {per*1e3:.3f} ms -> {words.nbytes/per/1e9:.0f} GB/s")

# C: no-fold with acc as carried value per block (registers), single add to scratch at end
def kernel_reg(tab_ref, words_ref, o_ref, acc):
    i = pl.program_id(1)
    @pl.when(i == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    S = cfg.chunk_sublanes
    tot = jnp.zeros((S, LANES), jnp.float32)
    for s in range(cfg.block_sublanes // S):
        w = words_ref[s*S:(s+1)*S, :]
        tot += KM._decode_val(w) * KM._gather_query(tab_ref, w, 8, S)
    acc[:] += tot
    @pl.when(i == pl.num_programs(1) - 1)
    def _(): o_ref[:] = acc[:]
f_reg = jax.jit(lambda tab: pl.pallas_call(kernel_reg, grid=(P, pb),
    in_specs=[pl.BlockSpec((8, LANES), lambda p,i: (0,0), memory_space=pltpu.VMEM),
              pl.BlockSpec((cfg.block_sublanes, LANES), lambda p,i,pb=pb: (p*pb+i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8,LANES), lambda p,i: (0,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,LANES), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8,LANES), jnp.float32)],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","arbitrary")))(tab, words))
per = scan_time(f_reg, 8)
print(f"C reg-acc:     {per*1e3:.3f} ms -> {words.nbytes/per/1e9:.0f} GB/s")
