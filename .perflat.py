"""Latency experiments: dual accumulators, tree select, bucket-count effect."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spmv_topk_tpu.config import TopKSpMVConfig, LANES
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.formats.sell_buckets import pack_sell_buckets
from spmv_topk_tpu.ops import kernel as KM

coo = create_sparse_matrix(1_000_000, 1024, 20, "gamma", seed=1)
cfg = TopKSpMVConfig(k=100)
m = pack_sell_buckets(coo, cfg)
print("buckets:", len(m.buckets))

def scan_measure(fn, tabs, nq=22):
    @jax.jit
    def run(tabs):
        def step(c, tab):
            out = fn(tab)
            return c, jax.tree.map(lambda x: x.max(), out)
        return jax.lax.scan(step, 0, tabs)[1]
    r = lambda n: np.asarray(jax.tree.leaves(run(tabs[:n]))[0])
    r(2); r(nq)
    def tme(n):
        best=9e9
        for _ in range(3):
            t0=time.perf_counter(); r(n); best=min(best,time.perf_counter()-t0)
        return best
    return (tme(nq)-tme(2))/(nq-2)

# Variant kernel: dual accumulators + balanced select tree
def make_bucket_fn(b, codec, dual_acc, tree_sel):
    S = 8; K = 8
    W = b.width; spb = b.slices_per_block
    TR = 2 if codec == "int8x4" else 8
    def kern(nreal_ref, tab_ref, words_ref, tv_o, tt_o, tv, tt):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            tv[:] = jnp.full_like(tv, -jnp.inf); tt[:] = jnp.zeros_like(tt)
        shape = (S, LANES)
        bcs = [jnp.broadcast_to(tab_ref[c:c+1,:], shape) for c in range(TR)]
        def gather_f32(w):
            lo = jax.lax.shift_right_logical(w, 16)
            hi = jax.lax.shift_right_logical(w, 23)
            gs = [jnp.take_along_axis(bc, lo, axis=1) for bc in bcs]
            if not tree_sel:
                sel = gs[0]
                for c in range(1, 8):
                    sel = jnp.where(hi == c, gs[c], sel)
                return sel
            # balanced tree
            l0 = [jnp.where((hi & 1) == 1, gs[2*c+1], gs[2*c]) for c in range(4)]
            l1 = [jnp.where((hi & 2) == 2, l0[2*c+1], l0[2*c]) for c in range(2)]
            return jnp.where((hi & 4) == 4, l1[1], l1[0])
        def gather_i8(w):
            lo = jax.lax.shift_right_logical(w, 16)
            g0 = jnp.take_along_axis(bcs[0], lo, axis=1)
            g1 = jnp.take_along_axis(bcs[1], lo, axis=1)
            hi9 = jax.lax.shift_right_logical(w, 25)
            sel = jnp.where(hi9 == 1, g1, g0)
            sh = jax.lax.shift_right_logical(w, 20) & 24
            byte = jax.lax.shift_right_logical(sel, sh) & 0xFF
            return (byte - 128).astype(jnp.float32)
        gat = gather_i8 if codec == "int8x4" else gather_f32
        def do_slice(j):
            n_acc = 2 if (dual_acc and W // S >= 2) else 1
            accs = [jnp.zeros((S, LANES), jnp.float32) for _ in range(n_acc)]
            for u in range(W // S):
                w = words_ref[pl.ds(j*W + u*S, S), :]
                accs[u % n_acc] = accs[u % n_acc] + KM._decode_val(w) * gat(w)
            acc = accs[0] if n_acc == 1 else accs[0] + accs[1]
            score = jnp.sum(acc, axis=0, keepdims=True)
            t = b.slice_base + i * spb + j
            score = jnp.where(t < b.slice_base + nreal_ref[0,0], score, -jnp.inf)
            KM._topk_update(tv, tt, score, t, K)
        if spb * max(W//S,1) <= 64:
            for j in range(spb): do_slice(j)
        else:
            jax.lax.fori_loop(0, spb, lambda j,_: (do_slice(j), 0)[1], 0)
        @pl.when(i == pl.num_programs(0)-1)
        def _():
            tv_o[:] = tv[:]; tt_o[:] = tt[:]
    block_sub = W * spb
    nreal = jnp.array([[b.num_slices]], jnp.int32)
    def call(table, bw):
        return pl.pallas_call(kern, grid=(b.num_blocks,),
            in_specs=[pl.BlockSpec((1,1), lambda i:(0,0), memory_space=pltpu.SMEM),
                      pl.BlockSpec((TR, LANES), lambda i:(0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((block_sub, LANES), lambda i:(i,0), memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((8,LANES), lambda i:(0,0), memory_space=pltpu.VMEM)]*2,
            out_shape=[jax.ShapeDtypeStruct((8,LANES), jnp.float32),
                       jax.ShapeDtypeStruct((8,LANES), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((8,LANES), jnp.float32), pltpu.VMEM((8,LANES), jnp.int32)])(nreal, table, bw)
    return call

from spmv_topk_tpu.ops.quantized_query import pack_query_int8
def tables_for(codec, nq):
    qs = create_query_batch(nq, 1024, seed=2)
    if codec == "int8x4":
        return jnp.stack([pack_query_int8(np.pad(q, (0,0)))[0] for q in qs])
    return jnp.stack([q.reshape(-1, LANES) for q in qs])

bwords = [jnp.asarray(b.words) for b in m.buckets]
NNZ = coo.nnz
for codec in ("int8x4", "f32"):
    tabs = tables_for(codec, 22)
    for (dual, tree, tag) in [(False, False, "base"), (True, True, "dual+tree")]:
        if codec == "int8x4" and tree: tag = "dual"
        calls = [make_bucket_fn(b, codec, dual, tree) for b in m.buckets]
        def fn(tab, calls=calls):
            outs = [c(tab, bw) for c, bw in zip(calls, bwords)]
            return jnp.stack([o[0] for o in outs]), jnp.stack([o[1] for o in outs])
        per = scan_measure(fn, tabs)
        print(f"{codec} {tag}: {per*1e3:.3f} ms/q -> {NNZ/per/1e9:.1f} GNNZ/s")
