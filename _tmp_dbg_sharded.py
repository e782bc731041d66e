import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.ops.gold import topk_exact
from spmv_topk_tpu.parallel import make_mesh
from spmv_topk_tpu.parallel.sharded_buckets import ShardedBucketedTopKSpMV

def prec(a, b):
    a = np.asarray(a).tolist(); b = np.asarray(b).tolist()
    return len(set(a) & set(b)) / len(a)

coo = create_sparse_matrix(2200, 256, 12, "gamma", seed=70)
mesh = make_mesh(jax.devices()[:4])
cfg = TopKSpMVConfig(k=50, max_cols=256, block_sublanes=64,
                     fused_layout="octet")
eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
Q = create_query_batch(5, 256, seed=75)
# single-query path on same queries (known good)
for qi in (0, 4):
    ki, _ = map(np.asarray, eng.query(Q[qi]))
    g2, _ = topk_exact(coo, Q[qi], 50)
    print("single q", qi, prec(g2, ki), flush=True)
bi, bv = map(np.asarray, eng.query_batch(Q, group_size=4))
for qi in range(5):
    g2, _ = topk_exact(coo, Q[qi], 50)
    print("batch q", qi, prec(g2, bi[qi]), flush=True)
