import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from spmv_topk_tpu.config import TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.ops.gold import topk_exact
from spmv_topk_tpu.parallel import make_mesh
from spmv_topk_tpu.parallel.sharded_buckets import ShardedBucketedTopKSpMV
from spmv_topk_tpu.api import TopKSpMV

coo = create_sparse_matrix(2200, 256, 12, "gamma", seed=70)
q = create_query_batch(5, 256, seed=75)[0]
gi, gv = topk_exact(coo, q, 50)
gset = set(gi.tolist())
csr = coo.to_scipy()
sc = csr @ q

mesh = make_mesh(jax.devices()[:4])
for layout in ("slice", "octet"):
    cfg = TopKSpMVConfig(k=50, max_cols=256, block_sublanes=64,
                         fused_layout=layout)
    eng = ShardedBucketedTopKSpMV(coo, cfg, mesh=mesh)
    ki, kv = map(np.asarray, eng.query(q))
    kset = set(ki.tolist())
    missing = gset - kset
    extra = kset - gset
    print(layout, "missing", [(r, sc[r]) for r in missing],
          "extra", [(r, sc[r]) for r in extra], flush=True)
    # single-device octet for comparison
    s = TopKSpMV(coo, cfg)
    si, sv = map(np.asarray, s.query(q))
    sset = set(si.tolist())
    print(layout, "single-device missing", [(r, sc[r]) for r in gset - sset], flush=True)
