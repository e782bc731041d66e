from .mesh import make_mesh, AXIS
from .sharded_buckets import ShardedBucketedTopKSpMV
from .sharded_dense import ShardedDenseTopKSpMV
from .distributed import initialize_multihost, global_mesh

# Public multi-device engine = the fused bucketed layout (the only
# production format — the streamed SELL engine was removed in round 5;
# its exact-semantics oracle survives in ops/xla_ref.py).
ShardedTopKSpMV = ShardedBucketedTopKSpMV
