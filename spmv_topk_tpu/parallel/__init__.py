from .sharded import ShardedStreamedTopKSpMV, make_mesh, AXIS
from .sharded_buckets import ShardedBucketedTopKSpMV
from .sharded_dense import ShardedDenseTopKSpMV
from .distributed import initialize_multihost, global_mesh

# Public multi-device engine = the fast fused bucketed layout. The
# streamed layout (ShardedStreamedTopKSpMV) remains importable as a
# differential-testing oracle but is ~2.5x slower on v5e.
ShardedTopKSpMV = ShardedBucketedTopKSpMV
