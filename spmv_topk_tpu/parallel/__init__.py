from .sharded import ShardedTopKSpMV, make_mesh, AXIS
from .sharded_buckets import ShardedBucketedTopKSpMV
from .sharded_dense import ShardedDenseTopKSpMV
from .distributed import initialize_multihost, global_mesh
