from .sharded import ShardedTopKSpMV, make_mesh, AXIS
from .sharded_buckets import ShardedBucketedTopKSpMV
from .distributed import initialize_multihost, global_mesh
