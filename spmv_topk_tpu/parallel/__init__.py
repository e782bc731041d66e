from .sharded import ShardedTopKSpMV, make_mesh, AXIS
