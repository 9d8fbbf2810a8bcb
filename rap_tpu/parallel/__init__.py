from .mesh import make_mesh, batch_sharding, replicate_sharding, shard_batch
from .distributed import initialize, make_global_batch, process_slice
