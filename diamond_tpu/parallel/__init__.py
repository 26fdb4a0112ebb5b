from .mesh import (DATA_AXIS, batch_sharding, make_mesh, replicate, replicated,
                   shard_device_batch, shard_imag_state, shard_pool)
