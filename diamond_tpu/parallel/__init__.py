from .mesh import (DATA_AXIS, batch_sharding, make_mesh, replicate, replicated,
                   select_devices, shard_device_batch, shard_imag_state, shard_pool)
from .multihost import (global_batch_from_local, global_replicated_from_full,
                        initialize as initialize_distributed)
