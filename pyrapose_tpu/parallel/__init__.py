from pyrapose_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    create_mesh_2d,
    image_sharding,
    replicated_sharding,
    shard_batch,
)
from pyrapose_tpu.parallel import multihost
