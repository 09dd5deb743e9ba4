from samplenerfro_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, put_batch, shard_batch_spec)
