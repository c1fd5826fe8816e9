from .mesh import (
    make_mesh,
    make_mesh_2d,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    psum_mean_step,
    tp_shard_mlp,
)
