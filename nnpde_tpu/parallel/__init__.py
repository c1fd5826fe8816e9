from .mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_dcn,
    dp_dcn_step,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    psum_mean_step,
    fused_residual_step,
    tp_shard_mlp,
)
