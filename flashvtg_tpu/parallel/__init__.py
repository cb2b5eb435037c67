from flashvtg_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate_params,
    data_axis_sharding,
)
