from clip_lite_tpu.parallel.collectives import (  # noqa: F401
    axis_is_bound,
    pmean_if_bound,
    roll_shifted_left,
)
from clip_lite_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
