from maunet_tpu.parallel.infer import (  # noqa: F401
    flat_batch_sharding,
    flat_batch_spec,
    make_sharded_forward_fn,
    round_up_to_mesh,
    shard_batch_fn,
)
from maunet_tpu.parallel.mesh import (  # noqa: F401
    batch_pspec,
    batch_sharding,
    make_mesh,
    replicated,
)
