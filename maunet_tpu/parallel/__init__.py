from maunet_tpu.parallel.mesh import (  # noqa: F401
    batch_pspec,
    batch_sharding,
    make_mesh,
    replicated,
)
