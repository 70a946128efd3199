from maunet_tpu.evaluate.metrics import (  # noqa: F401
    dw_map_from_input,
    eval_metrics,
    laplacian_variance,
    unnormalize_targets,
)
