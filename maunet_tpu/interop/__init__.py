from maunet_tpu.interop.torch_import import (  # noqa: F401
    convert_state_dict,
    infer_hyperparams,
    load_torch_checkpoint,
)
