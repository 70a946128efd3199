from maunet_tpu.ops.resize import upsample_align_corners, upsample_like  # noqa: F401
