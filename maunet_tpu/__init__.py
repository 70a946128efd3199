"""maunet_tpu — TPU-native framework for metadata-augmented U-Net LST/NDVI forecasting.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
`4l3x4ndre/Metadata-Augmented-UNET-for-LST-NDVI` (reference mounted at
/root/reference): U-Net / U-Net++ models conditioned on a metadata MLP and an
LSTM over CRU temperature history, the .npz tile data pipeline, losses
(L1/MSE/gradient/SSIM), per-Dynamic-World-class evaluation in physical units,
metadata-sensitivity analysis, training with HPO, and the serving apps —
all built TPU-first (NHWC layouts, static shapes, bf16 matmuls, data-parallel
+ spatial-parallel sharding over a jax Mesh, Pallas kernels on hot paths).
"""

__version__ = "0.1.0"

from maunet_tpu.config import Config, load_config  # noqa: F401
