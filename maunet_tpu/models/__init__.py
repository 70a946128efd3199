from maunet_tpu.models.blocks import VGGBlock  # noqa: F401
from maunet_tpu.models.encoders import MetadataEncoder, TemporalEncoder  # noqa: F401
from maunet_tpu.models.factory import UrbanPredictor, build_model  # noqa: F401
from maunet_tpu.models.unet import MetaUNet  # noqa: F401
from maunet_tpu.models.unetpp import MetaUNetPP  # noqa: F401
