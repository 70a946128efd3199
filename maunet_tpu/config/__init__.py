from maunet_tpu.config.config import (  # noqa: F401
    Config,
    DatasetConfig,
    LoggingConfig,
    ModelConfig,
    PathsConfig,
    TrainingConfig,
    load_config,
)
