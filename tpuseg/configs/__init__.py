from tpuseg.configs.config import (
    DataConfig,
    DecoderConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
    Config,
    cvppp_config,
)

__all__ = [
    "DataConfig",
    "DecoderConfig",
    "EvalConfig",
    "ModelConfig",
    "TrainConfig",
    "Config",
    "cvppp_config",
]
