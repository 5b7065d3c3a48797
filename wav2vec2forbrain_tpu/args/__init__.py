from wav2vec2forbrain_tpu.args.base_args import (
    B2TDatasetArgsModel,
    BaseExperimentArgsModel,
    PRETRAINED_LATENT_SIZES,
)
from wav2vec2forbrain_tpu.args.yaml_config import YamlConfig, YamlConfigModel

__all__ = [
    "B2TDatasetArgsModel",
    "BaseExperimentArgsModel",
    "PRETRAINED_LATENT_SIZES",
    "YamlConfig",
    "YamlConfigModel",
]
