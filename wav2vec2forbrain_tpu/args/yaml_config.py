"""Environment-level config.yaml bootstrap.

Same contract as the reference (ref: src/args/yaml_config.py:9-62): the first
invocation writes a template config.yaml (one line per field, defaults filled
in where they exist) and exits with status 0 so the user can edit it; every
later invocation validates the file against the pydantic schema. Field names
and defaults are parity surface and must not change.
"""

import os
from typing import Optional

import yaml
from pydantic import BaseModel, Field
from pydantic_core import PydanticUndefined

default_value = "<your value here>"


class YamlConfigModel(BaseModel):
    cache_dir: str = Field(
        description="Scratch root for bulky artifacts (checkpoints, "
        "converted weights, experiment result folders)."
    )
    fig_dir: str = Field(
        description="Where generated plots and figures are written."
    )
    n3gram_lm_model_path: str = Field(
        description="Filesystem location of the 3-gram LM used for beam-search"
        " rescoring."
    )
    n5gram_lm_model_path: str = Field(
        description="Filesystem location of the 5-gram LM used for beam-search"
        " rescoring."
    )
    dataset_splits_dir: str = Field(
        description="Root of the T12 data release, i.e. the folder holding "
        "the unmodified train/test split subfolders."
    )
    wandb_api_key: str = Field(
        description="API key for Weights & Biases logging (copy it from the "
        "W&B settings page, or set it to any placeholder when running with "
        "use_wandb=False)."
    )
    wandb_project_name: str = Field(
        default="brain2text",
        description="W&B project that runs are logged under.",
    )
    wandb_entity: str = Field(
        default="machine-learning-hpi",
        description="W&B team/user namespace that owns the project.",
    )
    timit_dataset_splits_dir: str = Field(
        default="",
        description="Root of the TIMIT release (its train/test subfolders); "
        "only needed by the TIMIT-based experiments.",
    )
    elevenlabs_api_key: Optional[str] = Field(
        default=None,
        description="ElevenLabs TTS key; only the latent-analysis audio "
        "generation step uses it.",
    )
    latent_analysis_working_dir: str = Field(default="latent_analysis")


class YamlConfig:
    def __init__(self, config_path: str = "config.yaml"):
        self.config_path = config_path
        self.config = self._load_config()

    def _template_lines(self):
        for name, field in YamlConfigModel.model_fields.items():
            default = field.default
            if default is PydanticUndefined or default is None:
                default = default_value
            yield f"{name}: {default}\n"

    def _load_config(self) -> YamlConfigModel:
        if not os.path.exists(self.config_path):
            with open(self.config_path, "w") as f:
                f.writelines(self._template_lines())
            print(
                f"\nWrote a starter {self.config_path} to the project root — "
                "edit the placeholder values, then rerun."
            )
            raise SystemExit(0)
        with open(self.config_path, "r") as f:
            file_content = yaml.safe_load(f)
        try:
            return YamlConfigModel(**file_content)
        except Exception as e:
            raise Exception(
                f"{self.config_path} failed schema validation:\n{e}"
            )
