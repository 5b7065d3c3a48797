"""Experiment argument models (public CLI surface).

Mirror of the reference experiment args:
- B2TArgsModel                   (ref: src/experiments/b2t_experiment.py:17-20)
- B2TGruAndW2VArgsModel          (ref: src/experiments/b2t_gru_w2v_experiment.py:41-76)
- B2TGruAndW2VConformerArgsModel (ref: src/experiments/b2t_gru_w2v_conformer_experiment.py:36-58)

pyctcdecode defaults reproduced as constants (pyctcdecode is not a
dependency; the LM decode path is native here).
"""

from typing import Literal, Optional

from pydantic import Field

from wav2vec2forbrain_tpu.args.base_args import (
    B2TDatasetArgsModel,
    BaseExperimentArgsModel,
)
from wav2vec2forbrain_tpu.models.configs import (
    B2P2TBrainFeatureExtractorArgsModel,
    W2VBrainEncoderModelArgs,
)

# pyctcdecode.constants values (reference defaults).
DEFAULT_BEAM_WIDTH = 100
DEFAULT_PRUNE_LOGP = -10.0
DEFAULT_MIN_TOKEN_LOGP = -5.0


class B2TArgsModel(BaseExperimentArgsModel, B2TDatasetArgsModel):
    tokenizer: Literal["wav2vec_pretrained", "ours"] = "wav2vec_pretrained"
    tokenizer_checkpoint: str = "facebook/wav2vec2-base-100h"
    day_batches: bool = False


class _GruW2VCommonArgs(B2TArgsModel, B2P2TBrainFeatureExtractorArgsModel):
    brain_encoder_path: Optional[str] = None
    unfreeze_strategy: Literal["brain_encoder", "brain_encoder+w2v"] = "brain_encoder"
    w2v_learning_rate: Optional[float] = None
    w2v_warmup_start_step: Optional[int] = Field(
        default=None,
        description=(
            "Epoch index where the w2v group's lr warmup begins (lr is held "
            "at 0 until then; treated as 0 when unset)"
        ),
    )
    w2v_warmup_steps: Optional[int] = Field(
        default=None,
        description=(
            "How many epochs the w2v lr takes to ramp linearly from 0 to "
            "w2v_learning_rate after the warmup start (0 when unset)"
        ),
    )
    lm_decode_test_predictions: bool = False
    adjust_global_lr_to_w2v_postwarmup_lr: Optional[bool] = Field(
        default=None,
        description=(
            "Anneal the brain-encoder group's lr toward w2v_learning_rate "
            "across the warmup window and hold it there afterwards; requires "
            "unfreeze_strategy=brain_encoder+w2v"
        ),
    )
    lm_decode_beam_width: int = DEFAULT_BEAM_WIDTH
    lm_decode_beam_prune_logp: float = DEFAULT_PRUNE_LOGP
    lm_decode_token_min_logp: float = DEFAULT_MIN_TOKEN_LOGP
    lm_decode_alpha: float = 0.5
    lm_decode_beta: float = 0.5
    lm_score_boundary: bool = False
    # Intermediate-loss hooks: the reference W2VBrainEncoderModel accepts a
    # pre_w2v_head_for_additional_loss model plus weight/squared knobs in its
    # constructor but no registered experiment passes them
    # (ref: src/model/w2v_custom_feat_extractor.py:30-32,96-118); here the
    # equivalent CTC head on the pre-encoder latents is CLI-activatable.
    aux_head_vocab_size: Optional[int] = Field(
        default=None,
        description=(
            "Enable the intermediate CTC head on the pre-encoder brain "
            "latents with this output vocab size; adds "
            "intermediate/combined loss metrics and trains on the combined "
            "loss"
        ),
    )
    additional_loss_weight: Optional[float] = Field(
        default=None,
        description=(
            "Weight of the intermediate head's loss in the combined loss "
            "ctc + w * aux (1.0 when unset)"
        ),
    )
    additional_loss_squared: Optional[bool] = Field(
        default=None,
        description=(
            "Square the intermediate loss before weighting (combined loss "
            "becomes ctc + w * aux^2)"
        ),
    )


class B2TGruAndW2VArgsModel(_GruW2VCommonArgs, W2VBrainEncoderModelArgs):
    wav2vec_checkpoint: str = "facebook/wav2vec2-base-960h"
    w2v_skip_loading_weights: bool = Field(
        default=False,
        description="Random-init the encoder (architecture only, no pretrained weights)",
    )
    store_brain_encoder: bool = Field(
        default=False,
        description=(
            "Also write the brain-encoder subtree as its own artifact in the "
            "results directory"
        ),
    )


class B2TGruAndW2VConformerArgsModel(_GruW2VCommonArgs):
    wav2vec_checkpoint: str = "facebook/wav2vec2-conformer-rope-large-960h-ft"
    # TPU-native extension: the reference conformer CLI cannot random-init
    # (its args model lacks this flag, b2t_gru_w2v_conformer_experiment.py:36-58);
    # added here so the from-scratch setup also works with the conformer.
    w2v_skip_loading_weights: bool = Field(
        default=False,
        description="Random-init the encoder (architecture only, no pretrained weights)",
    )
