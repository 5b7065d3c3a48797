"""Pretrained HF checkpoint loading → JAX param trees (offline converter).

The reference builds its encoder from HF PyTorch checkpoints at construction
time (ref: src/model/w2v_custom_feat_extractor.py:44-53,
w2v_conformer_custom_feat_extractor.py:24-34). Here the torch state dict is
converted ONCE into our pytree layout (models/convert.py) and cached as
msgpack next to the HF cache, so training never touches torch.

Supported checkpoint families (ref: src/args/base_args.py:5-11):
- facebook/wav2vec2-base-960h        (post-LN, 12 layers, 768)
- facebook/wav2vec2-large-960h       (pre-LN "stable", 24 layers, 1024)
- facebook/wav2vec2-conformer-rope-large-960h-ft (conformer RoPE, 24, 1024)
"""

import os
from typing import Optional, Tuple

from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

# processor checkpoints for pyctcdecode-style LM decode
# (ref: b2t_gru_w2v_experiment.py:33-38, b2t_gru_w2v_conformer_experiment.py:31-33)
W2V_CHECKPOINT_TO_PROCESSOR = {
    "facebook/wav2vec2-base-960h": "patrickvonplaten/wav2vec2-base-100h-with-lm",
    "jonatasgrosman/wav2vec2-large-xlsr-53-english": (
        "patrickvonplaten/wav2vec2-base-100h-with-lm"
    ),
    "facebook/wav2vec2-conformer-rope-large-960h-ft": (
        "patrickvonplaten/wav2vec2-base-100h-with-lm"
    ),
}


def encoder_config_for_checkpoint(checkpoint: str):
    """(family, config) for a checkpoint name."""
    if "conformer" in checkpoint:
        return "conformer", ConformerEncoderConfig.rope_large_960h()
    if "base" in checkpoint:
        return "wav2vec2", Wav2Vec2EncoderConfig.base_960h()
    return "wav2vec2", Wav2Vec2EncoderConfig.large_960h()


def load_pretrained_encoder(
    checkpoint: str, cache_dir: Optional[str] = None
) -> Tuple[dict, dict, dict]:
    """Returns (encoder_params, lm_head_params, state) converted from the HF
    torch checkpoint. Requires network access or a populated HF cache; the
    w2v_skip_loading_weights=true path (from-scratch sweep,
    ref: sweeps/from_scratch.yaml) never calls this."""
    family, cfg = encoder_config_for_checkpoint(checkpoint)

    from wav2vec2forbrain_tpu.models import convert

    if family == "conformer":
        from transformers import Wav2Vec2ConformerForCTC

        model = Wav2Vec2ConformerForCTC.from_pretrained(
            checkpoint, cache_dir=cache_dir
        )
        sd = convert.state_dict_to_numpy(model)
        enc = convert.conformer_encoder_from_torch(
            sd, "wav2vec2_conformer.encoder", cfg.num_hidden_layers
        )
        state = {
            "encoder": convert.conformer_batch_norm_state_from_torch(
                sd, "wav2vec2_conformer.encoder", cfg.num_hidden_layers
            )
        }
    else:
        from transformers import Wav2Vec2ForCTC

        model = Wav2Vec2ForCTC.from_pretrained(checkpoint, cache_dir=cache_dir)
        sd = convert.state_dict_to_numpy(model)
        enc = convert.w2v_encoder_from_torch(
            sd, "wav2vec2.encoder", cfg.num_hidden_layers
        )
        state = {"encoder": {}}
    head = convert.linear_from_torch(sd, "lm_head")
    return enc, head, state
