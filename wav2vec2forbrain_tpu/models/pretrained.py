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


def encoder_config_for_checkpoint(checkpoint: str):
    """(family, config) for a checkpoint name."""
    from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
    from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

    if "conformer" in checkpoint:
        return "conformer", ConformerEncoderConfig.rope_large_960h()
    if "base" in checkpoint:
        return "wav2vec2", Wav2Vec2EncoderConfig.base_960h()
    return "wav2vec2", Wav2Vec2EncoderConfig.large_960h()


def _converted_cache_path(checkpoint: str, cache_dir: Optional[str]) -> str:
    root = cache_dir or os.path.expanduser("~/.cache/wav2vec2forbrain_tpu")
    return os.path.join(
        root, "converted_encoders", checkpoint.replace("/", "--") + ".msgpack"
    )


def _relistify(tree):
    """Inverse of flax to_state_dict's list→{"0": ...} encoding: a dict whose
    keys are exactly "0".."n-1" becomes a list again (our pytrees use lists
    only for per-layer stacks, so this round-trips exactly)."""
    if isinstance(tree, dict):
        out = {k: _relistify(v) for k, v in tree.items()}
        if out and all(k.isdigit() for k in out):
            idx = sorted(out, key=int)
            if idx == [str(i) for i in range(len(idx))]:
                return [out[str(i)] for i in range(len(idx))]
        return out
    return tree


def _load_converted_cache(path: str) -> Tuple[dict, dict, dict]:
    from flax import serialization

    with open(path, "rb") as f:
        bundle = _relistify(serialization.msgpack_restore(f.read()))
    return bundle["encoder"], bundle["lm_head"], bundle["state"]


def _store_converted_cache(path: str, enc: dict, head: dict, state: dict):
    from flax import serialization

    os.makedirs(os.path.dirname(path), exist_ok=True)
    bundle = serialization.to_state_dict(
        {"encoder": enc, "lm_head": head, "state": state}
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(bundle))
    os.replace(tmp, path)


def load_pretrained_encoder(
    checkpoint: str, cache_dir: Optional[str] = None
) -> Tuple[dict, dict, dict]:
    """Returns (encoder_params, lm_head_params, state) for the checkpoint.

    The HF torch state dict is converted ONCE and cached as msgpack under
    `<cache_dir>/converted_encoders/`; subsequent constructions load the
    msgpack directly and never touch torch. The w2v_skip_loading_weights=true
    path (from-scratch sweep, ref: sweeps/from_scratch.yaml) never calls this.
    """
    cache_path = _converted_cache_path(checkpoint, cache_dir)
    if os.path.exists(cache_path):
        return _load_converted_cache(cache_path)
    enc, head, state = _convert_from_hf(checkpoint, cache_dir)
    _store_converted_cache(cache_path, enc, head, state)
    return enc, head, state


def _convert_from_hf(
    checkpoint: str, cache_dir: Optional[str] = None
) -> Tuple[dict, dict, dict]:
    """One-time torch→pytree conversion (requires a populated HF cache or
    network access)."""
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
