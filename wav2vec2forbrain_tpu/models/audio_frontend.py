"""Wav2Vec2 audio conv feature encoder + feature projection (functional JAX).

TPU-native equivalent of the reference's Wav2Vec2WithoutTransformerModel
(ref: src/model/w2v_no_encoder.py:11-35) — raw 16 kHz audio -> projected
latents. Used by the latent-analysis subsystem to embed real speech for
comparison against brain-derived latents; the brain decoding path replaces
this frontend with the FC+GRU brain feature extractor.

Supports both HF norm variants:
- "group": group-norm (512 groups = per-channel instance norm) after conv 0
  only (base checkpoints)
- "layer": layer-norm after every conv (large/lv60 checkpoints)
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from wav2vec2forbrain_tpu.models.activations import ACT2FN
from wav2vec2forbrain_tpu.models.fc import init_linear, apply_linear


@dataclass
class FeatureEncoderConfig:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" | "layer"
    feat_extract_activation: str = "gelu"
    hidden_size: int = 768
    layer_norm_eps: float = 1e-5
    feat_proj_dropout: float = 0.1


def init_feature_encoder_params(rng, cfg: FeatureEncoderConfig) -> dict:
    layers = []
    in_dim = 1
    for i, (dim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        rng, kw, kb = jax.random.split(rng, 3)
        # torch Conv1d kaiming-uniform; kernel stored (k, in, out) for TIO
        import math

        fan_in = in_dim * k
        bound = math.sqrt(3.0) / math.sqrt(fan_in)
        layer = {
            "conv": {
                "kernel": jax.random.uniform(
                    kw, (k, in_dim, dim), jnp.float32, -bound, bound
                )
            }
        }
        if cfg.conv_bias:
            layer["conv"]["bias"] = jax.random.uniform(
                kb, (dim,), jnp.float32, -1 / math.sqrt(fan_in), 1 / math.sqrt(fan_in)
            )
        if cfg.feat_extract_norm == "group" and i == 0:
            layer["group_norm"] = {
                "scale": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32),
            }
        if cfg.feat_extract_norm == "layer":
            layer["layer_norm"] = {
                "scale": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32),
            }
        layers.append(layer)
        in_dim = dim
    rng, kp = jax.random.split(rng)
    return {
        "conv_layers": layers,
        "projection": {
            "layer_norm": {
                "scale": jnp.ones((cfg.conv_dim[-1],), jnp.float32),
                "bias": jnp.zeros((cfg.conv_dim[-1],), jnp.float32),
            },
            "projection": init_linear(kp, cfg.conv_dim[-1], cfg.hidden_size),
        },
    }


def _layer_norm(p, x, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]


def _group_norm_per_channel(p, x, eps):
    """HF uses num_groups == num_channels: per-channel instance norm over
    time. x: (B, T, C)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.var(x32, axis=1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]


def apply_feature_encoder(
    params: dict, audio: jnp.ndarray, cfg: FeatureEncoderConfig
) -> jnp.ndarray:
    """audio: (B, S) raw waveform -> (B, T, conv_dim[-1]) extract features."""
    act = ACT2FN[cfg.feat_extract_activation]
    x = audio[:, :, None]  # (B, S, 1) NTC
    for i, layer in enumerate(params["conv_layers"]):
        x = jax.lax.conv_general_dilated(
            x,
            layer["conv"]["kernel"].astype(x.dtype),
            window_strides=(cfg.conv_stride[i],),
            padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
        )
        if "bias" in layer["conv"]:
            x = x + layer["conv"]["bias"]
        if "group_norm" in layer:
            x = _group_norm_per_channel(layer["group_norm"], x, cfg.layer_norm_eps)
        if "layer_norm" in layer:
            x = _layer_norm(layer["layer_norm"], x, cfg.layer_norm_eps)
        x = act(x)
    return x


def apply_feature_projection(
    params: dict, extract_features: jnp.ndarray, cfg: FeatureEncoderConfig
) -> jnp.ndarray:
    """LN + linear to hidden_size (dropout omitted: eval-only use here)."""
    p = params["projection"]
    h = _layer_norm(p["layer_norm"], extract_features, cfg.layer_norm_eps)
    return apply_linear(p["projection"], h)


def apply_audio_frontend(
    params: dict, audio: jnp.ndarray, cfg: FeatureEncoderConfig
) -> jnp.ndarray:
    """Full Wav2Vec2WithoutTransformerModel.forward equivalent."""
    feats = apply_feature_encoder(params, audio, cfg)
    return apply_feature_projection(params, feats, cfg)


def feature_encoder_from_torch(sd, prefix_fe="feature_extractor", prefix_fp="feature_projection", n_layers=7, conv_bias=False, norm="group") -> dict:
    """Convert HF Wav2Vec2FeatureEncoder+Projection torch weights."""
    import numpy as np

    layers = []
    for i in range(n_layers):
        p = f"{prefix_fe}.conv_layers.{i}"
        w = sd[f"{p}.conv.weight"]  # (out, in, k)
        layer = {"conv": {"kernel": np.transpose(w, (2, 1, 0))}}
        if conv_bias and f"{p}.conv.bias" in sd:
            layer["conv"]["bias"] = sd[f"{p}.conv.bias"]
        if norm == "group" and i == 0:
            layer["group_norm"] = {
                "scale": sd[f"{p}.layer_norm.weight"],
                "bias": sd[f"{p}.layer_norm.bias"],
            }
        if norm == "layer":
            layer["layer_norm"] = {
                "scale": sd[f"{p}.layer_norm.weight"],
                "bias": sd[f"{p}.layer_norm.bias"],
            }
        layers.append(layer)
    return {
        "conv_layers": layers,
        "projection": {
            "layer_norm": {
                "scale": sd[f"{prefix_fp}.layer_norm.weight"],
                "bias": sd[f"{prefix_fp}.layer_norm.bias"],
            },
            "projection": {
                "kernel": np.transpose(sd[f"{prefix_fp}.projection.weight"]),
                "bias": sd[f"{prefix_fp}.projection.bias"],
            },
        },
    }
