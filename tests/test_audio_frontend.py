"""Golden test: JAX audio conv feature encoder vs HF Wav2Vec2 (torch)."""

import numpy as np
import pytest
import torch

from wav2vec2forbrain_tpu.models.audio_frontend import (
    FeatureEncoderConfig,
    apply_audio_frontend,
    apply_feature_encoder,
    feature_encoder_from_torch,
    init_feature_encoder_params,
)
from wav2vec2forbrain_tpu.models.convert import state_dict_to_numpy


def make_hf(norm="group", conv_bias=False):
    from transformers import Wav2Vec2Config
    from transformers.models.wav2vec2.modeling_wav2vec2 import (
        Wav2Vec2FeatureEncoder,
        Wav2Vec2FeatureProjection,
    )

    cfg = Wav2Vec2Config(
        conv_dim=[32, 32, 32],
        conv_stride=[5, 2, 2],
        conv_kernel=[10, 3, 3],
        conv_bias=conv_bias,
        feat_extract_norm=norm,
        hidden_size=48,
        num_feat_extract_layers=3,
    )
    torch.manual_seed(0)
    fe = Wav2Vec2FeatureEncoder(cfg).eval()
    fp = Wav2Vec2FeatureProjection(cfg).eval()
    return cfg, fe, fp


@pytest.mark.parametrize("norm,conv_bias", [("group", False), ("layer", True)])
def test_frontend_matches_hf(norm, conv_bias):
    hf_cfg, fe, fp = make_hf(norm, conv_bias)
    cfg = FeatureEncoderConfig(
        conv_dim=tuple(hf_cfg.conv_dim),
        conv_stride=tuple(hf_cfg.conv_stride),
        conv_kernel=tuple(hf_cfg.conv_kernel),
        conv_bias=conv_bias,
        feat_extract_norm=norm,
        hidden_size=hf_cfg.hidden_size,
    )
    sd = {}
    sd.update(
        {f"feature_extractor.{k}": v for k, v in state_dict_to_numpy(fe).items()}
    )
    sd.update(
        {f"feature_projection.{k}": v for k, v in state_dict_to_numpy(fp).items()}
    )
    params = feature_encoder_from_torch(
        sd, n_layers=3, conv_bias=conv_bias, norm=norm
    )

    audio = np.random.default_rng(0).standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        feats_t = fe(torch.tensor(audio)).transpose(1, 2)
        hidden_t, _ = fp(feats_t)

    feats_j = np.asarray(apply_feature_encoder(params, audio, cfg))
    np.testing.assert_allclose(feats_j, feats_t.numpy(), atol=2e-5)
    hidden_j = np.asarray(apply_audio_frontend(params, audio, cfg))
    np.testing.assert_allclose(hidden_j, hidden_t.numpy(), atol=2e-5)


def test_init_shapes_match_converted():
    hf_cfg, fe, fp = make_hf("group", False)
    cfg = FeatureEncoderConfig(
        conv_dim=tuple(hf_cfg.conv_dim),
        conv_stride=tuple(hf_cfg.conv_stride),
        conv_kernel=tuple(hf_cfg.conv_kernel),
        feat_extract_norm="group",
        hidden_size=hf_cfg.hidden_size,
    )
    import jax

    params = init_feature_encoder_params(jax.random.PRNGKey(0), cfg)
    sd = {}
    sd.update(
        {f"feature_extractor.{k}": v for k, v in state_dict_to_numpy(fe).items()}
    )
    sd.update(
        {f"feature_projection.{k}": v for k, v in state_dict_to_numpy(fp).items()}
    )
    conv = feature_encoder_from_torch(sd, n_layers=3)
    flat_a = jax.tree_util.tree_map(lambda x: x.shape, params)
    flat_b = jax.tree_util.tree_map(lambda x: x.shape, conv)
    assert flat_a == flat_b
