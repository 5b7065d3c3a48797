"""Golden test: JAX Wav2Vec2-Conformer (rotary) encoder vs HF PyTorch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wav2vec2forbrain_tpu.models import convert
from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    apply_conformer_encoder,
    init_conformer_encoder_params,
    init_conformer_state,
    rotary_cos_sin,
)


def _hf_config():
    from transformers import Wav2Vec2ConformerConfig

    return Wav2Vec2ConformerConfig(
        hidden_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        conv_depthwise_kernel_size=31,
        position_embeddings_type="rotary",
        vocab_size=32,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        conformer_conv_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        attn_implementation="eager",
    )


def _our_config():
    return ConformerEncoderConfig.tiny_test(
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        conformer_conv_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )


def _build_pair(seed=0):
    from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
        Wav2Vec2ConformerEncoder,
    )

    torch.manual_seed(seed)
    enc = Wav2Vec2ConformerEncoder(_hf_config())
    sd = convert.state_dict_to_numpy(enc)
    params = jax.tree.map(jnp.asarray, convert.conformer_encoder_from_torch(sd, "", 2))
    state = jax.tree.map(
        jnp.asarray, convert.conformer_batch_norm_state_from_torch(sd, "", 2)
    )
    return enc, params, state


def test_rotary_matches_hf():
    from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
        Wav2Vec2ConformerRotaryPositionalEmbedding,
    )

    rot = Wav2Vec2ConformerRotaryPositionalEmbedding(_hf_config())
    x = torch.randn(2, 13, 96)
    with torch.no_grad():
        ref = rot(x).numpy()  # (2, T, 1, 1, head)
    cos, sin = rotary_cos_sin(13, 24, 10000)
    np.testing.assert_allclose(np.asarray(cos), ref[0, :, 0, 0, :], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), ref[1, :, 0, 0, :], atol=1e-6)


def test_conformer_encoder_eval_matches_hf():
    enc, params, state = _build_pair()
    enc = enc.eval()
    x = torch.randn(2, 13, 96)
    with torch.no_grad():
        ref = enc(x, return_dict=True)[0].numpy()
    ours, _ = apply_conformer_encoder(
        params, state, jnp.asarray(x.numpy()), _our_config(), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)


def test_conformer_encoder_train_mode_batchnorm():
    """Train mode must use batch stats and update running stats like torch."""
    enc, params, state = _build_pair(seed=1)
    enc = enc.train()
    x = torch.randn(2, 13, 96)
    with torch.no_grad():
        ref = enc(x, return_dict=True)[0].numpy()
    ours, new_state = apply_conformer_encoder(
        params, state, jnp.asarray(x.numpy()), _our_config(),
        rng=jax.random.PRNGKey(0), train=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)
    # running stats updated identically
    sd = convert.state_dict_to_numpy(enc)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(new_state["layers"][i]["batch_norm"]["mean"]),
            sd[f"layers.{i}.conv_module.batch_norm.running_mean"],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_state["layers"][i]["batch_norm"]["var"]),
            sd[f"layers.{i}.conv_module.batch_norm.running_var"],
            atol=1e-5,
        )


def test_conformer_init_shapes_match_converted():
    _, params, state = _build_pair(seed=2)
    cfg = _our_config()
    ours = init_conformer_encoder_params(jax.random.PRNGKey(0), cfg)
    ours_state = init_conformer_state(cfg)
    assert jax.tree.map(lambda a: a.shape, ours) == jax.tree.map(
        lambda a: a.shape, params
    )
    assert jax.tree.map(lambda a: a.shape, ours_state) == jax.tree.map(
        lambda a: a.shape, state
    )
