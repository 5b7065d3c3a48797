"""Golden test: JAX wav2vec2 encoder vs HF PyTorch encoder (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wav2vec2forbrain_tpu.models import convert
from wav2vec2forbrain_tpu.models.wav2vec2 import (
    Wav2Vec2EncoderConfig,
    apply_lm_head,
    apply_w2v_encoder,
    init_lm_head_params,
    init_w2v_encoder_params,
)


def _hf_config(stable: bool):
    from transformers import Wav2Vec2Config

    return Wav2Vec2Config(
        hidden_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable,
        vocab_size=32,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        attn_implementation="eager",
    )


def _our_config(stable: bool):
    return Wav2Vec2EncoderConfig.tiny_test(
        do_stable_layer_norm=stable,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )


@pytest.mark.parametrize("stable", [False, True])
def test_w2v_encoder_matches_hf(stable):
    from transformers.models.wav2vec2.modeling_wav2vec2 import (
        Wav2Vec2Encoder,
        Wav2Vec2EncoderStableLayerNorm,
    )

    torch.manual_seed(0)
    hf_cfg = _hf_config(stable)
    enc_cls = Wav2Vec2EncoderStableLayerNorm if stable else Wav2Vec2Encoder
    enc = enc_cls(hf_cfg).eval()

    x = torch.randn(2, 13, 96)
    with torch.no_grad():
        ref = enc(x, return_dict=True)[0].numpy()

    sd = convert.state_dict_to_numpy(enc)
    params = jax.tree.map(
        jnp.asarray, convert.w2v_encoder_from_torch(sd, "", 2)
    )
    ours = np.asarray(
        apply_w2v_encoder(params, jnp.asarray(x.numpy()), _our_config(stable))
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_w2v_for_ctc_head_matches_hf():
    torch.manual_seed(1)
    lm = torch.nn.Linear(96, 32).eval()
    hidden = torch.randn(2, 9, 96)
    with torch.no_grad():
        ref = lm(hidden).numpy()
    params = jax.tree.map(
        jnp.asarray, convert.linear_from_torch(convert.state_dict_to_numpy(lm), "")
    )
    ours = np.asarray(
        apply_lm_head(params, jnp.asarray(hidden.numpy()), _our_config(False))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_init_shapes_match_converted():
    """Randomly-initialized params have the same tree structure as converted
    ones (guards the from-scratch path)."""
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Encoder

    torch.manual_seed(2)
    enc = Wav2Vec2Encoder(_hf_config(False))
    sd = convert.state_dict_to_numpy(enc)
    converted = convert.w2v_encoder_from_torch(sd, "", 2)
    ours = init_w2v_encoder_params(jax.random.PRNGKey(0), _our_config(False))

    conv_shapes = jax.tree.map(lambda a: a.shape, converted)
    our_shapes = jax.tree.map(lambda a: a.shape, ours)
    assert conv_shapes == our_shapes
