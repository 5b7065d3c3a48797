"""LayerDrop golden parity vs HF torch with a FIXED drop mask.

The reference fine-tunes through HF encoders whose checkpoint configs carry
layerdrop=0.1, and HF applies it in train mode (ref behavior via
src/model/w2v_custom_feat_extractor.py:167-191 wrapping Wav2Vec2Encoder).
Our implementation computes every layer and where-masks its contribution
(models/wav2vec2.layerdrop_mask); these tests pin the numerics: with the
same layers skipped, outputs must match HF's skip exactly, eval mode must
never drop, and scanned/unrolled layouts must agree under the same rng.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wav2vec2forbrain_tpu.models import convert
from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    apply_conformer_encoder,
    apply_conformer_encoder_scanned,
    stack_conformer_layers,
)
from wav2vec2forbrain_tpu.models.wav2vec2 import (
    Wav2Vec2EncoderConfig,
    apply_w2v_encoder,
    apply_w2v_encoder_scanned,
    layerdrop_mask,
    stack_w2v_layers,
)

N_LAYERS = 4


def _hf_w2v_config(layerdrop=0.5):
    from transformers import Wav2Vec2Config

    return Wav2Vec2Config(
        hidden_size=96,
        num_hidden_layers=N_LAYERS,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        vocab_size=32,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        layerdrop=layerdrop,
        attn_implementation="eager",
    )


def _our_w2v_config(layerdrop=0.5):
    return Wav2Vec2EncoderConfig.tiny_test(
        num_hidden_layers=N_LAYERS,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        layerdrop=layerdrop,
    )


def _force_hf_drop_mask(monkeypatch, mask):
    """Make HF's per-layer torch.rand([]) realize the given skip mask
    (True -> skip: rand below layerdrop=0.5)."""
    it = iter(mask)

    def fake_rand(*shape, **kw):
        if shape == ([],) or shape == ((),):
            return torch.tensor(0.0 if next(it) else 1.0)
        raise AssertionError(f"unexpected torch.rand{shape}")

    monkeypatch.setattr(torch, "rand", fake_rand)


def _drop_mask_from_rng(rng, layerdrop=0.5):
    """The mask our encoder will realize for this rng: the apply functions
    split the layerdrop key FIRST, right after the post-pos-conv dropout
    (which consumes nothing at rate 0)."""
    mask, _ = layerdrop_mask(rng, N_LAYERS, layerdrop, train=True)
    return np.asarray(mask)


def test_w2v_layerdrop_matches_hf_fixed_mask(monkeypatch):
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Encoder

    torch.manual_seed(3)
    enc = Wav2Vec2Encoder(_hf_w2v_config()).train()
    sd = convert.state_dict_to_numpy(enc)
    params = jax.tree.map(
        jnp.asarray, convert.w2v_encoder_from_torch(sd, "", N_LAYERS)
    )

    rng = jax.random.PRNGKey(42)
    mask = _drop_mask_from_rng(rng)
    assert mask.any() and not mask.all(), "pick a seed that drops some layers"

    x = torch.randn(2, 13, 96)
    _force_hf_drop_mask(monkeypatch, mask)
    with torch.no_grad():
        ref = enc(x, return_dict=True)[0].numpy()

    ours = np.asarray(
        apply_w2v_encoder(
            params, jnp.asarray(x.numpy()), _our_w2v_config(), rng, train=True
        )
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_w2v_layerdrop_scanned_matches_unrolled():
    rng_init = jax.random.PRNGKey(0)
    cfg = _our_w2v_config()
    from wav2vec2forbrain_tpu.models.wav2vec2 import init_w2v_encoder_params

    params = init_w2v_encoder_params(rng_init, cfg)
    stacked = stack_w2v_layers(params)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 13, 96))
    rng = jax.random.PRNGKey(42)
    a = apply_w2v_encoder(params, x, cfg, rng, train=True)
    b = apply_w2v_encoder_scanned(stacked, x, cfg, rng, train=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # and both differ from the no-drop forward (the mask did something)
    c = apply_w2v_encoder(params, x, cfg, rng=None, train=False)
    assert float(jnp.abs(a - c).max()) > 1e-3


def test_eval_mode_never_drops():
    cfg = _our_w2v_config(layerdrop=1.0)  # would drop EVERY layer in train
    from wav2vec2forbrain_tpu.models.wav2vec2 import init_w2v_encoder_params

    params = init_w2v_encoder_params(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 9, 96))
    no_rng = apply_w2v_encoder(params, x, cfg, rng=None, train=False)
    with_rng = apply_w2v_encoder(
        params, x, cfg, rng=jax.random.PRNGKey(3), train=False
    )
    np.testing.assert_array_equal(np.asarray(no_rng), np.asarray(with_rng))

    train_cfg = _our_w2v_config(layerdrop=1.0)
    dropped_all = apply_w2v_encoder(
        params, x, train_cfg, rng=jax.random.PRNGKey(3), train=True
    )
    # with every layer dropped, output is just pos-conv + LN of the input:
    # it must differ from the full forward
    assert float(jnp.abs(dropped_all - no_rng).max()) > 1e-3


def test_conformer_layerdrop_matches_hf_fixed_mask(monkeypatch):
    from transformers import Wav2Vec2ConformerConfig
    from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
        Wav2Vec2ConformerEncoder,
    )

    hf_cfg = Wav2Vec2ConformerConfig(
        hidden_size=96,
        num_hidden_layers=N_LAYERS,
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
        layerdrop=0.5,
        attn_implementation="eager",
    )
    our_cfg = ConformerEncoderConfig.tiny_test(
        num_hidden_layers=N_LAYERS,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        conformer_conv_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.5,
    )
    torch.manual_seed(9)
    enc = Wav2Vec2ConformerEncoder(hf_cfg).train()
    sd = convert.state_dict_to_numpy(enc)
    params = jax.tree.map(
        jnp.asarray, convert.conformer_encoder_from_torch(sd, "", N_LAYERS)
    )
    state = jax.tree.map(
        jnp.asarray,
        convert.conformer_batch_norm_state_from_torch(sd, "", N_LAYERS),
    )

    rng = jax.random.PRNGKey(42)
    mask = _drop_mask_from_rng(rng)
    assert mask.any() and not mask.all()

    x = torch.randn(2, 13, 96)
    _force_hf_drop_mask(monkeypatch, mask)
    with torch.no_grad():
        ref = enc(x, return_dict=True)[0].numpy()
    ref_bn = [
        (
            layer.conv_module.batch_norm.running_mean.numpy().copy(),
            layer.conv_module.batch_norm.running_var.numpy().copy(),
        )
        for layer in enc.layers
    ]

    ours, new_state = apply_conformer_encoder(
        params, state, jnp.asarray(x.numpy()), our_cfg, rng, train=True
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
    # BN running stats: updated for kept layers, untouched for dropped ones
    for i, (mean, var) in enumerate(ref_bn):
        got = new_state["layers"][i]["batch_norm"]
        np.testing.assert_allclose(np.asarray(got["mean"]), mean, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["var"]), var, atol=1e-5)

    # scanned layout under the same rng realizes the same mask
    stacked_p, stacked_s = stack_conformer_layers(params, state)
    ours_scan, _ = apply_conformer_encoder_scanned(
        stacked_p,
        {"layers_stacked": stacked_s["layers_stacked"]},
        jnp.asarray(x.numpy()),
        our_cfg,
        rng,
        train=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours_scan), np.asarray(ours), atol=1e-5
    )
