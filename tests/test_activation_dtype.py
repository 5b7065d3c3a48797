"""The bf16 activation-stream mode (--activation_dtype=bfloat16).

The encoder blocks emit in the dtype they receive, so setting the stream
dtype at the encoder boundary (models/assembly.py::forward) is enough to
run every residual/glue tensor in bf16 while params, norm/softmax
internals, and the logits/loss stay f32. These tests pin:

- no silent promotion back to f32 anywhere in either encoder family
  (one stray f32 operand in a residual add would re-promote the whole
  stream and quietly lose the memory/bandwidth win)
- mutable state (conformer BatchNorm running stats) stays f32
- full-model loss stays close to the f32 stream on the same weights
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec2forbrain_tpu.models.assembly import (
    ModelSpec,
    forward_with_loss,
    init_model_params,
)
from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    apply_conformer_encoder,
    apply_conformer_encoder_scanned,
    init_conformer_encoder_params,
    init_conformer_state,
    stack_conformer_layers,
)
from wav2vec2forbrain_tpu.models.wav2vec2 import (
    Wav2Vec2EncoderConfig,
    apply_w2v_encoder,
    init_w2v_encoder_params,
)

CCFG = ConformerEncoderConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    vocab_size=32,
)


def _wcfg(stable):
    return Wav2Vec2EncoderConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        vocab_size=32,
        do_stable_layer_norm=stable,
    )


@pytest.mark.parametrize("train", [False, True])
def test_conformer_stream_stays_bf16(train):
    p = init_conformer_encoder_params(jax.random.PRNGKey(0), CCFG)
    s = init_conformer_state(CCFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64), jnp.bfloat16)
    h, ns = apply_conformer_encoder(
        p, s, x, CCFG, jax.random.PRNGKey(2), train, jnp.bfloat16
    )
    assert h.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(ns):
        assert leaf.dtype == jnp.float32  # BN running stats


def test_conformer_scanned_stream_stays_bf16():
    p = init_conformer_encoder_params(jax.random.PRNGKey(0), CCFG)
    s = init_conformer_state(CCFG)
    sp, ss = stack_conformer_layers(p, s)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64), jnp.bfloat16)
    h, ns = apply_conformer_encoder_scanned(
        sp, ss, x, CCFG, jax.random.PRNGKey(2), True, jnp.bfloat16
    )
    assert h.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(ns):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("stable", [False, True])
def test_w2v_stream_stays_bf16(stable):
    cfg = _wcfg(stable)
    p = init_w2v_encoder_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64), jnp.bfloat16)
    h = apply_w2v_encoder(p, x, cfg, jax.random.PRNGKey(2), True, jnp.bfloat16)
    assert h.dtype == jnp.bfloat16


@pytest.mark.parametrize("family", ["conformer", "wav2vec2"])
def test_full_model_loss_close_to_f32_stream(family):
    kw = dict(
        latent_size=64,
        encoder_family=family,
        conformer_cfg=CCFG if family == "conformer" else None,
        w2v_cfg=_wcfg(False) if family == "wav2vec2" else None,
        compute_dtype=jnp.bfloat16,
        gru_hidden_size=32,
        gru_num_layers=1,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 256)).astype("float32")
    )
    targets = jnp.asarray(
        np.random.default_rng(1).integers(1, 31, size=(2, 5)), jnp.int32
    )
    losses = {}
    for ad in (jnp.float32, jnp.bfloat16):
        spec = ModelSpec(activation_dtype=ad, **kw)
        params, st = init_model_params(jax.random.PRNGKey(0), spec)
        out = forward_with_loss(
            params, st, spec, x,
            jnp.zeros(2, jnp.int32), jnp.full((2,), 64, jnp.int32),
            targets, jnp.full((2,), 5, jnp.int32),
            jax.random.PRNGKey(3), train=False,
        )
        assert out["logits"].dtype == jnp.float32
        losses[ad] = float(out["loss"])
    assert np.isfinite(losses[jnp.bfloat16])
    assert abs(losses[jnp.bfloat16] - losses[jnp.float32]) < 0.02 * (
        1.0 + abs(losses[jnp.float32])
    )
