"""Fused Pallas preprocessing kernel vs the jnp reference chain.

Runs in Pallas interpreter mode on CPU (same kernel code path as TPU modulo
Mosaic lowering); values and all gradients must match apply_preproc.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec2forbrain_tpu.models.preprocessing import (
    GAUSS_KERNEL_SIZE,
    apply_preproc,
    gaussian_kernel,
    init_preproc_params,
)
from wav2vec2forbrain_tpu.ops.pallas_preproc import apply_preproc_pallas

B, T, C = 3, 96, 256
SIGMA = 0.8


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    params = init_preproc_params(rng, None)
    # non-identity day weights so the affine actually mixes channels
    params["day_weights"] = params["day_weights"] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), params["day_weights"].shape
    )
    params["day_bias"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), params["day_bias"].shape
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, C), jnp.float32)
    day_idxs = jnp.asarray([0, 5, 23], jnp.int32)
    input_lens = jnp.asarray([T, T - 10, T - 3], jnp.int32)
    return params, x, day_idxs, input_lens


def test_forward_matches_reference(setup):
    params, x, day_idxs, input_lens = setup
    sk = gaussian_kernel(GAUSS_KERNEL_SIZE, SIGMA)
    ref_feats, ref_lens = apply_preproc(params, x, day_idxs, input_lens, sk)
    pal_feats, pal_lens = apply_preproc_pallas(
        params, x, day_idxs, input_lens, SIGMA
    )
    assert pal_feats.shape == ref_feats.shape
    np.testing.assert_allclose(
        np.asarray(pal_feats), np.asarray(ref_feats), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(pal_lens), np.asarray(ref_lens))


def test_gradients_match_reference(setup):
    params, x, day_idxs, input_lens = setup
    sk = gaussian_kernel(GAUSS_KERNEL_SIZE, SIGMA)
    # weight the output so grads are position-dependent
    w_out = jax.random.normal(
        jax.random.PRNGKey(4), (B, (T - 32) // 4 + 1, C * 32), jnp.float32
    )

    def loss_ref(p, xx):
        feats, _ = apply_preproc(p, xx, day_idxs, input_lens, sk)
        return jnp.sum(feats * w_out)

    def loss_pal(p, xx):
        feats, _ = apply_preproc_pallas(p, xx, day_idxs, input_lens, SIGMA)
        return jnp.sum(feats * w_out)

    diffable = {"day_weights": params["day_weights"], "day_bias": params["day_bias"]}

    def wrap(fn):
        def inner(d, xx):
            p = dict(params)
            p.update(d)
            return fn(p, xx)

        return inner

    (gd_ref, gx_ref) = jax.grad(wrap(loss_ref), argnums=(0, 1))(diffable, x)
    (gd_pal, gx_pal) = jax.grad(wrap(loss_pal), argnums=(0, 1))(diffable, x)

    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gd_pal["day_weights"]),
        np.asarray(gd_ref["day_weights"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gd_pal["day_bias"]),
        np.asarray(gd_ref["day_bias"]),
        atol=2e-4,
    )


def test_full_forward_with_use_pallas():
    """Model forward with use_pallas=True matches the jnp path."""
    from wav2vec2forbrain_tpu.models.assembly import (
        ModelSpec,
        forward,
        init_model_params,
    )
    from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig
    import dataclasses

    cfg = Wav2Vec2EncoderConfig.tiny_test()
    spec = ModelSpec(
        gru_hidden_size=16,
        gru_num_layers=1,
        latent_size=cfg.hidden_size,
        encoder_family="wav2vec2",
        w2v_cfg=cfg,
    )
    params, state = init_model_params(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 256), jnp.float32)
    days = jnp.asarray([1, 3], jnp.int32)
    lens = jnp.asarray([80, 70], jnp.int32)
    logits_ref, lens_ref, _ = forward(params, state, spec, x, days, lens)
    spec_p = dataclasses.replace(spec, use_pallas=True)
    logits_pal, lens_pal, _ = forward(params, state, spec_p, x, days, lens)
    np.testing.assert_allclose(
        np.asarray(logits_pal), np.asarray(logits_ref), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(lens_pal), np.asarray(lens_ref))
