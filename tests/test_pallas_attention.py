"""Fused Pallas attention kernel vs the dense jnp paths.

Runs in Pallas interpreter mode on CPU (same kernel code path as TPU modulo
Mosaic lowering). Eval-mode values and all gradients must match the dense
softmax(QK^T)V implementations in models/wav2vec2.py and models/conformer.py
exactly (same dtypes, same f32 accumulation order). Train-mode dropout uses
a different (stateless-hash) stream than jax.random — parity there is
statistical + self-consistency (fwd/bwd masks identical, unbiasedness).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    conformer_self_attention,
    init_conformer_layer_params,
    rotary_cos_sin,
)
from wav2vec2forbrain_tpu.models.wav2vec2 import (
    Wav2Vec2EncoderConfig,
    attention,
    init_w2v_encoder_params,
)
from wav2vec2forbrain_tpu.ops.pallas_attention import mha_fused

B, H, T, D = 3, 4, 45, 16  # deliberately lane-unaligned T and D


@pytest.fixture(scope="module")
def qkv():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, g = (
        jax.random.normal(key, (B, H, T, D), jnp.float32) for key in ks
    )
    return q, k, v, g


def _dense(q, k, v, scale):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
    )


def test_eval_forward_matches_dense(qkv):
    q, k, v, _ = qkv
    scale = 1.0 / math.sqrt(D)
    seed = jnp.zeros((), jnp.int32)
    out = mha_fused(q, k, v, seed, scale, 0.0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(q, k, v, scale)), atol=1e-6
    )


def test_eval_gradients_match_dense(qkv):
    q, k, v, g = qkv
    scale = 1.0 / math.sqrt(D)
    seed = jnp.zeros((), jnp.int32)

    def f_pal(q, k, v):
        return jnp.sum(mha_fused(q, k, v, seed, scale, 0.0, jnp.float32) * g)

    def f_ref(q, k, v):
        return jnp.sum(_dense(q, k, v, scale) * g)

    gp = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_compute_dtype_matches_dense(qkv):
    """bf16 inputs to the MXU with f32 accumulation, like the train step."""
    q, k, v, _ = qkv
    scale = 1.0 / math.sqrt(D)
    out = mha_fused(
        q, k, v, jnp.zeros((), jnp.int32), scale, 0.0, jnp.bfloat16
    )
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    ref = jnp.einsum(
        "bhqk,bhkd->bhqd",
        p.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_dropout_deterministic_and_unbiased(qkv):
    q, k, v, g = qkv
    scale = 1.0 / math.sqrt(D)
    seed = jnp.asarray(1234, jnp.int32)
    o1 = mha_fused(q, k, v, seed, scale, 0.25, jnp.float32)
    o2 = mha_fused(q, k, v, seed, scale, 0.25, jnp.float32)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = mha_fused(q, k, v, seed + 1, scale, 0.25, jnp.float32)
    assert np.any(np.asarray(o1) != np.asarray(o3))
    # unbiased: averaging over many seeds recovers the eval output
    outs = [
        np.asarray(
            mha_fused(q, k, v, jnp.asarray(s, jnp.int32), scale, 0.25,
                      jnp.float32)
        )
        for s in range(30)
    ]
    ref = np.asarray(mha_fused(q, k, v, seed, scale, 0.0, jnp.float32))
    err = np.abs(np.mean(outs, axis=0) - ref).mean()
    assert err < 0.05, err


def test_dropout_gradient_matches_finite_difference(qkv):
    """The bwd kernel recomputes the SAME hash mask the fwd used; a finite
    difference through the dropped forward checks that (a mismatched mask
    would give a grossly wrong derivative)."""
    q, k, v, g = qkv
    scale = 1.0 / math.sqrt(D)
    seed = jnp.asarray(77, jnp.int32)

    def f(q):
        return jnp.sum(mha_fused(q, k, v, seed, scale, 0.25, jnp.float32) * g)

    grad = jax.grad(f)(q)
    eps = 1e-3
    for idx in [(0, 1, 5, 7), (2, 3, 40, 0), (1, 0, 0, 15)]:
        d = jnp.zeros_like(q).at[idx].set(1.0)
        fd = (float(f(q + eps * d)) - float(f(q - eps * d))) / (2 * eps)
        assert abs(fd - float(grad[idx])) < 5e-3, (idx, fd, float(grad[idx]))


# --- model wiring -----------------------------------------------------------


@pytest.fixture
def kernel_policy_all():
    """Force the Pallas kernels on: `auto` routes attention to the XLA-BTH
    dense path (ops/xla_attention.py, measured faster at the encoder
    shapes), so kernel-route tests must select the kernel explicitly."""
    from wav2vec2forbrain_tpu.ops import select

    old = select._policy
    select.set_kernel_policy("all")
    yield
    select._policy = old


def test_w2v_attention_use_pallas_matches_dense(kernel_policy_all):
    cfg = Wav2Vec2EncoderConfig.tiny_test()
    params = init_w2v_encoder_params(jax.random.PRNGKey(0), cfg)
    p_attn = params["layers"][0]["attention"]
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 33, cfg.hidden_size), jnp.float32
    )
    ref, _ = attention(p_attn, x, cfg.num_attention_heads)
    pal, _ = attention(
        p_attn, x, cfg.num_attention_heads, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_conformer_attention_use_pallas_matches_dense(kernel_policy_all):
    cfg = ConformerEncoderConfig.tiny_test()
    p = init_conformer_layer_params(jax.random.PRNGKey(0), cfg)["self_attn"]
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 29, cfg.hidden_size), jnp.float32
    )
    head = cfg.hidden_size // cfg.num_attention_heads
    cos, sin = rotary_cos_sin(x.shape[1], head, cfg.rotary_embedding_base)
    ref, _ = conformer_self_attention(p, x, cfg, cos, sin, None, False, None)
    pal, _ = conformer_self_attention(
        p, x, cfg, cos, sin, None, False, None, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_dense_bth_matches_kernel_train_mode():
    """The XLA-BTH dense route (ops/xla_attention.py) must reproduce the
    kernel's TRAIN-mode output: the hash-dropout streams are bit-identical
    by construction (same murmur constants, same (seed, row, head, q, k)
    keying), so kernel<->dense routing never changes a training trajectory
    beyond float reduction order."""
    from wav2vec2forbrain_tpu.ops.pallas_attention import mha_fused_bth
    from wav2vec2forbrain_tpu.ops.xla_attention import mha_dense_bth

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (
        jax.random.normal(key, (B, T, H * D), jnp.float32) for key in ks
    )
    seed = jnp.asarray(4242, jnp.int32)
    scale = 1.0 / math.sqrt(D)
    for rate in (0.0, 0.25):
        out_k = mha_fused_bth(q, k, v, seed, H, scale, rate, jnp.float32)
        out_d = mha_dense_bth(q, k, v, seed, H, scale, rate, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out_d), np.asarray(out_k), atol=2e-5, rtol=1e-5,
        )
    # gradients through the dense route's checkpointed core match the
    # kernel's recompute-backward
    g = jax.random.normal(jax.random.PRNGKey(9), (B, T, H * D), jnp.float32)

    def loss(fn, q):
        return jnp.sum(fn(q, k, v, seed, H, scale, 0.25, jnp.float32) * g)

    gk = jax.grad(lambda q: loss(mha_fused_bth, q))(q)
    gd = jax.grad(lambda q: loss(mha_dense_bth, q))(q)
    np.testing.assert_allclose(
        np.asarray(gd), np.asarray(gk), atol=5e-5, rtol=1e-4
    )


def test_conformer_attention_grads_match(qkv, kernel_policy_all):
    cfg = ConformerEncoderConfig.tiny_test()
    p = init_conformer_layer_params(jax.random.PRNGKey(0), cfg)["self_attn"]
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 29, cfg.hidden_size), jnp.float32
    )
    head = cfg.hidden_size // cfg.num_attention_heads
    cos, sin = rotary_cos_sin(x.shape[1], head, cfg.rotary_embedding_base)

    def loss(p, x, use_pallas):
        y, _ = conformer_self_attention(
            p, x, cfg, cos, sin, None, False, None, use_pallas
        )
        return jnp.sum(y * y)

    gr = jax.grad(loss, argnums=(0, 1))(p, x, False)
    gp = jax.grad(loss, argnums=(0, 1))(p, x, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        gp,
        gr,
    )
