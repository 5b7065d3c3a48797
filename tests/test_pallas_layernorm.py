"""Fused LayerNorm kernel (ops/pallas_layernorm.py) parity tests.

Reference semantics = models/wav2vec2.py::_layer_norm (f32 math, output in
the activation-stream dtype). Values must match exactly in f32 (same op
order), grads to accumulation-order tolerance; bf16 streams to rounding
tolerance. On a dp mesh the kernel must partition without all-gathers with
dgamma/dbeta partials batch-summed across shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec2forbrain_tpu.models.wav2vec2 import _layer_norm
from wav2vec2forbrain_tpu.ops.pallas_layernorm import layer_norm_fused

B, T, C = 8, 24, 256
EPS = 1e-5


@pytest.fixture
def data():
    kx, ks, kb, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, (B, T, C), jnp.float32) * 2.0 + 0.5
    scale = jax.random.normal(ks, (C,), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(kb, (C,), jnp.float32) * 0.2
    g = jax.random.normal(kg, (B, T, C), jnp.float32)
    return x, scale, bias, g


def _ref(x, scale, bias):
    return _layer_norm({"scale": scale, "bias": bias}, x, EPS)


def test_forward_matches_xla_f32(data):
    x, scale, bias, _ = data
    np.testing.assert_allclose(
        np.asarray(layer_norm_fused(x, scale, bias, EPS)),
        np.asarray(_ref(x, scale, bias)),
        atol=1e-6,
    )


def test_forward_matches_xla_bf16(data):
    x, scale, bias, _ = data
    xb = x.astype(jnp.bfloat16)
    out = layer_norm_fused(xb, scale, bias, EPS)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(_ref(xb, scale, bias), dtype=np.float32),
        atol=5e-2,
        rtol=5e-2,
    )


def test_grads_match_autodiff_f32(data):
    x, scale, bias, g = data

    def loss(ln):
        def f(x, scale, bias):
            return jnp.sum(ln(x, scale, bias) * g)

        return f

    ref = jax.grad(loss(_ref), argnums=(0, 1, 2))(x, scale, bias)
    got = jax.grad(
        loss(lambda x, s, b: layer_norm_fused(x, s, b, EPS)), argnums=(0, 1, 2)
    )(x, scale, bias)
    for name, a, b in zip(("dx", "dscale", "dbias"), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-5, err_msg=name
        )


def test_odd_batch_and_channels():
    # group picking must handle b with few divisors; C below one lane tile
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 96), jnp.float32)
    scale = jnp.ones((96,), jnp.float32)
    bias = jnp.zeros((96,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(layer_norm_fused(x, scale, bias, EPS)),
        np.asarray(_ref(x, scale, bias)),
        atol=1e-6,
    )


def test_partitions_without_allgather():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    kx, kg = jax.random.split(jax.random.PRNGKey(2))
    x0 = jax.random.normal(kx, (B, T, C), jnp.float32)
    scale = jnp.ones((C,), jnp.float32) * 1.1
    bias = jnp.zeros((C,), jnp.float32) + 0.1
    g = jax.random.normal(kg, (B, T, C), jnp.float32)

    def loss(x, scale, bias):
        return jnp.sum(layer_norm_fused(x, scale, bias, EPS) * g)

    gref = jax.grad(loss, argnums=(0, 1, 2))(x0, scale, bias)
    x = jax.device_put(x0, NamedSharding(mesh, P("data", None, None)))
    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    hlo = gr.lower(x, scale, bias).compile().as_text()
    assert hlo.count("all-gather") == 0
    # dgamma/dbeta partials carry the batch: their sum over B becomes the
    # dp all-reduce
    assert hlo.count("all-reduce") > 0
    for a, b in zip(gr(x, scale, bias), gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
