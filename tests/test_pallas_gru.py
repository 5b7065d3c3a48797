"""Pallas GRU recurrence vs the lax.scan reference (values + all grads).

Interpreter mode on CPU: same kernel code path as TPU modulo Mosaic lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec2forbrain_tpu.models.gru import (
    apply_gru,
    init_gru_params,
)
from wav2vec2forbrain_tpu.ops.pallas_gru import bigru_layer_pallas

B, T, IN, H = 3, 11, 20, 8


@pytest.fixture(scope="module")
def setup():
    params = init_gru_params(jax.random.PRNGKey(0), IN, H, 1, True, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN), jnp.float32)
    return params, x


def scan_layer(params, x):
    return apply_gru(params, x, H, 1, True)


def pallas_layer(params, x, per_direction=False):
    dirs = params["layers"][0]["directions"]
    h0 = jnp.zeros((2, B, H), jnp.float32)
    return bigru_layer_pallas(dirs, x, h0, per_direction=per_direction)


@pytest.mark.parametrize("per_direction", [False, True])
def test_forward_matches_scan(setup, per_direction):
    params, x = setup
    ref = np.asarray(scan_layer(params, x))
    pal = np.asarray(pallas_layer(params, x, per_direction))
    np.testing.assert_allclose(pal, ref, atol=1e-5)


@pytest.mark.parametrize("per_direction", [False, True])
def test_grads_match_scan(setup, per_direction):
    params, x = setup
    w_out = jax.random.normal(jax.random.PRNGKey(2), (B, T, 2 * H))

    def loss_ref(p, xx):
        return jnp.sum(scan_layer(p, xx) * w_out)

    def loss_pal(p, xx):
        return jnp.sum(pallas_layer(p, xx, per_direction) * w_out)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_pal, gx_pal = jax.grad(loss_pal, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref), atol=1e-4)
    for di in range(2):
        for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(gp_pal["layers"][0]["directions"][di][key]),
                np.asarray(gp_ref["layers"][0]["directions"][di][key]),
                atol=1e-4,
                err_msg=f"dir {di} {key}",
            )


@pytest.mark.parametrize("per_direction", [False, True])
def test_t1_edge(setup, per_direction):
    params, _ = setup
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, IN), jnp.float32)
    ref = np.asarray(scan_layer(params, x))
    pal = np.asarray(pallas_layer(params, x, per_direction))
    np.testing.assert_allclose(pal, ref, atol=1e-5)


def test_large_hidden_routes_to_per_direction_kernel(monkeypatch):
    """apply_gru with a large hidden size + use_pallas must take the
    per-direction kernel (fused would blow VMEM) and match the scan path,
    values and grads."""
    import wav2vec2forbrain_tpu.ops.pallas_gru as pg

    big_h, b, t, in_sz = 256, 2, 7, 12  # big enough to fail the fused gate
    monkeypatch.setattr(
        "wav2vec2forbrain_tpu.models.gru._pallas_gru_vmem_bytes",
        lambda bb, hh: 10**12,
    )
    calls = []
    orig = pg.bigru_layer_pallas

    def spy(dirs, x, h0, compute_dtype=None, per_direction=False):
        calls.append(per_direction)
        return orig(dirs, x, h0, compute_dtype, per_direction)

    monkeypatch.setattr(pg, "bigru_layer_pallas", spy)
    params = init_gru_params(jax.random.PRNGKey(5), in_sz, big_h, 1, True, True)
    x = jax.random.normal(jax.random.PRNGKey(6), (b, t, in_sz), jnp.float32)
    ref = apply_gru(params, x, big_h, 1, True)
    pal = apply_gru(params, x, big_h, 1, True, use_pallas=True)
    assert calls == [True]
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)

    w_out = jax.random.normal(jax.random.PRNGKey(7), (b, t, 2 * big_h))
    g_ref = jax.grad(lambda p: jnp.sum(apply_gru(p, x, big_h, 1, True) * w_out))(params)
    g_pal = jax.grad(
        lambda p: jnp.sum(apply_gru(p, x, big_h, 1, True, use_pallas=True) * w_out)
    )(params)
    for di in range(2):
        for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(g_pal["layers"][0]["directions"][di][key]),
                np.asarray(g_ref["layers"][0]["directions"][di][key]),
                atol=1e-4,
                err_msg=f"dir {di} {key}",
            )
