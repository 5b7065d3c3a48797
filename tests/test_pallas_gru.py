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


def pallas_layer(params, x):
    dirs = params["layers"][0]["directions"]
    h0 = jnp.zeros((2, B, H), jnp.float32)
    return bigru_layer_pallas(dirs, x, h0)


def test_forward_matches_scan(setup):
    params, x = setup
    ref = np.asarray(scan_layer(params, x))
    pal = np.asarray(pallas_layer(params, x))
    np.testing.assert_allclose(pal, ref, atol=1e-5)


def test_grads_match_scan(setup):
    params, x = setup
    w_out = jax.random.normal(jax.random.PRNGKey(2), (B, T, 2 * H))

    def loss_ref(p, xx):
        return jnp.sum(scan_layer(p, xx) * w_out)

    def loss_pal(p, xx):
        return jnp.sum(pallas_layer(p, xx) * w_out)

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


def test_t1_edge(setup):
    params, _ = setup
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, IN), jnp.float32)
    ref = np.asarray(scan_layer(params, x))
    pal = np.asarray(pallas_layer(params, x))
    np.testing.assert_allclose(pal, ref, atol=1e-5)
