"""Stateless hash dropout (ops/hash_dropout.py).

Checks: drop statistics match the rate, survivor scaling matches the
jax.random path's semantics, the backward reuses the forward's exact mask
(grad is the mask times 1/keep), dtype is preserved, and masks are
invariant to dp sharding (global iota coordinates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec2forbrain_tpu.ops.hash_dropout import dropout_with_rng, hash_dropout


def test_drop_rate_and_scaling():
    x = jnp.ones((64, 97, 128), jnp.float32)
    seed = jnp.int32(1234)
    rate = 0.3
    y = np.asarray(hash_dropout(x, seed, rate))
    kept = y != 0.0
    assert abs(kept.mean() - 0.7) < 0.01
    np.testing.assert_allclose(y[kept], 1.0 / 0.7, rtol=1e-6)


def test_backward_mask_identical_to_forward():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 33, 64), jnp.float32)
    seed = jnp.int32(7)
    rate = 0.5
    y = np.asarray(hash_dropout(x, seed, rate))
    g = np.asarray(jax.grad(lambda x: jnp.sum(hash_dropout(x, seed, rate)))(x))
    # grad of sum == mask/keep: zero exactly where fwd dropped, 2.0 elsewhere
    np.testing.assert_array_equal(g == 0.0, y == 0.0)
    np.testing.assert_allclose(g[g != 0.0], 2.0, rtol=1e-6)


def test_dtype_preserved_and_seed_varies():
    x = jnp.ones((4, 8, 32), jnp.bfloat16)
    a = hash_dropout(x, jnp.int32(1), 0.4)
    b = hash_dropout(x, jnp.int32(2), 0.4)
    assert a.dtype == jnp.bfloat16
    assert not np.array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_rng_threading_matches_dropout_contract():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 4, 8), jnp.float32)
    rng2, y = dropout_with_rng(rng, x, 0.5, True)
    assert rng2.shape == rng.shape and not np.array_equal(
        np.asarray(rng2), np.asarray(rng)
    )
    rng3, y_eval = dropout_with_rng(rng, x, 0.5, False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    assert np.array_equal(np.asarray(rng3), np.asarray(rng))


def test_mask_invariant_to_dp_sharding():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (8, 16, 128), jnp.float32)
    seed = jnp.int32(99)
    ref = np.asarray(hash_dropout(x0, seed, 0.25))
    x = jax.device_put(x0, NamedSharding(mesh, P("data", None, None)))
    got = np.asarray(jax.jit(lambda x: hash_dropout(x, seed, 0.25))(x))
    np.testing.assert_array_equal(got, ref)
