"""Pallas kernels × mesh parallelism: the fused kernels must compose with
dp/tp sharding (interpret mode on the virtual CPU mesh), giving the same
numbers as the jnp paths on identically sharded inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wav2vec2forbrain_tpu.models.gru import apply_gru, init_gru_params
from wav2vec2forbrain_tpu.models.preprocessing import (
    GAUSS_KERNEL_SIZE,
    apply_preproc,
    gaussian_kernel,
    init_preproc_params,
)
from wav2vec2forbrain_tpu.ops.pallas_gru import bigru_layer_pallas
from wav2vec2forbrain_tpu.ops.pallas_preproc import apply_preproc_pallas
from wav2vec2forbrain_tpu.parallel.mesh import batch_sharding, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


@pytest.fixture(scope="module")
def dp_mesh():
    return make_mesh(data_parallel=4, model_parallel=1, devices=jax.devices()[:4])


def _shard_batch(mesh, *arrays):
    s = batch_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)


def test_pallas_preproc_under_dp_mesh(dp_mesh):
    rng = np.random.default_rng(0)
    b, t = 8, 96
    x = jnp.asarray(rng.standard_normal((b, t, 256)).astype(np.float32))
    day_idxs = jnp.asarray(rng.integers(0, 24, size=(b,)).astype(np.int32))
    lens = jnp.asarray(np.full((b,), t, np.int32))
    params = init_preproc_params(jax.random.PRNGKey(0), None)
    # non-identity day weights so the scalar-prefetch gather is exercised
    params = dict(params)
    params["day_weights"] = params["day_weights"] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), params["day_weights"].shape
    )

    sk = gaussian_kernel(GAUSS_KERNEL_SIZE, 0.3)
    ref, ref_lens = jax.jit(
        lambda p, xx, d, l: apply_preproc(p, xx, d, l, sk, 32, 4)
    )(params, x, day_idxs, lens)

    xs, ds, ls = _shard_batch(dp_mesh, x, day_idxs, lens)
    out, out_lens = jax.jit(
        lambda p, xx, d, l: apply_preproc_pallas(p, xx, d, l, 0.3, 32, 4)
    )(params, xs, ds, ls)

    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # the result keeps the batch sharded over 'data'
    assert "data" in str(out.sharding)


def test_pallas_gru_under_dp_mesh(dp_mesh):
    b, t, insz, h = 8, 10, 16, 8
    params = init_gru_params(jax.random.PRNGKey(0), insz, h, 1, True, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, insz), jnp.float32)

    ref = jax.jit(lambda p, xx: apply_gru(p, xx, h, 1, True))(params, x)

    (xs,) = _shard_batch(dp_mesh, x)
    dirs = params["layers"][0]["directions"]
    h0 = jnp.zeros((2, b, h), jnp.float32)
    out = jax.jit(bigru_layer_pallas)(dirs, xs, h0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_gru_grads_under_dp_mesh(dp_mesh):
    """The custom VJP composes with sharded batches: dp-sharded gradient of
    the Pallas path equals the scan path's."""
    b, t, insz, h = 8, 9, 12, 8
    params = init_gru_params(jax.random.PRNGKey(0), insz, h, 1, True, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, insz), jnp.float32)
    (xs,) = _shard_batch(dp_mesh, x)

    def loss_scan(p, xx):
        return jnp.sum(apply_gru(p, xx, h, 1, True) ** 2)

    def loss_pal(p, xx):
        dirs = p["layers"][0]["directions"]
        h0 = jnp.zeros((2, b, h), jnp.float32)
        return jnp.sum(bigru_layer_pallas(dirs, xx, h0) ** 2)

    g_ref = jax.jit(jax.grad(loss_scan))(params, x)
    g_pal = jax.jit(jax.grad(loss_pal))(params, xs)
    ref_dirs = g_ref["layers"][0]["directions"]
    pal_dirs = g_pal["layers"][0]["directions"]
    for di in range(2):
        for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
            np.testing.assert_allclose(
                np.asarray(pal_dirs[di][key]),
                np.asarray(ref_dirs[di][key]),
                atol=1e-4,
                err_msg=f"dir{di}.{key}",
            )
