"""Pallas kernels must partition over the mesh, not replicate.

GSPMD treats pallas_call as an opaque custom call; without the
custom_partitioning declarations in parallel/kernel_partition.py it
all-gathers every dp-sharded operand and runs the kernel replicated on all
devices (observed: 3 batch all-gathers around a dp4-sharded mha_fused).
These tests pin the fix: compiled HLO contains NO all-gather on the kernels'
data path, and sharded values/grads equal the unsharded reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec2forbrain_tpu.ops.pallas_attention import mha_fused
from wav2vec2forbrain_tpu.ops.pallas_gru import gru_recurrence
from wav2vec2forbrain_tpu.ops.pallas_preproc import fused_preproc


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))


def test_attention_partitions_without_allgather(mesh):
    B, H, T, D = 8, 4, 32, 16
    q0, k0, v0, g = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, T, D), jnp.float32)
        for i in range(4)
    )
    seed = jnp.zeros((), jnp.int32)
    ref = mha_fused(q0, k0, v0, seed, 0.125, 0.0, jnp.float32)

    # batch over dp AND heads over tp
    sh = NamedSharding(mesh, P("data", "model", None, None))
    q, k, v = (jax.device_put(a, sh) for a in (q0, k0, v0))

    def loss(q, k, v):
        return jnp.sum(mha_fused(q, k, v, seed, 0.125, 0.0, jnp.float32) * g)

    f = jax.jit(lambda q, k, v: mha_fused(q, k, v, seed, 0.125, 0.0, jnp.float32))
    assert f.lower(q, k, v).compile().as_text().count("all-gather") == 0
    np.testing.assert_allclose(
        np.asarray(f(q, k, v)), np.asarray(ref), atol=1e-6
    )
    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    assert gr.lower(q, k, v).compile().as_text().count("all-gather") == 0
    gref = jax.grad(loss, argnums=(0, 1, 2))(q0, k0, v0)
    for a, b in zip(gr(q, k, v), gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gru_partitions_with_weight_grad_psum(mesh):
    T, B, H = 12, 8, 32
    gi0 = jax.random.normal(jax.random.PRNGKey(0), (T, 2, B, 3 * H))
    w = jax.random.normal(jax.random.PRNGKey(1), (2, H, 3 * H)) * 0.1
    bb = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 3 * H)) * 0.1
    h0 = jax.random.normal(jax.random.PRNGKey(3), (2, B, H)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(4), (T, 2, B, H))

    def loss(gi, w, bb, h0):
        return jnp.sum(gru_recurrence(gi, w, bb, h0) * g)

    gref = jax.grad(loss, argnums=(0, 1, 2, 3))(gi0, w, bb, h0)
    gi = jax.device_put(
        gi0, NamedSharding(mesh, P(None, None, "data", None))
    )
    h0s = jax.device_put(h0, NamedSharding(mesh, P(None, "data", None)))
    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    hlo = gr.lower(gi, w, bb, h0s).compile().as_text()
    assert hlo.count("all-gather") == 0
    # dw/db are batch-summed inside the kernel: the partitioned backward
    # must all-reduce the per-shard partials
    assert hlo.count("all-reduce") > 0
    for a, b in zip(gr(gi, w, bb, h0s), gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gru_dir_variant_partitions_without_allgather(mesh):
    """The per-direction kernel (auto-routed for hidden sizes >= 512) must
    partition like the fused one. dW/db are computed OUTSIDE the kernel by
    an XLA einsum over the sharded batch, so no kernel-level reduce is
    declared — GSPMD inserts the batch-sum all-reduce for the einsum."""
    from wav2vec2forbrain_tpu.ops.pallas_gru import gru_recurrence_dir

    T, B, H = 12, 8, 32
    gi0 = jax.random.normal(jax.random.PRNGKey(0), (T, 2, B, 3 * H))
    w = jax.random.normal(jax.random.PRNGKey(1), (2, H, 3 * H)) * 0.1
    bb = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 3 * H)) * 0.1
    h0 = jax.random.normal(jax.random.PRNGKey(3), (2, B, H)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(4), (T, 2, B, H))

    def loss(gi, w, bb, h0):
        return jnp.sum(gru_recurrence_dir(gi, w, bb, h0) * g)

    gref = jax.grad(loss, argnums=(0, 1, 2, 3))(gi0, w, bb, h0)
    gi = jax.device_put(
        gi0, NamedSharding(mesh, P(None, None, "data", None))
    )
    h0s = jax.device_put(h0, NamedSharding(mesh, P(None, "data", None)))
    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    hlo = gr.lower(gi, w, bb, h0s).compile().as_text()
    assert hlo.count("all-gather") == 0
    assert hlo.count("all-reduce") > 0  # dw/db batch sum over dp shards
    for a, b in zip(gr(gi, w, bb, h0s), gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_preproc_partitions_without_allgather(mesh):
    B, T = 8, 64
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, T, 256))
    dw0 = jnp.eye(256)[None].repeat(24, 0) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (24, 256, 256)
    )
    db0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (24, 1, 256))
    days = jnp.asarray(
        np.random.default_rng(0).integers(0, 24, B), jnp.int32
    )
    ref = fused_preproc(x0, dw0, db0, days, 0.8)
    g = jax.random.normal(jax.random.PRNGKey(3), ref.shape)

    def loss(x, w, b, days, g):
        return jnp.sum(fused_preproc(x, w, b, days, 0.8) * g)

    gref = jax.grad(loss, argnums=(0, 1, 2))(x0, dw0, db0, days, g)
    x = jax.device_put(x0, NamedSharding(mesh, P("data", None, None)))
    dsh = jax.device_put(days, NamedSharding(mesh, P("data")))
    gsh = jax.device_put(g, NamedSharding(mesh, P("data", None, None)))
    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    assert (
        gr.lower(x, dw0, db0, dsh, gsh).compile().as_text().count("all-gather")
        == 0
    )
    for a, b in zip(gr(x, dw0, db0, dsh, gsh), gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_attention_dropout_masks_sharding_invariant(mesh):
    """The dropout hash keys on GLOBAL (row, head) ids carried by index
    vectors that shard with q — so masks are identical whether the batch is
    on one device or dp/tp-sharded (and therefore never repeat across
    shards, which the old program_id-keyed stream did)."""
    B, H, T, D = 8, 4, 32, 16
    q0, k0, v0 = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, T, D), jnp.float32)
        for i in range(3)
    )
    seed = jnp.asarray(1234, jnp.int32)
    ref = mha_fused(q0, k0, v0, seed, 0.125, 0.3, jnp.float32)
    sh = NamedSharding(mesh, P("data", "model", None, None))
    q, k, v = (jax.device_put(a, sh) for a in (q0, k0, v0))
    out = jax.jit(
        lambda q, k, v: mha_fused(q, k, v, seed, 0.125, 0.3, jnp.float32)
    )(q, k, v)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
