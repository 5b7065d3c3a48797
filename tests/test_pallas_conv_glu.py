"""GLU->depthwise fused kernel (ops/pallas_conv_glu.py) parity tests.

Reference semantics = the XLA formulation in models/conformer.py's conv
module: GLU in f32, depthwise 'same' conv in the compute dtype, f32 result.
Values and grads must match in f32 exactly (to accumulation order) and in
bf16 to rounding tolerance; on a dp mesh the kernel must partition without
all-gathers with the depthwise-weight grad psum'd across shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec2forbrain_tpu.ops.pallas_conv_glu import glu_dwconv

B, T, C, KS = 4, 24, 16, 31


def _ref(y, w, cd):
    a, gate = jnp.split(y, 2, axis=-1)
    g = a * jax.nn.sigmoid(gate)
    pad = (KS - 1) // 2
    z = jax.lax.conv_general_dilated(
        g.astype(cd),
        w[:, None, :].astype(cd),
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=C,
    )
    return z.astype(jnp.float32)


@pytest.fixture
def data():
    ky, kw, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    y = jax.random.normal(ky, (B, T, 2 * C), jnp.float32)
    w = jax.random.normal(kw, (KS, C), jnp.float32) * 0.2
    g = jax.random.normal(kg, (B, T, C), jnp.float32)
    return y, w, g


def test_forward_matches_xla_f32(data):
    y, w, _ = data
    np.testing.assert_allclose(
        np.asarray(glu_dwconv(y, w, jnp.float32)),
        np.asarray(_ref(y, w, jnp.float32)),
        atol=1e-5,
    )


def test_forward_matches_xla_bf16(data):
    y, w, _ = data
    np.testing.assert_allclose(
        np.asarray(glu_dwconv(y, w, jnp.bfloat16)),
        np.asarray(_ref(y, w, jnp.bfloat16)),
        atol=5e-2,
        rtol=5e-2,
    )


def test_grads_match_xla(data):
    y, w, g = data

    def loss_pl(y, w):
        return jnp.sum(glu_dwconv(y, w, jnp.float32) * g)

    def loss_ref(y, w):
        return jnp.sum(_ref(y, w, jnp.float32) * g)

    dy_p, dw_p = jax.grad(loss_pl, argnums=(0, 1))(y, w)
    dy_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(y, w)
    np.testing.assert_allclose(np.asarray(dy_p), np.asarray(dy_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r), atol=1e-4)


def test_conv_module_pallas_path_matches(data):
    """models/conformer.py conv module: use_pallas=True == False (f32)."""
    from wav2vec2forbrain_tpu.models.conformer import (
        ConformerEncoderConfig,
        conformer_conv_module,
        init_conformer_layer_params,
        init_conformer_state,
    )

    cfg = ConformerEncoderConfig.tiny_test(conformer_conv_dropout=0.0)
    p = init_conformer_layer_params(jax.random.PRNGKey(1), cfg)["conv_module"]
    st = init_conformer_state(cfg)["layers"][0]
    x = jax.random.normal(
        jax.random.PRNGKey(2), (2, 16, cfg.hidden_size), jnp.float32
    )
    y_ref, st_ref, _ = conformer_conv_module(
        p, st, x, cfg, None, True, jnp.float32, use_pallas=False
    )
    y_pl, st_pl, _ = conformer_conv_module(
        p, st, x, cfg, None, True, jnp.float32, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_pl["batch_norm"]["mean"]),
        np.asarray(st_ref["batch_norm"]["mean"]),
        atol=1e-6,
    )


def test_partitions_without_allgather(data):
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    y, w, g = data
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", None, None)))
    gs = jax.device_put(g, NamedSharding(mesh, P("data", None, None)))

    def loss(y, w):
        return jnp.sum(glu_dwconv(y, w, jnp.float32) * gs)

    gr = jax.jit(jax.grad(loss, argnums=(0, 1)))
    hlo = gr.lower(ys, w).compile().as_text()
    assert hlo.count("all-gather") == 0
    # dw is batch-summed outside the kernel -> dp shards psum it
    assert hlo.count("all-reduce") > 0
    dy_s, dw_s = gr(ys, w)
    dy_r, dw_r = jax.grad(loss, argnums=(0, 1))(y, w)
    np.testing.assert_allclose(np.asarray(dy_s), np.asarray(dy_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_s), np.asarray(dw_r), atol=1e-4)
