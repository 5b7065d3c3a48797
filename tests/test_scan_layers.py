"""Scan-over-layers conformer: identical numerics to the unrolled encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    apply_conformer_encoder,
    apply_conformer_encoder_scanned,
    init_conformer_encoder_params,
    init_conformer_state,
    stack_conformer_layers,
    unstack_conformer_layers,
)


def setup():
    cfg = ConformerEncoderConfig.tiny_test(num_hidden_layers=3)
    p = init_conformer_encoder_params(jax.random.PRNGKey(0), cfg)
    # perturb so layers differ
    p = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.default_rng(0).standard_normal(a.shape).astype(a.dtype),
        p,
    )
    s = init_conformer_state(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, cfg.hidden_size))
    return cfg, p, s, x


def test_scanned_matches_unrolled_eval():
    cfg, p, s, x = setup()
    y_ref, s_ref = apply_conformer_encoder(p, s, x, cfg, None, False)
    ps, ss = stack_conformer_layers(p, s)
    y_scan, s_scan = apply_conformer_encoder_scanned(ps, ss, x, cfg, None, False)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_ref), atol=1e-5)
    # batch-norm state unchanged in eval
    for i in range(cfg.num_hidden_layers):
        np.testing.assert_allclose(
            np.asarray(s_scan["layers_stacked"]["batch_norm"]["mean"][i]),
            np.asarray(s_ref["layers"][i]["batch_norm"]["mean"]),
        )


def test_scanned_train_mode_updates_state():
    cfg, p, s, x = setup()
    # dropout 0 so train-mode outputs are comparable; batch-norm uses batch
    # stats and updates running stats
    import dataclasses

    cfg0 = dataclasses.replace(
        cfg,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        conformer_conv_dropout=0.0,
        final_dropout=0.0,
    )
    rng = jax.random.PRNGKey(2)
    y_ref, s_ref = apply_conformer_encoder(p, s, x, cfg0, rng, True)
    ps, ss = stack_conformer_layers(p, s)
    y_scan, s_scan = apply_conformer_encoder_scanned(ps, ss, x, cfg0, rng, True)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_ref), atol=1e-5)
    for i in range(cfg.num_hidden_layers):
        np.testing.assert_allclose(
            np.asarray(s_scan["layers_stacked"]["batch_norm"]["mean"][i]),
            np.asarray(s_ref["layers"][i]["batch_norm"]["mean"]),
            atol=1e-6,
        )


def test_stack_round_trip():
    cfg, p, s, x = setup()
    ps, ss = stack_conformer_layers(p, s)
    p2, s2 = unstack_conformer_layers(ps, ss, cfg.num_hidden_layers)
    a = jax.tree_util.tree_leaves(p)
    b = jax.tree_util.tree_leaves(p2)
    assert all(np.array_equal(np.asarray(x1), np.asarray(x2)) for x1, x2 in zip(a, b))


def test_w2v_scanned_matches_unrolled():
    from wav2vec2forbrain_tpu.models.wav2vec2 import (
        Wav2Vec2EncoderConfig,
        apply_w2v_encoder,
        apply_w2v_encoder_scanned,
        init_w2v_encoder_params,
        stack_w2v_layers,
        unstack_w2v_layers,
    )

    for stable in (False, True):
        cfg = Wav2Vec2EncoderConfig.tiny_test(
            num_hidden_layers=3, do_stable_layer_norm=stable
        )
        p = init_w2v_encoder_params(jax.random.PRNGKey(0), cfg)
        p = jax.tree_util.tree_map(
            lambda a: a
            + 0.01
            * np.random.default_rng(1).standard_normal(a.shape).astype(a.dtype),
            p,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, cfg.hidden_size))
        y_ref = apply_w2v_encoder(p, x, cfg)
        ps = stack_w2v_layers(p)
        y_scan = apply_w2v_encoder_scanned(ps, x, cfg)
        np.testing.assert_allclose(
            np.asarray(y_scan), np.asarray(y_ref), atol=1e-5
        )
        p2 = unstack_w2v_layers(ps, cfg.num_hidden_layers)
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(p)


def test_grads_match():
    cfg, p, s, x = setup()

    def loss_ref(p_):
        y, _ = apply_conformer_encoder(p_, s, x, cfg, None, False)
        return jnp.sum(y**2)

    ps, ss = stack_conformer_layers(p, s)

    def loss_scan(ps_):
        y, _ = apply_conformer_encoder_scanned(ps_, ss, x, cfg, None, False)
        return jnp.sum(y**2)

    g_ref = jax.grad(loss_ref)(p)
    g_scan = jax.grad(loss_scan)(ps)
    g_ref_stacked, _ = stack_conformer_layers(
        {"layers": g_ref["layers"], "layer_norm": g_ref["layer_norm"], "pos_conv": g_ref["pos_conv"]},
        {"layers": [{} for _ in range(cfg.num_hidden_layers)]},
    )
    np.testing.assert_allclose(
        np.asarray(g_scan["layers_stacked"]["ffn1"]["intermediate_dense"]["kernel"]),
        np.asarray(g_ref_stacked["layers_stacked"]["ffn1"]["intermediate_dense"]["kernel"]),
        atol=1e-4,
    )


def test_remat_policies_identical_numerics():
    """remat_policy only changes WHAT the backward saves, never values: the
    scanned encoder's output and grads must be identical across policies."""
    cfg, p, s, x = setup()
    ps, ss = stack_conformer_layers(p, s)

    def loss(ps, policy):
        y, _ = apply_conformer_encoder_scanned(
            ps, ss, x, cfg, jax.random.PRNGKey(7), True,
            remat_policy=policy,
        )
        return jnp.sum(y * y)

    # NB: remat changes what the backward recomputes, which can change XLA
    # fusion/accumulation order — closeness, not bit-equality, is the contract
    ref_l = jax.value_and_grad(lambda q: loss(q, "min"))(ps)
    for policy in ("dots", "dots_nowide", "blocks", "all_but_wide", "none"):
        l2 = jax.value_and_grad(lambda q: loss(q, policy))(ps)
        np.testing.assert_allclose(
            float(ref_l[0]), float(l2[0]), rtol=1e-5
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            ),
            ref_l[1],
            l2[1],
        )
