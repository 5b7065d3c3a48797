"""Attribute the conformer conv-module's step cost on real hardware.

The conv module is the largest fwd+bwd block of the headline step
(tools/profile_step.py: 13.0 ms across 24 layers vs attention 12.0, FFN
10.4), yet its matmuls (pw1 C->2C, pw2 C->C) account for only ~0.27 ms/layer
of MXU time — the rest is depthwise conv lowering, BatchNorm reduction
passes, elementwise chains and layout transforms. This tool times fwd+bwd of
ablated variants at the headline shape to locate the overhead before
committing to a Pallas fusion scope.

Usage (on the TPU host, idle):  python tools/profile_conv_module.py
"""

import functools
import time

import numpy as np

from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

configure_jax()

import jax
import jax.numpy as jnp

from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    conformer_conv_module,
    init_conformer_layer_params,
    init_conformer_state,
)

B, T, C = 32, 88, 1024
LAYERS = 24  # scale per-layer numbers to the step's 24 layers


def timed(fn, *args, steps=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: None, out
    )
    # scalar fetch is the only reliable fence through the axon tunnel
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    cfg = ConformerEncoderConfig.rope_large_960h()
    p_all = init_conformer_layer_params(jax.random.PRNGKey(0), cfg)
    p = p_all["conv_module"]
    st = dict(init_conformer_state(cfg)["layers"][0])
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (B, T, C), jnp.float32)
    cd = jnp.bfloat16

    drop_key = jax.random.PRNGKey(3)

    def run_full(p, st, x):
        y, new_st, _ = conformer_conv_module(
            p, st, x, cfg, drop_key, True, cd
        )
        return y, new_st

    def make_fwdbwd(fn):
        def loss(p, x):
            y, new_st = fn(p, st, x)
            return jnp.sum(y * g), new_st

        grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1), has_aux=True))

        def step(p, x):
            (val, new_st), grads = grad_fn(p, x)
            # return a grad reduction so backward isn't DCE'd
            return val + sum(
                jnp.sum(l) for l in jax.tree_util.tree_leaves(grads)
            )

        return jax.jit(step)

    # ablations: replace pieces with cheap identities
    def run_no_dw(p, st, x):
        import wav2vec2forbrain_tpu.models.conformer as cm

        y = cm._layer_norm(p["layer_norm"], x, cfg.layer_norm_eps)
        y = jnp.dot(y.astype(cd), p["pointwise_conv1"]["kernel"].astype(cd),
                    preferred_element_type=jnp.float32)
        a, b_half = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b_half)
        y = y.astype(jnp.float32)  # skip depthwise conv entirely
        y, new_bn = cm._batch_norm(p["batch_norm"], st["batch_norm"], y, cfg, True)
        y = jax.nn.silu(y)
        y = jnp.dot(y.astype(cd), p["pointwise_conv2"]["kernel"].astype(cd),
                    preferred_element_type=jnp.float32)
        return y, {"batch_norm": new_bn}

    def run_no_bn(p, st, x):
        import wav2vec2forbrain_tpu.models.conformer as cm

        y = cm._layer_norm(p["layer_norm"], x, cfg.layer_norm_eps)
        y = jnp.dot(y.astype(cd), p["pointwise_conv1"]["kernel"].astype(cd),
                    preferred_element_type=jnp.float32)
        a, b_half = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b_half)
        ks = cfg.conv_depthwise_kernel_size
        pad = (ks - 1) // 2
        y = jax.lax.conv_general_dilated(
            y.astype(cd), p["depthwise_conv"]["kernel"].astype(cd),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=cfg.hidden_size,
        ).astype(jnp.float32)
        y = jax.nn.silu(y)
        y = jnp.dot(y.astype(cd), p["pointwise_conv2"]["kernel"].astype(cd),
                    preferred_element_type=jnp.float32)
        return y, {"batch_norm": dict(st["batch_norm"])}

    def run_matmuls_only(p, st, x):
        y = jnp.dot(x.astype(cd), p["pointwise_conv1"]["kernel"].astype(cd),
                    preferred_element_type=jnp.float32)
        y = y[..., : C]
        y = jnp.dot(y.astype(cd), p["pointwise_conv2"]["kernel"].astype(cd),
                    preferred_element_type=jnp.float32)
        return y, {"batch_norm": dict(st["batch_norm"])}

    def run_full_pallas(p, st, x):
        y, new_st, _ = conformer_conv_module(
            p, st, x, cfg, drop_key, True, cd, use_pallas=True
        )
        return y, new_st

    variants = [
        ("full", run_full),
        ("full_pallas", run_full_pallas),
        ("no_depthwise", run_no_dw),
        ("no_batchnorm", run_no_bn),
        ("matmuls_only", run_matmuls_only),
    ]
    results = {}
    for name, fn in variants:
        step = make_fwdbwd(fn)
        ms = timed(step, p, x) * 1e3
        results[name] = ms
        print(
            f"{name:16s} fwd+bwd {ms:7.3f} ms/layer  "
            f"x{LAYERS} = {ms * LAYERS:6.2f} ms/step"
        )
    print(
        f"\ndepthwise cost ~{(results['full'] - results['no_depthwise']) * LAYERS:.2f} ms/step, "
        f"batchnorm cost ~{(results['full'] - results['no_batchnorm']) * LAYERS:.2f} ms/step, "
        f"non-matmul overhead ~{(results['full'] - results['matmuls_only']) * LAYERS:.2f} ms/step"
    )


if __name__ == "__main__":
    main()
