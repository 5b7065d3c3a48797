"""Decompose the conformer attention block's fwd+bwd time at the bench shape.

The per-block attribution (tools/profile_step.py: attn_x24) lumps RoPE, the
four projections, the layout transposes around the Pallas kernel, and the
kernel itself. This times each part as its own x24 jitted program so the
attention block's gap to its matmul roofline (~0.4 ms/layer at 197 TFLOP/s)
can be attributed before optimizing.

Run on TPU:  python tools/profile_attn_parts.py [--act-dtype bfloat16]
"""

import argparse
import math
import time

import numpy as np


def fence(x):
    import jax.numpy as jnp

    return float(jnp.sum(x)) if hasattr(x, "dtype") else float(x)


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=89, help="encoder frames")
    ap.add_argument("--act-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--layers", type=int, default=24)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.conformer import (
        ConformerEncoderConfig,
        _apply_rotary,
        conformer_self_attention,
        init_conformer_layer_params,
        rotary_cos_sin,
    )
    from wav2vec2forbrain_tpu.models.fc import apply_linear

    cfg = ConformerEncoderConfig.rope_large_960h()
    sd = jnp.bfloat16 if args.act_dtype == "bfloat16" else jnp.float32
    cd = jnp.bfloat16
    b, t, h = args.batch, args.t, cfg.hidden_size
    heads = cfg.num_attention_heads
    head = h // heads
    n = args.layers

    lp = init_conformer_layer_params(jax.random.PRNGKey(3), cfg)
    cos, sin = rotary_cos_sin(t, head, cfg.rotary_embedding_base)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, t, h)), dtype=sd
    )
    rng = jax.random.PRNGKey(1)

    def consume(l, g):
        return l + 1e-30 * sum(
            jnp.sum(v.astype(jnp.float32) ** 2)
            for v in jax.tree_util.tree_leaves(g)
        )

    def reps(fn, wrt="p"):
        """x24 fwd+bwd; wrt='x' for param-free parts (RoPE, layout) so the
        backward differentiates through the op chain instead of being DCE'd
        as constant-wrt-params."""

        @jax.jit
        def run(p, xx, key):
            def loss(arg):
                pp, hh = (arg, xx) if wrt == "p" else (p, arg)
                for _ in range(n):
                    hh = fn(pp, hh, key)
                return jnp.sum(hh * hh)

            l, g = jax.value_and_grad(loss)(p if wrt == "p" else xx)
            return consume(l, g)

        return run

    p = lp["self_attn"]

    parts = {
        # the whole block, Pallas kernel routed per ops/select policy.
        # NB every lambda must READ ITS p ARGUMENT (the grad target) — a
        # closure over lp would make the loss constant wrt p and XLA would
        # DCE the whole backward, silently reporting fwd-only time.
        "attn_full": lambda p, xx, key: conformer_self_attention(
            p, xx, cfg, cos, sin, key, True, cd, use_pallas=True
        )[0],
        # RoPE alone (emit in stream dtype, like the block does)
        "rope": lambda p, xx, key: _apply_rotary(xx, cos, sin, heads),
        # the four projections alone (q/k/v/out, no attention between)
        "projections": lambda p, xx, key: apply_linear(
            p["linear_out"],
            apply_linear(p["linear_q"], xx, cd, out_dtype=sd)
            + apply_linear(p["linear_k"], xx, cd, out_dtype=sd)
            + apply_linear(p["linear_v"], xx, cd, out_dtype=sd),
            cd,
            out_dtype=sd,
        ),
        # layout shuffle alone: the (b,t,heads,head)<->(b,heads,t,head)
        # transposes the kernel's block layout currently forces
        "transposes": lambda p, xx, key: jnp.transpose(
            jnp.transpose(xx.reshape(b, t, heads, head), (0, 2, 1, 3)),
            (0, 2, 1, 3),
        ).reshape(b, t, h)
        * 1.000001,
    }

    for name, fn in parts.items():
        wrt = "x" if name in ("rope", "transposes") else "p"
        print(
            f"{name}_x{n}_fwd_bwd_ms",
            round(timeit(reps(fn, wrt), p, x, rng), 2),
        )

    # the attention core alone on BTH-native operands (no layout ops),
    # each route explicitly: the Pallas kernel and the XLA-BTH dense path
    # the `auto` policy routes to (ops/xla_attention.py)
    from wav2vec2forbrain_tpu.ops.pallas_attention import mha_fused_bth
    from wav2vec2forbrain_tpu.ops.xla_attention import mha_dense_bth

    def core_bench(name, fn):
        @jax.jit
        def run(q, seed):
            def loss(q):
                hh = q
                for _ in range(n):
                    hh = fn(
                        hh, hh, hh, seed, heads, 1.0 / math.sqrt(head),
                        cfg.attention_dropout, cd,
                    )
                return jnp.sum(hh.astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss)(q)
            return l + 1e-30 * jnp.sum(g.astype(jnp.float32) ** 2)

        seed = jnp.asarray(7, jnp.int32)
        print(f"{name}_x{n}_fwd_bwd_ms", round(timeit(run, x, seed), 2))

    core_bench("kernel_only", mha_fused_bth)
    core_bench("dense_bth_only", mha_dense_bth)


if __name__ == "__main__":
    main()
