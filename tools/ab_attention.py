"""A/B the fused Pallas attention vs dense XLA attention at a given shape.

Times conformer_self_attention fwd+bwd stacked x24 (same harness as
tools/profile_step.py's block loop) with use_pallas on/off, and the raw
mha core (no projections) both ways.

Run: python tools/ab_attention.py [--batch 32] [--frames-enc 89]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames-enc", type=int, default=89)
    ap.add_argument("--layers", type=int, default=24)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from tools.profile_step import consume_grads, fence, timeit
    import tools.profile_step as ps

    ps.jax = jax  # timeit/fence use the module global

    from wav2vec2forbrain_tpu.models.conformer import (
        ConformerEncoderConfig,
        conformer_self_attention,
        init_conformer_layer_params,
        rotary_cos_sin,
    )

    cfg = ConformerEncoderConfig.rope_large_960h()
    b, t = args.batch, args.frames_enc
    head = cfg.hidden_size // cfg.num_attention_heads
    cos, sin = rotary_cos_sin(t, head, cfg.rotary_embedding_base)
    lp = init_conformer_layer_params(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, cfg.hidden_size))
    rng = jax.random.PRNGKey(1)
    n = args.layers

    def bench(use_pallas):
        @jax.jit
        def run(p, x, key):
            def loss(p):
                h = x
                for _ in range(n):
                    h = conformer_self_attention(
                        p["self_attn"], h, cfg, cos, sin, key, True,
                        jnp.bfloat16, use_pallas=use_pallas,
                    )[0]
                return jnp.sum(h * h)

            l, g = jax.value_and_grad(loss)(p)
            return consume_grads(l, g)

        return timeit(run, lp, x, rng)

    for name, up in (("pallas", True), ("dense", False)):
        print(f"attn_x{n}_{name}_ms", round(bench(up), 2))


if __name__ == "__main__":
    main()
