"""A/B: XLA LayerNorm vs the fused Pallas kernel at the bench shape.

Chains N dependent LN applications inside one jit (y feeds the next x via a
residual mix, so XLA cannot batch or elide them) and times fwd-only and
fwd+bwd for both implementations; prints ms per LN application.

Run on the TPU:  python tools/ab_layernorm.py [--batch 32] [--frames 89]
                 [--channels 1024] [--dtype bfloat16] [--chain 24]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=89)
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--chain", type=int, default=24)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.wav2vec2 import _layer_norm
    from wav2vec2forbrain_tpu.ops.pallas_layernorm import layer_norm_fused

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, t, c = args.batch, args.frames, args.channels
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c), jnp.float32).astype(dt)
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,), jnp.float32) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32) * 0.1
    eps = 1e-5
    n = args.chain

    def chain(ln):
        def f(x, scale, bias):
            h = x
            for _ in range(n):
                y = ln(h, scale, bias)
                h = h + y * jnp.asarray(0.125, h.dtype)
            return jnp.sum(h.astype(jnp.float32))

        return f

    def xla_ln(x, scale, bias):
        return _layer_norm({"scale": scale, "bias": bias}, x, eps)

    def pl_ln(x, scale, bias):
        return layer_norm_fused(x, scale, bias, eps)

    # parity check first (fwd + grads)
    f_x = chain(xla_ln)
    f_p = chain(pl_ln)
    gx = jax.jit(jax.grad(f_x, argnums=(0, 1, 2)))
    gp = jax.jit(jax.grad(f_p, argnums=(0, 1, 2)))
    vx, vp = jax.jit(f_x)(x, scale, bias), jax.jit(f_p)(x, scale, bias)
    print("fwd rel err:", abs(float(vx) - float(vp)) / max(1e-9, abs(float(vx))))
    for name, a, b_ in zip(("dx", "dscale", "dbias"), gx(x, scale, bias), gp(x, scale, bias)):
        a32 = a.astype(jnp.float32)
        b32 = b_.astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(a32 - b32)) / (jnp.max(jnp.abs(a32)) + 1e-9))
        print(f"{name} max rel err: {rel:.3e}")

    def timeit(fn, *a, iters=20, warmup=3):
        for _ in range(warmup):
            out = fn(*a)
        jax.tree_util.tree_map(lambda v: float(jnp.sum(v)), out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.tree_util.tree_map(lambda v: float(jnp.sum(v)), out)
        return (time.perf_counter() - t0) / iters * 1000.0

    for name, fwd, grad in (("xla", f_x, gx), ("pallas", f_p, gp)):
        fwd_ms = timeit(jax.jit(fwd), x, scale, bias)
        both_ms = timeit(grad, x, scale, bias)
        print(
            f"{name:7s} fwd {fwd_ms / n:7.4f} ms/LN   fwd+bwd {both_ms / n:7.4f} ms/LN"
            f"   (chain totals {fwd_ms:.2f} / {both_ms:.2f} ms)"
        )


if __name__ == "__main__":
    main()
