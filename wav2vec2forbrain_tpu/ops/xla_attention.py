"""Dense multi-head attention on BTH operands — the measured-fastest path.

XLA's batched GEMM emitter beats the fused Pallas kernel at the short
encoder sequences this framework runs (T = 25-170 frames after the 4x
unfold, SURVEY.md §2.4): the kernel must issue thousands of tiny
(T, D)x(D, T) MXU dots per step (3584 at the bench shape) and pays fixed
per-dot overhead on each, while XLA pipelines the whole (B·H)-batched
contraction. Measured on v5e at the bench shape (B=32, T=89, H=16, D=64,
bf16, x24 layers fwd+bwd): XLA-BTH 7.29 ms vs Pallas 14.37 ms — so the
`auto` kernel policy routes attention here (ops/select.py) and the Pallas
kernel (ops/pallas_attention.py) stays selectable for explicit A/B and for
regimes with longer sequences.

Numerics and streams match the kernel exactly:
  - scores/ctx contract in compute_dtype with f32 accumulation, softmax in
    f32, ctx emitted in the activation-stream dtype — same dtypes and
    accumulate semantics as the kernel's dot_generals;
  - train-mode dropout uses the SAME stateless murmur3-finalizer hash
    keyed on (seed, global batch row, global head, q row, k col) — masks
    are bit-identical to the kernel's (`tests/test_pallas_attention.py::
    test_dense_bth_matches_kernel_train_mode`), so switching routes never
    changes a training trajectory beyond float reduction order.

The (B,T,H·D)->(B,T,H,D) head split is a free reshape (no transpose); the
einsum batch dims carry the head axis, and GSPMD shards the batched dots
natively over dp/tp meshes (no custom_partitioning needed on this route).

Reference context: the reference runs HF eager attention
(torch.nn.functional.softmax chain, materialized probs) — see
/root/reference/src/model/b2tmodel.py usage of transformers' Wav2Vec2
attention; this module is its TPU-native dense equivalent.
"""

import jax
import jax.numpy as jnp


def _murmur_finalize(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_keep_mask(seed, shape_bhqk, keep_prob):
    """(B, H, Tq, Tk) f32 0/1 keep mask, bit-identical to the Pallas
    kernel's `_keep_mask`/`_mix` streams (ops/pallas_attention.py): the
    per-(batch row, head) mix scalar and the murmur3-finalizer hash over
    (q row, k col) use the same constants, so fwd/bwd and kernel/dense
    routes all see the same mask. Iotas are GLOBAL under GSPMD, so the
    mask is sharding-invariant like the kernel's global-id vectors."""
    b_ = jax.lax.broadcasted_iota(jnp.uint32, shape_bhqk, 0)
    h_ = jax.lax.broadcasted_iota(jnp.uint32, shape_bhqk, 1)
    r_ = jax.lax.broadcasted_iota(jnp.uint32, shape_bhqk, 2)
    c_ = jax.lax.broadcasted_iota(jnp.uint32, shape_bhqk, 3)
    mix = (
        seed.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
        + b_ * jnp.uint32(0x165667B1)
        + h_ * jnp.uint32(0x9E3779B9)
    )
    x = _murmur_finalize(
        mix + r_ * jnp.uint32(0x9E3779B9) + c_ * jnp.uint32(0x85EBCA6B)
    )
    # 24 high bits -> exact-f32 uniform in [0, 1), same as the kernel
    u = (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u < keep_prob).astype(jnp.float32)


def mha_dense_bth(q, k, v, seed, num_heads, scale, dropout_rate,
                  compute_dtype):
    """q/k/v: (B, T, H·D) -> ctx (B, T, H·D) in q.dtype (f32 accumulate).

    seed: int32 scalar array, used only when dropout_rate > 0. The
    attention core (scores -> softmax -> dropout -> ctx) is wrapped in
    jax.checkpoint so the backward recomputes probs from q/k/v instead of
    saving the (B, H, T, T) residuals — the same memory shape as the
    Pallas kernel's recompute-backward, and ~free at these sequence
    lengths (the recomputed dots are the cheap ones; the projections
    around this core dominate)."""
    b, t, hd = q.shape
    d = hd // num_heads
    cd = compute_dtype

    @jax.checkpoint
    def core(q, k, v):
        q4 = q.reshape(b, t, num_heads, d)
        k4 = k.reshape(b, t, num_heads, d)
        v4 = v.reshape(b, t, num_heads, d)
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q4.astype(cd), k4.astype(cd),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jax.nn.softmax(s, axis=-1)
        if dropout_rate > 0.0:
            p = p * hash_keep_mask(seed, p.shape, 1.0 - dropout_rate) * (
                1.0 / (1.0 - dropout_rate)
            )
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(cd), v4.astype(cd),
            preferred_element_type=jnp.float32,
        )
        return ctx.reshape(b, t, hd).astype(q.dtype)

    return core(q, k, v)
