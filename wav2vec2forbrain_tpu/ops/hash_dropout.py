"""Stateless (recomputable) dropout — an XLA formulation, not a kernel.

The default dropout (jax.random.bernoulli + where) materializes its keep
mask as a pred residual: the backward pass needs the same mask, so XLA
writes the (B, T, C) mask to HBM in the forward and reads it back in the
backward — plus an rng-bit-generator op per site. At the bench shape the
op trace attributes ~5 ms/step to these mask tensors across the ~7 dropout
sites x 24 layers of the conformer train step.

Here the mask is a pure function of (seed, element coordinates): a
murmur3-finalizer hash over broadcasted iotas (the same construction as
ops/pallas_attention.py's in-kernel dropout, kept in plain jnp so XLA can
fuse it into the surrounding elementwise work). The custom VJP saves ONLY
the int32 seed and recomputes the mask in the backward —
  dx = g * mask * 1/keep == hash_dropout(g, seed, rate)
— so nothing mask-shaped ever round-trips HBM and no TPU PRNG state is
threaded. Under GSPMD the iotas carry GLOBAL coordinates, so masks are
identical however the batch is sharded.

The keep/drop STREAM differs from jax.random's threefry/rbg — irrelevant
for parity; the reference's cuRAND streams differ from both (same argument
as the fused attention kernel's dropout).
"""

import functools

import jax
import jax.numpy as jnp


def _uniform(shape, seed):
    """Per-element uniform in [0, 1) from a murmur3-finalizer hash of the
    element's (global) coordinates, mixed with the traced int32 seed."""
    mixers = (
        jnp.uint32(0x165667B1),
        jnp.uint32(0x9E3779B9),
        jnp.uint32(0x85EBCA6B),
        jnp.uint32(0xC2B2AE35),
    )
    x = seed.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
    for d in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
        x = x + i * mixers[d % len(mixers)]
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # 24 high bits -> exact f32 uniform (int32 bitcast: value < 2^24)
    bits24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
    return bits24.astype(jnp.float32) * (1.0 / (1 << 24))


def _apply(x, seed, rate):
    keep_prob = 1.0 - rate
    u = _uniform(x.shape, seed)
    scaled = x * jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(u < keep_prob, scaled, jnp.zeros((), x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_dropout(x, seed, rate):
    """x: any-shape float array; seed: int32 scalar; rate in (0, 1).
    Returns x with elements dropped (and survivors scaled by 1/keep) in
    x's dtype. The backward recomputes the mask from the seed."""
    return _apply(x, seed, rate)


def _vjp_fwd(x, seed, rate):
    return _apply(x, seed, rate), seed


def _vjp_bwd(rate, seed, g):
    # identical mask by construction: same seed, same coordinates
    return _apply(g, seed, rate), None


hash_dropout.defvjp(_vjp_fwd, _vjp_bwd)


def dropout_with_rng(rng, x, rate, train):
    """Drop-in body for the models' _dropout sites: one rng split (stream
    bookkeeping identical to the jax.random path), hash mask inside."""
    if not train or rate <= 0.0:
        return rng, x
    rng, sub = jax.random.split(rng)
    seed = jax.random.randint(
        sub, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )
    return rng, hash_dropout(x, seed, rate)
