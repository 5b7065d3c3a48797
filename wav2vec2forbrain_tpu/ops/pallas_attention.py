"""Fused multi-head attention Pallas kernel (short-sequence regime).

The encoder sequences here are tiny (25-170 frames after the 4x unfold
contraction, SURVEY.md §2.4), so the whole (T, T) score matrix of one
(batch, head) pair fits comfortably in VMEM — no online/flash softmax
streaming is needed. What the fused kernel buys over the XLA dense path
(models/conformer.py::conformer_self_attention, models/wav2vec2.py) is HBM
traffic: scores, probs, and the train-time dropout mask are never
materialized off-chip (~170 MB/layer round trips at the headline shape), and
the backward pass recomputes probs from q/k instead of saving them — which
also drops the (L, B, H, T, T) probs residual (0.4-1.6 GB at bs 32) from
training memory.

Forward, per grid program (one batch element, all heads looped):
    scores = (q @ k^T) * scale          f32 accumulate
    probs  = softmax(scores, -1)        f32
    probs  = dropout(probs)             train only, stateless hash mask
    ctx    = probs_cd @ v               f32 accumulate
Backward (custom VJP) recomputes scores/probs — and the dropout mask, which
is a pure function of (seed, batch, head, row, col) (a murmur3-finalizer
hash over iotas), so fwd and bwd masks are identical by construction and
the kernel needs no TPU PRNG state (it also runs bit-identically in
interpret mode on CPU):
    dv = probs^T @ g
    dp = g @ v^T                        (masked/scaled through dropout)
    ds = probs * (dp - sum(dp * probs, -1))
    dq = ds @ k * scale ; dk = ds^T @ q * scale

Numerics match the dense path op-for-op (same dtypes, same accumulate
order); the train-mode dropout STREAM differs from jax.random — irrelevant
for parity, the reference's cuRAND streams differ from both.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _keep_mask(shape, keep_prob, mix):
    """Keep mask (f32 0/1): murmur3-finalizer hash of (mix, row, col).

    mix is a uint32 scalar folding in (seed, batch program, head); rows and
    cols come from iotas, so the mask is stateless and exactly recomputable
    in the backward pass."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = mix + r * jnp.uint32(0x9E3779B9) + c * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # 24 high bits -> uniform in [0, 1) with exact f32 representation.
    # Mosaic has no uint32->f32 cast; bitcast to int32 first (value < 2^24,
    # so the reinterpretation is exact).
    bits24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    return (u < keep_prob).astype(jnp.float32)


def _mix(seed_ref, rows_ref, heads_ref, r, h):
    """Per-(GLOBAL batch row, GLOBAL head) hash stream selector.

    rows/heads carry global indices (they shard along with q), so dropout
    masks are identical whether the batch runs on one chip or dp/tp-sharded
    across a mesh — and never repeat across shards."""
    row = rows_ref[r].astype(jnp.uint32)
    head = heads_ref[h].astype(jnp.uint32)
    return (
        seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
        + row * jnp.uint32(0x165667B1)
        + head * jnp.uint32(0x9E3779B9 & 0xFFFFFFFF)
    )


def _probs(q, k, scale, compute_dtype):
    s = jax.lax.dot_general(
        q.astype(compute_dtype),
        k.astype(compute_dtype),
        (((1,), (1,)), ((), ())),  # (T, D) x (T, D)^T -> (T, T)
        preferred_element_type=jnp.float32,
    ) * scale
    return jax.nn.softmax(s, axis=-1)


def _fwd_kernel(
    seed_ref, rows_ref, heads_ref, q_ref, k_ref, v_ref, o_ref,
    *, group, heads, scale, keep_prob, compute_dtype,
):
    """Blocks: q/k/v/o (group, heads, T, D) — `group` batch elements per
    program (amortizes per-program grid overhead; results are independent
    of `group` since the dropout hash keys on GLOBAL ids)."""
    for i in range(group):
        for h in range(heads):  # static unroll: 2-D matmuls only
            p = _probs(q_ref[i, h], k_ref[i, h], scale, compute_dtype)
            if keep_prob < 1.0:
                row = pl.program_id(0) * group + i
                mix = _mix(seed_ref, rows_ref, heads_ref, row, h)
                p = p * _keep_mask(p.shape, keep_prob, mix) * (
                    1.0 / keep_prob
                )
            o_ref[i, h] = jax.lax.dot_general(
                p.astype(compute_dtype),
                v_ref[i, h].astype(compute_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, rows_ref, heads_ref, q_ref, k_ref, v_ref, g_ref,
    dq_ref, dk_ref, dv_ref,
    *, group, heads, scale, keep_prob, compute_dtype,
):
    cd = compute_dtype
    for i in range(group):
        for h in range(heads):
            q = q_ref[i, h]
            k = k_ref[i, h]
            v = v_ref[i, h]
            g = g_ref[i, h]
            p = _probs(q, k, scale, cd)  # pre-dropout probs, f32
            if keep_prob < 1.0:
                # same (seed, global row, global head) stream as forward
                row = pl.program_id(0) * group + i
                mix = _mix(seed_ref, rows_ref, heads_ref, row, h)
                mask = _keep_mask(p.shape, keep_prob, mix) * (
                    1.0 / keep_prob
                )
                pd = p * mask  # dropped probs (what fwd used for ctx)
            else:
                pd = p
            # dv = pd^T @ g
            dv_ref[i, h] = jax.lax.dot_general(
                pd.astype(cd), g.astype(cd),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            # dpd = g @ v^T ; through dropout: dp = dpd * mask
            dp = jax.lax.dot_general(
                g.astype(cd), v.astype(cd),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if keep_prob < 1.0:
                dp = dp * mask
            # softmax VJP on pre-dropout probs
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq_ref[i, h] = (jax.lax.dot_general(
                ds.astype(cd), k.astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(dq_ref.dtype)
            dk_ref[i, h] = (jax.lax.dot_general(
                ds.astype(cd), q.astype(cd),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(dk_ref.dtype)


# Budget for ONE pipeline stage's operand/result blocks. The scoped-VMEM
# stack limit is 16M and Pallas double-buffers every gridded block (2x), so
# the budget must stay well under half of that — 10M overflowed the stack
# (22.5M scoped) for the 3-output bwd kernel when the fwd kernel is
# recomputed in the same checkpoint region of a scanned+remat'd encoder
# layer at (b=64, h=12, t=89, d=64). Grouping is perf-neutral at bench
# shapes (grid switch overhead is not a bottleneck), so a small budget
# costs nothing.
_VMEM_BLOCK_BUDGET = 5 * 1024 * 1024


def _pick_group(b, h, t, d, n_arrays, itemsize):
    """Largest divisor of b whose operand blocks fit the VMEM budget.

    itemsize is the kernel's HBM block dtype (the q/k/v stream dtype —
    outputs are emitted in the same dtype); a bf16 stream halves the block
    bytes so groups double for free."""
    per_elem = n_arrays * h * t * d * itemsize
    g = 1
    for cand in range(2, b + 1):
        if b % cand == 0 and cand * per_elem <= _VMEM_BLOCK_BUDGET:
            g = cand
    return g


def _call(kern_fn, n_in, n_out, bhtd, seed, rows, head_ids, *args,
          interpret, out_dtype=jnp.float32, **kern_kw):
    b, h, t, d = bhtd
    itemsize = jnp.dtype(out_dtype).itemsize
    group = _pick_group(b, h, t, d, n_in + n_out + 1, itemsize)
    kern = functools.partial(kern_fn, group=group, **kern_kw)
    block = pl.BlockSpec(
        (group, h, t, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((b, h, t, d), out_dtype)] * n_out
    out_specs = [block] * n_out
    if n_out == 1:
        out_shape = out_shape[0]
        out_specs = out_specs[0]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=(b // group,),
        in_specs=[smem, smem, smem] + [block] * n_in,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, rows, head_ids, *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def mha_fused(q, k, v, seed, scale, dropout_rate, compute_dtype):
    """q/k/v: (B, H, T, D) -> ctx (B, H, T, D) in q.dtype (f32 accumulate).

    seed: int32 scalar array; used only when dropout_rate > 0 (train mode).
    Pass dropout_rate=0.0 for eval."""
    return _fwd_partitioned(scale, dropout_rate, compute_dtype)(
        q, k, v, seed.reshape(1).astype(jnp.int32), *_ids(q)
    )


def _ids(q):
    """Global (row, head) index vectors — sharded along with q, they give
    the kernel global coordinates for the dropout hash regardless of mesh
    layout (masks are identical sharded or unsharded)."""
    return (
        jnp.arange(q.shape[0], dtype=jnp.int32),
        jnp.arange(q.shape[1], dtype=jnp.int32),
    )


def _fwd_impl(q, k, v, seed, rows, heads, scale, dropout_rate, compute_dtype):
    b, h, t, d = q.shape
    return _call(
        _fwd_kernel, 3, 1, (b, h, t, d), seed, rows, heads, q, k, v,
        interpret=_interpret(),
        out_dtype=q.dtype,
        heads=h,
        scale=scale,
        keep_prob=1.0 - dropout_rate,
        compute_dtype=compute_dtype,
    )


def _bwd_impl(q, k, v, g, seed, rows, heads, scale, dropout_rate, compute_dtype):
    b, h, t, d = q.shape
    return _call(
        _bwd_kernel, 4, 3, (b, h, t, d), seed, rows, heads, q, k, v, g,
        interpret=_interpret(),
        out_dtype=q.dtype,
        heads=h,
        scale=scale,
        keep_prob=1.0 - dropout_rate,
        compute_dtype=compute_dtype,
    )


# GSPMD would all-gather sharded operands around the opaque pallas calls and
# run them replicated; declare the (batch, head)-parallel partitioning so dp
# and head-tp meshes run the kernels shard-local with no collectives
# (parallel/kernel_partition.py). One wrapper per static config, cached so
# jit retracing sees a stable callable. Factor 0 = batch, factor 1 = heads;
# the rows/heads index vectors shard with their factor so the kernel sees
# global coordinates.
_QKV = {0: 0, 1: 1}


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(scale, dropout_rate, compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(q, k, v, seed, rows, heads):
        return _fwd_impl(
            q, k, v, seed, rows, heads, scale, dropout_rate, compute_dtype
        )

    return partition_kernel(
        impl,
        arg_factors=[_QKV, _QKV, _QKV, None, {0: 0}, {1: 0}],
        arg_ndims=(4, 4, 4, 1, 1, 1),
        out_factors=[_QKV],
        out_ndims=(4,),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(scale, dropout_rate, compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(q, k, v, g, seed, rows, heads):
        return _bwd_impl(
            q, k, v, g, seed, rows, heads, scale, dropout_rate, compute_dtype
        )

    return partition_kernel(
        impl,
        arg_factors=[_QKV, _QKV, _QKV, _QKV, None, {0: 0}, {1: 0}],
        arg_ndims=(4, 4, 4, 4, 1, 1, 1),
        out_factors=[_QKV, _QKV, _QKV],
        out_ndims=(4, 4, 4),
    )


def _vjp_fwd(q, k, v, seed, scale, dropout_rate, compute_dtype):
    o = mha_fused(q, k, v, seed, scale, dropout_rate, compute_dtype)
    return o, (q, k, v, seed)


def _vjp_bwd(scale, dropout_rate, compute_dtype, res, g):
    q, k, v, seed = res
    dq, dk, dv = _bwd_partitioned(scale, dropout_rate, compute_dtype)(
        q, k, v, g.astype(q.dtype),
        seed.reshape(1).astype(jnp.int32), *_ids(q),
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


mha_fused.defvjp(_vjp_fwd, _vjp_bwd)


def mha_with_rng(q, k, v, scale, dropout_rate, rng, train, compute_dtype):
    """Model-side entry: derive the kernel's int32 seed from a jax.random key
    (one split, like the dense path's dropout) and run mha_fused.

    Returns (ctx (B,H,T,D) in q's dtype — the activation-stream dtype —
    with f32 accumulation inside the kernel, advanced rng)."""
    rate = dropout_rate if train else 0.0
    if rate > 0.0:
        rng, sub = jax.random.split(rng)
        seed = jax.random.randint(
            sub, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((), jnp.int32)
    return mha_fused(q, k, v, seed, scale, rate, compute_dtype), rng
