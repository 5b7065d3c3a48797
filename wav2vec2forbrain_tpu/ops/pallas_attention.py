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

Layout: the kernel is (B, T, H·D)-native — exactly what the q/k/v
projections emit — and slices each head's D lanes inside the kernel. The
earlier (B, H, T, D) layout forced eight physical (b,t,h,d)<->(b,h,t,d)
transposes per layer around the opaque custom call (XLA cannot fuse through
it) and wasted half of every VMEM lane tile (D=64 of 128 lanes); BTH blocks
are fully lane-packed and need no layout ops at all (measured on v5e at the
bench shape: attention block fwd+bwd 26.9 -> 23.0 ms/step x24 layers).

Forward, per grid program (`group` batch elements, all heads looped):
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
for parity, the reference's cuRAND streams differ from both. The per-head
mask streams are keyed on GLOBAL (row, head) ids, so masks are identical to
the old layout's bit-for-bit and across any mesh sharding.
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


def _mix(seed_ref, rows_ref, heads_ref, r, h, d):
    """Per-(GLOBAL batch row, GLOBAL head) hash stream selector.

    rows/heads carry global indices (they shard along with q), so dropout
    masks are identical whether the batch runs on one chip or dp/tp-sharded
    across a mesh — and never repeat across shards. heads_ref is lane-
    replicated (each head id repeated D times) so it shards 1:1 with q's
    hidden dim; entry h*d is head h's global id."""
    row = rows_ref[r].astype(jnp.uint32)
    head = heads_ref[h * d].astype(jnp.uint32)
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
    *, group, heads, d, scale, keep_prob, compute_dtype,
):
    """Blocks: q/k/v/o (group, T, H·D) — `group` batch elements per
    program (amortizes per-program grid overhead; results are independent
    of `group` since the dropout hash keys on GLOBAL ids). Heads are
    static lane slices h*d:(h+1)*d of the packed hidden dim."""
    for i in range(group):
        for h in range(heads):  # static unroll: 2-D matmuls only
            sl = slice(h * d, (h + 1) * d)
            p = _probs(q_ref[i, :, sl], k_ref[i, :, sl], scale, compute_dtype)
            if keep_prob < 1.0:
                row = pl.program_id(0) * group + i
                mix = _mix(seed_ref, rows_ref, heads_ref, row, h, d)
                p = p * _keep_mask(p.shape, keep_prob, mix) * (
                    1.0 / keep_prob
                )
            o_ref[i, :, sl] = jax.lax.dot_general(
                p.astype(compute_dtype),
                v_ref[i, :, sl].astype(compute_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, rows_ref, heads_ref, q_ref, k_ref, v_ref, g_ref,
    dq_ref, dk_ref, dv_ref,
    *, group, heads, d, scale, keep_prob, compute_dtype,
):
    cd = compute_dtype
    for i in range(group):
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            q = q_ref[i, :, sl]
            k = k_ref[i, :, sl]
            v = v_ref[i, :, sl]
            g = g_ref[i, :, sl]
            p = _probs(q, k, scale, cd)  # pre-dropout probs, f32
            if keep_prob < 1.0:
                # same (seed, global row, global head) stream as forward
                row = pl.program_id(0) * group + i
                mix = _mix(seed_ref, rows_ref, heads_ref, row, h, d)
                mask = _keep_mask(p.shape, keep_prob, mix) * (
                    1.0 / keep_prob
                )
                pd = p * mask  # dropped probs (what fwd used for ctx)
            else:
                pd = p
            # dv = pd^T @ g
            dv_ref[i, :, sl] = jax.lax.dot_general(
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
            dq_ref[i, :, sl] = (jax.lax.dot_general(
                ds.astype(cd), k.astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale).astype(dq_ref.dtype)
            dk_ref[i, :, sl] = (jax.lax.dot_general(
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


def _pick_group(b, t, hd, n_arrays, itemsize):
    """Largest divisor of b whose operand blocks fit the VMEM budget.

    itemsize is the kernel's HBM block dtype (the q/k/v stream dtype —
    outputs are emitted in the same dtype); a bf16 stream halves the block
    bytes so groups double for free. BTH blocks are lane-packed (the last
    dim is the full hidden size), so the estimate is the true footprint —
    no half-empty 128-lane tiles like per-head D=64 blocks had."""
    per_elem = n_arrays * t * hd * itemsize
    g = 1
    for cand in range(2, b + 1):
        if b % cand == 0 and cand * per_elem <= _VMEM_BLOCK_BUDGET:
            g = cand
    return g


def _call(kern_fn, n_in, n_out, bth, head_dim, seed, rows, head_ids, *args,
          interpret, out_dtype=jnp.float32, **kern_kw):
    b, t, hd = bth
    itemsize = jnp.dtype(out_dtype).itemsize
    group = _pick_group(b, t, hd, n_in + n_out + 1, itemsize)
    # head COUNT comes from the (possibly shard-local) packed dim: under
    # head-tp each shard sees hd_local = (H/tp)·D, so heads must be derived
    # from the local shape while D — sharding-invariant — is the static
    kern = functools.partial(
        kern_fn, group=group, heads=hd // head_dim, d=head_dim, **kern_kw
    )
    block = pl.BlockSpec(
        (group, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((b, t, hd), out_dtype)] * n_out
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def mha_fused_bth(q, k, v, seed, num_heads, scale, dropout_rate,
                  compute_dtype):
    """q/k/v: (B, T, H·D) — the projections' native layout -> ctx
    (B, T, H·D) in q.dtype (f32 accumulate), no layout ops anywhere.

    seed: int32 scalar array; used only when dropout_rate > 0 (train mode).
    Pass dropout_rate=0.0 for eval."""
    return _fwd_partitioned(
        q.shape[2] // num_heads, scale, dropout_rate, compute_dtype
    )(q, k, v, seed.reshape(1).astype(jnp.int32), *_ids(q, num_heads))


def _ids(q, num_heads):
    """Global (row, head) index vectors — sharded along with q, they give
    the kernel global coordinates for the dropout hash regardless of mesh
    layout (masks are identical sharded or unsharded). The head-id vector
    is lane-replicated (each id repeated D times, length H·D) so it carries
    the same sharding factor as q's packed hidden dim."""
    d = q.shape[2] // num_heads
    return (
        jnp.arange(q.shape[0], dtype=jnp.int32),
        jnp.repeat(jnp.arange(num_heads, dtype=jnp.int32), d),
    )


def _fwd_impl(q, k, v, seed, rows, head_ids, head_dim, scale, dropout_rate,
              compute_dtype):
    b, t, hd = q.shape
    return _call(
        _fwd_kernel, 3, 1, (b, t, hd), head_dim, seed, rows, head_ids,
        q, k, v,
        interpret=_interpret(),
        out_dtype=q.dtype,
        scale=scale,
        keep_prob=1.0 - dropout_rate,
        compute_dtype=compute_dtype,
    )


def _bwd_impl(q, k, v, g, seed, rows, head_ids, head_dim, scale,
              dropout_rate, compute_dtype):
    b, t, hd = q.shape
    return _call(
        _bwd_kernel, 4, 3, (b, t, hd), head_dim, seed, rows, head_ids,
        q, k, v, g,
        interpret=_interpret(),
        out_dtype=q.dtype,
        scale=scale,
        keep_prob=1.0 - dropout_rate,
        compute_dtype=compute_dtype,
    )


# GSPMD would all-gather sharded operands around the opaque pallas calls and
# run them replicated; declare the (batch, hidden)-parallel partitioning so
# dp and head-tp meshes run the kernels shard-local with no collectives
# (parallel/kernel_partition.py). One wrapper per static config, cached so
# jit retracing sees a stable callable. Factor 0 = batch on dim 0; factor
# 1 = the packed hidden dim (head-tp shards whole heads: tp must divide
# num_heads, which the Megatron specs already require). The rows/head-id
# vectors shard with their factor so the kernel sees global coordinates.
_QKV = {0: 0, 1: 2}


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(head_dim, scale, dropout_rate, compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(q, k, v, seed, rows, head_ids):
        return _fwd_impl(
            q, k, v, seed, rows, head_ids, head_dim, scale, dropout_rate,
            compute_dtype,
        )

    return partition_kernel(
        impl,
        arg_factors=[_QKV, _QKV, _QKV, None, {0: 0}, {1: 0}],
        arg_ndims=(3, 3, 3, 1, 1, 1),
        out_factors=[_QKV],
        out_ndims=(3,),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(head_dim, scale, dropout_rate, compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_kernel,
    )

    def impl(q, k, v, g, seed, rows, head_ids):
        return _bwd_impl(
            q, k, v, g, seed, rows, head_ids, head_dim, scale,
            dropout_rate, compute_dtype,
        )

    return partition_kernel(
        impl,
        arg_factors=[_QKV, _QKV, _QKV, _QKV, None, {0: 0}, {1: 0}],
        arg_ndims=(3, 3, 3, 3, 1, 1, 1),
        out_factors=[_QKV, _QKV, _QKV],
        out_ndims=(3, 3, 3),
    )


def _vjp_fwd(q, k, v, seed, num_heads, scale, dropout_rate, compute_dtype):
    o = mha_fused_bth(q, k, v, seed, num_heads, scale, dropout_rate,
                      compute_dtype)
    return o, (q, k, v, seed)


def _vjp_bwd(num_heads, scale, dropout_rate, compute_dtype, res, g):
    q, k, v, seed = res
    dq, dk, dv = _bwd_partitioned(q.shape[2] // num_heads, scale,
                                  dropout_rate, compute_dtype)(
        q, k, v, g.astype(q.dtype),
        seed.reshape(1).astype(jnp.int32), *_ids(q, num_heads),
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


mha_fused_bth.defvjp(_vjp_fwd, _vjp_bwd)


def mha_fused(q, k, v, seed, scale, dropout_rate, compute_dtype):
    """(B, H, T, D)-layout compat entry (tests, external callers): reshapes
    to the kernel's native BTH layout and back. Model code should call
    mha_fused_bth / mha_with_rng directly and skip the transposes."""
    b, h, t, d = q.shape

    def to_bth(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * d)

    ctx = mha_fused_bth(
        to_bth(q), to_bth(k), to_bth(v), seed, h, scale, dropout_rate,
        compute_dtype,
    )
    return jnp.transpose(ctx.reshape(b, t, h, d), (0, 2, 1, 3))


def mha_with_rng(q, k, v, num_heads, scale, dropout_rate, rng, train,
                 compute_dtype, use_pallas=True):
    """Model-side entry: the ONE attention route both encoders call.

    Derives an int32 seed from the jax.random key (one split when dropout
    is live — the rng CHAIN is identical on every route) and dispatches by
    the kernel policy: `auto` runs the XLA-BTH dense path
    (ops/xla_attention.py — measured faster at the short-T encoder shapes,
    see that module's docstring), an explicit policy ('all' or a comma
    list naming 'attention') runs the Pallas kernel. Dropout masks are
    bit-identical across routes (same hash streams), so the choice is
    performance-only.

    q/k/v: (B, T, H·D) — straight from the projections. Returns (ctx
    (B, T, H·D) in q's dtype — the activation-stream dtype — with f32
    accumulation either way, advanced rng)."""
    rate = dropout_rate if train else 0.0
    if rate > 0.0:
        rng, sub = jax.random.split(rng)
        seed = jax.random.randint(
            sub, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((), jnp.int32)
    from wav2vec2forbrain_tpu.ops.select import kernel_enabled

    if kernel_enabled("attention", use_pallas, q.dtype):
        ctx = mha_fused_bth(q, k, v, seed, num_heads, scale, rate,
                            compute_dtype)
    else:
        from wav2vec2forbrain_tpu.ops.xla_attention import mha_dense_bth

        ctx = mha_dense_bth(q, k, v, seed, num_heads, scale, rate,
                            compute_dtype)
    return ctx, rng
