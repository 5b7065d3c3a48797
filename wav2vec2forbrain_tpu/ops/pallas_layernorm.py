"""Fused LayerNorm Pallas kernel (fwd + custom VJP).

LayerNorm is everywhere in both encoder families (5 per conformer layer —
ffn1/attn/conv/ffn2/final, HF semantics mirrored from the reference's
encoders at src/model/w2v_conformer_custom_feat_extractor.py:79-112 and
src/model/w2v_custom_feat_extractor.py:156-191 — and 2 per wav2vec2 layer),
and at the bench shape it is the measured non-matmul hot spot of the
unrolled train step: the op-level trace attributes ~24 ms of the 111 ms
device step to LN-shaped convert+reduce fusions (stats over the channel dim
fwd, dgamma/dbeta row reductions bwd), each running ~10x off HBM
speed-of-light because XLA emits them as many small latency-bound fusions.

This kernel runs the whole thing VMEM-resident per batch group: one HBM
read of x -> stats + normalize + affine -> one HBM write of y. The custom
VJP recomputes the row stats from x (cheaper than storing/re-reading two
f32 stat tensors) and emits per-batch-element dgamma/dbeta partials; the
sum over the batch runs outside in XLA, which GSPMD turns into the dp psum
natively (same pattern as ops/pallas_conv_glu.py's dK).

MEASURED OUTCOME (v5e, bench shape, tools/ab_layernorm.py): the kernel
wins in isolation — fwd 0.124 -> 0.085 ms, fwd+bwd 0.319 -> 0.268 ms per
LN at bf16 (f32 wins too) — but LOSES in the full train step (116.6 ms
with XLA LN vs 117.5-119 with the kernel unrolled; 191.7 vs 196.4
scanned): the opaque custom call denies XLA the fusion of each LN with
its surrounding residual adds and dtype converts, and the lost fusions
cost more than the kernel saves. ops/select.py therefore routes
"layernorm" to XLA under the default "auto" policy; the kernel remains
selectable (--pallas_kernels=all or an explicit comma list) for A/B runs
and for shapes where the trade-off may flip.

Numerics match models/wav2vec2.py::_layer_norm op-for-op: f32 math
(mean -> centered variance -> rsqrt(var+eps) -> scale/bias), output cast to
the activation-stream dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (parity with sibling kernels)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# One pipeline stage's operand/result blocks must stay well under half the
# 16M scoped-VMEM stack (Pallas double-buffers gridded blocks); see
# ops/pallas_attention.py::_VMEM_BLOCK_BUDGET for the measured rationale.
_VMEM_BLOCK_BUDGET = 5 * 1024 * 1024


def _pick_group(b, t, c, n_arrays):
    """Largest divisor of b whose (group, T, C) blocks fit the VMEM budget.

    n_arrays counts f32 (T, C)-shaped live values per batch element —
    HBM blocks AND in-kernel temporaries (the f32 casts/products dominate
    the scoped stack: measured 18.6M scoped for the bwd kernel at group 8
    when only the three bf16 IO blocks were counted)."""
    per_elem = n_arrays * t * c * 4
    g = 1
    for cand in range(2, b + 1):
        if b % cand == 0 and cand * per_elem <= _VMEM_BLOCK_BUDGET:
            g = cand
    return g


def _stats(x32, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return xc, rstd


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x32 = x_ref[...].astype(jnp.float32)  # (G, T, C)
    xc, rstd = _stats(x32, eps)
    y = (xc * rstd) * g_ref[0] + b_ref[0]
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    x32 = x_ref[...].astype(jnp.float32)  # (G, T, C)
    dy = dy_ref[...].astype(jnp.float32)
    xc, rstd = _stats(x32, eps)
    xhat = xc * rstd
    # per-batch-element param-grad partials (sum over T only); kept 3-D
    # (G, 1, C) so the block's last two dims equal the array's (Pallas TPU
    # tiling constraint for non-8-aligned sublane blocks)
    dg_ref[...] = jnp.sum(dy * xhat, axis=1, keepdims=True)
    db_ref[...] = jnp.sum(dy, axis=1, keepdims=True)
    w = dy * g_ref[0]
    m1 = jnp.mean(w, axis=-1, keepdims=True)
    m2 = jnp.mean(w * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (w - m1 - xhat * m2)).astype(dx_ref.dtype)


def _fwd_impl(x, g, b, *, eps):
    bsz, t, c = x.shape
    group = _pick_group(bsz, t, c, 5)
    blk = pl.BlockSpec((group, t, c), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(bsz // group,),
        in_specs=[blk, vec, vec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
        interpret=_interpret(),
    )(x, g.reshape(1, c).astype(jnp.float32), b.reshape(1, c).astype(jnp.float32))


def _bwd_impl(x, g, dy, *, eps):
    bsz, t, c = x.shape
    group = _pick_group(bsz, t, c, 10)
    blk = pl.BlockSpec((group, t, c), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, c), lambda i: (0, 0))
    part = pl.BlockSpec((group, 1, c), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(bsz // group,),
        in_specs=[blk, vec, blk],
        out_specs=[blk, part, part],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, g.reshape(1, c).astype(jnp.float32), dy)


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(eps):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import partition_batched

    def impl(x, g, b):  # positional-only: custom_partitioning can't bind kwargs
        return _fwd_impl(x, g, b, eps=eps)

    return partition_batched(
        impl,
        arg_ndims=(3, 1, 1),
        out_ndims=(3,),
        shardable_dims=(0,),
        replicated_argnums=(1, 2),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(eps):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import partition_batched

    # dgamma/dbeta partials carry the batch on dim 0; the sum over B runs
    # outside in XLA (GSPMD inserts the dp psum)
    def impl(x, g, dy):
        return _bwd_impl(x, g, dy, eps=eps)

    return partition_batched(
        impl,
        arg_ndims=(3, 1, 3),
        out_ndims=(3, 3, 3),
        shardable_dims=(0,),
        replicated_argnums=(1,),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fused(x, scale, bias, eps):
    """x: (B, T, C) activation-stream dtype; scale/bias: (C,) f32 ->
    y: (B, T, C) in x's dtype. f32 math inside (matches _layer_norm)."""
    return _fwd_partitioned(eps)(x, scale, bias)


def _vjp_fwd(x, scale, bias, eps):
    return _fwd_partitioned(eps)(x, scale, bias), (x, scale)


def _vjp_bwd(eps, res, dy):
    x, scale = res
    dx, dg_part, db_part = _bwd_partitioned(eps)(x, scale, dy.astype(x.dtype))
    return (
        dx,
        jnp.sum(dg_part, axis=(0, 1)).astype(scale.dtype),
        jnp.sum(db_part, axis=(0, 1)).astype(scale.dtype),
    )


layer_norm_fused.defvjp(_vjp_fwd, _vjp_bwd)
