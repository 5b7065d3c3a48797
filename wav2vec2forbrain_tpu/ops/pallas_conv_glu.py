"""Fused GLU -> depthwise-conv Pallas kernel for the conformer conv module.

The conv module (ref wrapper: src/model/w2v_conformer_custom_feat_extractor
.py:79-112, HF semantics mirrored in models/conformer.py) runs
LN -> pointwise(2C, GLU) -> depthwise(k=31) -> BN -> swish -> pointwise. The
two pointwise matmuls are MXU-bound and XLA-optimal, and BN/swish fuse into
the surrounding matmuls — but the GLU + depthwise middle is the measured
hot spot (tools/profile_conv_module.py on v5e: depthwise ~4.1 ms/step,
total non-matmul ~5.3 ms of the 13.0 ms conv-module block): XLA lowers the
grouped conv poorly at feature_group_count=C and materialises the GLU
intermediate. This kernel fuses GLU -> depthwise as 31 static shifted
multiply-adds per batch element, VMEM-resident, with a custom VJP doing the
mirrored shifted accumulation (the r2 shift-add reformulation in plain XLA
was fwd-faster/bwd-slower; owning the backward keeps both sides).

Numerics match models/conformer.py's XLA path: GLU in f32, cast to the
compute dtype for the conv taps, f32 accumulation, output rounded through
the compute dtype (what XLA's bf16 conv emits).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (kept for parity with sibling kernels)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _glu(y):
    c = y.shape[-1] // 2
    a = y[..., :c]
    gate = y[..., c:]
    return a * jax.nn.sigmoid(gate)


def _fwd_kernel(y_ref, w_ref, z_ref, *, ks: int, compute_dtype):
    # blocks ride the activation-stream dtype in HBM/VMEM; GLU math runs
    # f32 in-kernel (bf16 sigmoid trips Mosaic's f32-literal broadcast, and
    # f32 matches the XLA path's numerics)
    y = y_ref[0].astype(jnp.float32)  # (T, 2C)
    t_len = y.shape[0]
    c = y.shape[-1] // 2
    g = _glu(y).astype(compute_dtype)
    left = (ks - 1) // 2
    right = ks // 2
    gpad = jnp.concatenate(
        [
            jnp.zeros((left, c), compute_dtype),
            g,
            jnp.zeros((right, c), compute_dtype),
        ],
        axis=0,
    )
    acc = jnp.zeros((t_len, c), jnp.float32)
    for k in range(ks):
        tap = w_ref[k, :].astype(jnp.float32)
        acc = acc + (
            jax.lax.slice_in_dim(gpad, k, k + t_len, axis=0).astype(jnp.float32)
            * tap
        )
    # XLA's bf16 conv rounds its output through the compute dtype; emit in
    # the caller's stream dtype (f32 by default — bit-identical)
    z_ref[0] = acc.astype(compute_dtype).astype(z_ref.dtype)


def _bwd_kernel(y_ref, w_ref, dz_ref, dy_ref, dk_ref, *, ks: int, compute_dtype):
    y = y_ref[0].astype(jnp.float32)  # (T, 2C; blocks ride stream dtype)
    dz = dz_ref[0].astype(jnp.float32)  # (T, C) cotangent, f32 accumulate
    t_len = y.shape[0]
    c = y.shape[-1] // 2
    a = y[:, :c]
    sig = jax.nn.sigmoid(y[:, c:])
    g = (a * sig).astype(compute_dtype).astype(jnp.float32)  # == fwd's g
    left = (ks - 1) // 2
    right = ks // 2

    # dK[k] = sum_t g_pad[t+k] * dz[t]   (per-batch-element partial)
    gpad = jnp.concatenate(
        [jnp.zeros((left, c), jnp.float32), g, jnp.zeros((right, c), jnp.float32)],
        axis=0,
    )
    for k in range(ks):
        dk_ref[0, k, :] = jnp.sum(
            jax.lax.slice_in_dim(gpad, k, k + t_len, axis=0) * dz, axis=0
        )

    # dg[s] = sum_k w[k] * dz[s + left - k]  (correlation with flipped taps)
    dzpad = jnp.concatenate(
        [
            jnp.zeros((right, c), jnp.float32),
            dz,
            jnp.zeros((left, c), jnp.float32),
        ],
        axis=0,
    )
    dg = jnp.zeros((t_len, c), jnp.float32)
    for k in range(ks):
        tap = w_ref[ks - 1 - k, :].astype(jnp.float32)
        dg = dg + jax.lax.slice_in_dim(dzpad, k, k + t_len, axis=0) * tap
    # GLU backward (f32): d a = dg * sig; d gate = dg * a * sig * (1 - sig)
    da = dg * sig
    dgate = dg * a * sig * (1.0 - sig)
    dy_ref[0] = jnp.concatenate([da, dgate], axis=-1).astype(dy_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def glu_dwconv(y, w, compute_dtype=jnp.float32):
    """y: (B, T, 2C) pointwise-conv1 output (activation-stream dtype);
    w: (ks, C) depthwise taps -> z: (B, T, C) in y's dtype (GLU then
    'same'-padded depthwise conv, f32 accumulation)."""
    return _fwd_partitioned(compute_dtype)(y, w)


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import partition_batched

    def impl(y, w):  # positional-only: custom_partitioning can't bind kwargs
        return _fwd_impl(y, w, compute_dtype=compute_dtype)

    return partition_batched(
        impl,
        arg_ndims=(3, 2),
        out_ndims=(3,),
        shardable_dims=(0,),
        replicated_argnums=(1,),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(compute_dtype):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import partition_batched

    # dK partials carry the batch on dim 0; the sum over B runs outside in
    # XLA, which GSPMD turns into the dp psum natively
    def impl(y, w, dz):
        return _bwd_impl(y, w, dz, compute_dtype=compute_dtype)

    return partition_batched(
        impl,
        arg_ndims=(3, 2, 3),
        out_ndims=(3, 3),
        shardable_dims=(0,),
        replicated_argnums=(1,),
    )


def _fwd_impl(y, w, *, compute_dtype):
    b, t_len, c2 = y.shape
    c = c2 // 2
    ks = w.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ks=ks, compute_dtype=compute_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_len, c2), lambda i: (i, 0, 0)),
            pl.BlockSpec((ks, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_len, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_len, c), y.dtype),
        interpret=_interpret(),
    )(y, w.astype(compute_dtype))


def _bwd_impl(y, w, dz, *, compute_dtype):
    b, t_len, c2 = y.shape
    c = c2 // 2
    ks = w.shape[0]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, ks=ks, compute_dtype=compute_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_len, c2), lambda i: (i, 0, 0)),
            pl.BlockSpec((ks, c), lambda i: (0, 0)),
            pl.BlockSpec((1, t_len, c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, t_len, c2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ks, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_len, c2), y.dtype),
            jax.ShapeDtypeStruct((b, ks, c), jnp.float32),  # dK partials f32
        ],
        interpret=_interpret(),
    )(y, w.astype(compute_dtype), dz)


def _vjp_fwd(y, w, compute_dtype):
    z = _fwd_partitioned(compute_dtype)(y, w)
    return z, (y, w)


def _vjp_bwd(compute_dtype, residuals, dz):
    y, w = residuals
    dy, dk_partial = _bwd_partitioned(compute_dtype)(y, w, dz)
    dw = jnp.sum(dk_partial, axis=0).astype(w.dtype)
    return dy, dw


glu_dwconv.defvjp(_vjp_fwd, _vjp_bwd)
