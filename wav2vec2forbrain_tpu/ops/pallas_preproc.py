"""Fused Pallas TPU kernel for the B2P2T preprocessing chain.

One kernel per sample fuses the whole chain the reference runs as four
separate CUDA ops (ref: src/model/b2p2t_model.py:150-167):

    gaussian smooth (depthwise k=20, 'same')
      -> day-conditioned affine  x @ W[day] + b[day]   (MXU)
      -> softsign
      -> unfold (k=32, stride 4, channel-major flatten)

Why fuse: the chain is bandwidth-bound — XLA materialises the smoothed and
affined intermediates in HBM and the unfold gather re-reads them; fused, the
intermediates live in VMEM and HBM traffic drops to (read x + read W[day] +
write out). The day weight matrix is selected per-sample with a
scalar-prefetch index map (no host gather).

A custom VJP supplies the backward pass as a second fused kernel emitting
(dx, per-sample dW/db contributions); day-level accumulation is a
segment_sum outside the kernel (avoids cross-program scatter races).

Numerics match models/preprocessing.apply_preproc exactly (same torch
'same'-padding convention: (k-1)//2 left, k//2 right).
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wav2vec2forbrain_tpu.models.preprocessing import (
    GAUSS_KERNEL_SIZE,
    preproc_out_lens,
)

NEURAL_DIM = 256


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels run (and are tested) on CPU."""
    return jax.default_backend() != "tpu"


def _gauss_taps(sigma: float, k: int = GAUSS_KERNEL_SIZE) -> np.ndarray:
    grid = np.arange(k, dtype=np.float64)
    mean = (k - 1) / 2.0
    t = (1.0 / (sigma * math.sqrt(2 * math.pi))) * np.exp(
        -(((grid - mean) / sigma) ** 2) / 2
    )
    return (t / t.sum()).astype(np.float32)


def _smooth_block(xv: jnp.ndarray, taps, t_len: int) -> jnp.ndarray:
    """Depthwise 'same' conv via static shifted adds. xv: (T, C)."""
    k = len(taps)
    left = (k - 1) // 2
    right = k // 2
    c = xv.shape[-1]
    xp = jnp.concatenate(
        [
            jnp.zeros((left, c), xv.dtype),
            xv,
            jnp.zeros((right, c), xv.dtype),
        ],
        axis=0,
    )
    y = jnp.zeros_like(xv)
    for i in range(k):
        y = y + taps[i] * jax.lax.slice_in_dim(xp, i, i + t_len, axis=0)
    return y


def _select_stride_rows(z: jnp.ndarray, j: int, stride: int, t_out: int):
    """Rows j, j+stride, ..., j+(t_out-1)*stride of z -> (T', C).

    Pad+reshape (contiguous) instead of a strided gather, which Mosaic
    lowers poorly."""
    c = z.shape[-1]
    sl = jax.lax.slice_in_dim(z, j, j + (t_out - 1) * stride + 1, axis=0)
    pad = t_out * stride - sl.shape[0]
    if pad:
        sl = jnp.concatenate([sl, jnp.zeros((pad, c), z.dtype)], axis=0)
    return sl.reshape(t_out, stride, c)[:, 0, :]


def _fwd_kernel(
    day_idx_ref,  # scalar prefetch (B,)
    x_ref,        # (1, T, C)
    w_ref,        # (1, C, C)  day-selected
    b_ref,        # (1, 1, C)  day-selected
    out_ref,      # (1, k, T', C) — window-index-major; transposed to the
                  # torch channel-major (c*k+j) layout OUTSIDE the kernel
                  # (one fused XLA transpose; in-kernel merge of the
                  # lane-misaligned (C, k) pair is unsupported by Mosaic)
    *,
    taps,
    kernel_len,
    stride,
    t_len,
    t_out,
):
    xv = x_ref[0]
    y = _smooth_block(xv, taps, t_len)
    z = jnp.dot(y, w_ref[0], preferred_element_type=jnp.float32) + b_ref[0]
    z = z / (1.0 + jnp.abs(z))  # softsign
    for j in range(kernel_len):
        out_ref[0, j] = _select_stride_rows(z, j, stride, t_out)


def _bwd_kernel(
    day_idx_ref,
    x_ref,        # (1, T, C)
    w_ref,        # (1, C, C)
    b_ref,        # (1, 1, C)
    g_ref,        # (1, k, T', C) upstream grad, window-index-major
    dx_ref,       # (1, T, C)
    dw_ref,       # (1, C, C) per-sample contribution
    db_ref,       # (1, 1, C)
    *,
    taps,
    kernel_len,
    stride,
    t_len,
    t_out,
):
    xv = x_ref[0]
    # recompute forward intermediates (cheap; avoids HBM residuals)
    y = _smooth_block(xv, taps, t_len)
    pre = jnp.dot(y, w_ref[0], preferred_element_type=jnp.float32) + b_ref[0]

    # d unfold: spread the per-window grads back onto the T axis.
    # Per-residue formulation: rows t = r + stride*s collect the window
    # columns j = r + stride*m at window index s-m, i.e. a shifted add of
    # each (T', C) column — then one interleave merges the residues.
    # Scatter-free and 1/stride the VPU work of the naive spread.
    n_res = stride
    t_res = (t_len + stride - 1) // stride  # rows per residue class
    dz_res = []
    for r in range(n_res):
        acc = jnp.zeros((t_res, NEURAL_DIM), jnp.float32)
        for m in range(kernel_len // stride):
            j = r + stride * m
            if j >= kernel_len:
                break
            col = g_ref[0, j]  # (T', C), contributes at s = t'+m
            parts = []
            if m > 0:
                parts.append(jnp.zeros((m, NEURAL_DIM), jnp.float32))
            parts.append(col)
            tail = t_res - (m + t_out)
            if tail > 0:
                parts.append(jnp.zeros((tail, NEURAL_DIM), jnp.float32))
            shifted = (
                parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            )
            if shifted.shape[0] > t_res:
                shifted = jax.lax.slice_in_dim(shifted, 0, t_res, axis=0)
            acc = acc + shifted
        dz_res.append(acc)
    dz = jnp.stack(dz_res, axis=1).reshape(t_res * stride, NEURAL_DIM)
    if dz.shape[0] != t_len:
        dz = jax.lax.slice_in_dim(dz, 0, t_len, axis=0)

    # d softsign: 1/(1+|pre|)^2
    denom = 1.0 + jnp.abs(pre)
    dz = dz / (denom * denom)

    # d affine
    db_ref[0] = jnp.sum(dz, axis=0, keepdims=True)
    dw_ref[0] = jnp.dot(y.T, dz, preferred_element_type=jnp.float32)
    dy = jnp.dot(dz, w_ref[0].T, preferred_element_type=jnp.float32)

    # d smooth: correlation with reversed taps and swapped padding
    k = len(taps)
    left = k // 2
    right = (k - 1) // 2
    yp = jnp.concatenate(
        [
            jnp.zeros((left, NEURAL_DIM), jnp.float32),
            dy,
            jnp.zeros((right, NEURAL_DIM), jnp.float32),
        ],
        axis=0,
    )
    dx = jnp.zeros((t_len, NEURAL_DIM), jnp.float32)
    for i in range(k):
        dx = dx + taps[k - 1 - i] * jax.lax.slice_in_dim(
            yp, i, i + t_len, axis=0
        )
    dx_ref[0] = dx


def _day_specs(t_len, t_out, kernel_len):
    """Common scalar-prefetch grid spec pieces for both kernels."""
    in_specs = [
        pl.BlockSpec(
            (1, t_len, NEURAL_DIM),
            lambda b, day_ref: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, NEURAL_DIM, NEURAL_DIM),
            lambda b, day_ref: (day_ref[b], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, NEURAL_DIM),
            lambda b, day_ref: (day_ref[b], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    return in_specs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def fused_preproc(
    x: jnp.ndarray,
    day_weights: jnp.ndarray,
    day_bias: jnp.ndarray,
    day_idxs: jnp.ndarray,
    sigma: float,
    kernel_len: int = 32,
    stride: int = 4,
) -> jnp.ndarray:
    """x (B,T,256) -> features (B, T', 256*kernel_len)."""
    return _fwd_partitioned(sigma, kernel_len, stride)(
        x, day_weights, day_bias, day_idxs
    )


# Batch-parallel partitioning declaration (parallel/kernel_partition.py):
# GSPMD would otherwise all-gather dp-sharded batches around the opaque
# pallas calls. x/day_idxs/g and every kernel output carry the batch on dim
# 0; the day tables are replicated, and the cross-batch day reduction
# (segment_sum) runs OUTSIDE the kernel in plain XLA, which GSPMD already
# partitions natively.
@functools.lru_cache(maxsize=None)
def _fwd_partitioned(sigma, kernel_len, stride):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_batched,
    )

    def impl(x, day_weights, day_bias, day_idxs):
        return _fused_fwd_impl(
            x, day_weights, day_bias, day_idxs, sigma, kernel_len, stride
        )

    return partition_batched(
        impl,
        arg_ndims=(3, 3, 3, 1),
        out_ndims=(3,),
        shardable_dims=(0,),
        replicated_argnums=(1, 2),
    )


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(sigma, kernel_len, stride):
    from wav2vec2forbrain_tpu.parallel.kernel_partition import (
        partition_batched,
    )

    def impl(x, day_weights, day_bias, day_idxs, g):
        return _fused_bwd_impl(
            x, day_weights, day_bias, day_idxs, g, sigma, kernel_len, stride
        )

    return partition_batched(
        impl,
        arg_ndims=(3, 3, 3, 1, 3),
        out_ndims=(3, 3, 3),
        shardable_dims=(0,),
        replicated_argnums=(1, 2),
    )


def _fused_fwd_impl(x, day_weights, day_bias, day_idxs, sigma, kernel_len, stride):
    b, t_len, c = x.shape
    assert c == NEURAL_DIM
    t_out = (t_len - kernel_len) // stride + 1
    taps = tuple(float(v) for v in _gauss_taps(sigma))

    kern = functools.partial(
        _fwd_kernel,
        taps=taps,
        kernel_len=kernel_len,
        stride=stride,
        t_len=t_len,
        t_out=t_out,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=_day_specs(t_len, t_out, kernel_len),
        out_specs=pl.BlockSpec(
            (1, kernel_len, t_out, NEURAL_DIM),
            lambda bb, day_ref: (bb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    win = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, kernel_len, t_out, NEURAL_DIM), jnp.float32
        ),
        interpret=_interpret(),
    )(day_idxs, x.astype(jnp.float32), day_weights, day_bias)
    # (B, k, T', C) -> torch channel-major (B, T', C*k)
    return jnp.transpose(win, (0, 2, 3, 1)).reshape(
        b, t_out, NEURAL_DIM * kernel_len
    )


def _fused_fwd(x, day_weights, day_bias, day_idxs, sigma, kernel_len, stride):
    # partitioned wrapper, not the raw impl: GSPMD would all-gather the
    # opaque custom call on real hardware (see gru._vjp_fwd note)
    out = _fwd_partitioned(sigma, kernel_len, stride)(
        x, day_weights, day_bias, day_idxs
    )
    return out, (x, day_weights, day_bias, day_idxs)


def _fused_bwd(sigma, kernel_len, stride, residuals, g):
    x, day_weights, day_bias, day_idxs = residuals
    dx, dw_contrib, db_contrib = _bwd_partitioned(sigma, kernel_len, stride)(
        x, day_weights, day_bias, day_idxs, g
    )
    n_days = day_weights.shape[0]
    dw = jax.ops.segment_sum(dw_contrib, day_idxs, num_segments=n_days)
    db = jax.ops.segment_sum(db_contrib, day_idxs, num_segments=n_days)
    return dx, dw, db, None


def _fused_bwd_impl(x, day_weights, day_bias, day_idxs, g, sigma, kernel_len, stride):
    b, t_len, c = x.shape
    t_out = (t_len - kernel_len) // stride + 1
    taps = tuple(float(v) for v in _gauss_taps(sigma))

    kern = functools.partial(
        _bwd_kernel,
        taps=taps,
        kernel_len=kernel_len,
        stride=stride,
        t_len=t_len,
        t_out=t_out,
    )
    g = jnp.transpose(
        g.reshape(b, t_out, NEURAL_DIM, kernel_len), (0, 3, 1, 2)
    )  # back to (B, k, T', C)
    in_specs = _day_specs(t_len, t_out, kernel_len) + [
        pl.BlockSpec(
            (1, kernel_len, t_out, NEURAL_DIM),
            lambda bb, day_ref: (bb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, t_len, NEURAL_DIM),
                lambda bb, day_ref: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NEURAL_DIM, NEURAL_DIM),
                lambda bb, day_ref: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, NEURAL_DIM),
                lambda bb, day_ref: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    dx, dw_contrib, db_contrib = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, t_len, NEURAL_DIM), jnp.float32),
            jax.ShapeDtypeStruct((b, NEURAL_DIM, NEURAL_DIM), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, NEURAL_DIM), jnp.float32),
        ],
        interpret=_interpret(),
    )(day_idxs, x.astype(jnp.float32), day_weights, day_bias, g.astype(jnp.float32))
    return dx, dw_contrib, db_contrib


fused_preproc.defvjp(_fused_fwd, _fused_bwd)


def apply_preproc_pallas(
    params: dict,
    x: jnp.ndarray,
    day_idxs: jnp.ndarray,
    input_lens: jnp.ndarray,
    sigma: float,
    kernel_len: int = 32,
    stride: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for models.preprocessing.apply_preproc (same signature shape)."""
    feats = fused_preproc(
        x,
        params["day_weights"],
        params["day_bias"],
        day_idxs,
        sigma,
        kernel_len,
        stride,
    )
    return feats, preproc_out_lens(input_lens, kernel_len, stride)
