"""On-device trial-day-dependent preprocessing chain (functional JAX).

TPU-native equivalent of the reference B2P2TModel (ref:
src/model/b2p2t_model.py:93-183): gaussian temporal smoothing (fixed-weight
depthwise conv, kernel 20), day-conditioned affine (einsum over per-day
256x256 matrices), softsign, and a sliding-window unfold (kernel 32, stride
4) that patches 32 frames x 256 channels into 8192-dim vectors.

Everything is elementwise / depthwise-conv / gather — XLA fuses the chain
into the surrounding jit; a fused Pallas kernel variant lives in
ops/pallas_preproc.py for the hot path.

Quirks reproduced deliberately:
- length transform has no +1: out_lens = (input_lens - kernel) // stride
  (ref: b2p2t_model.py:169-173) while the actual unfold emits
  (T - kernel)//stride + 1 windows; CTC masks the difference.
- the reference creates 24 unused `inpLayer{i}` Linears (identity+noise init,
  never called; ref: b2p2t_model.py:129-136). They are kept in the param
  pytree for checkpoint-schema parity but masked out of optimization and
  never applied.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

N_DAYS = 24
NEURAL_DIM = 256
GAUSS_KERNEL_SIZE = 20


def gaussian_kernel(kernel_size: int, sigma: float) -> jnp.ndarray:
    """Normalized 1-D gaussian taps; mean (size-1)/2 (ref: b2p2t_model.py:44-62)."""
    grid = jnp.arange(kernel_size, dtype=jnp.float32)
    mean = (kernel_size - 1) / 2.0
    k = (1.0 / (sigma * math.sqrt(2 * math.pi))) * jnp.exp(
        -(((grid - mean) / sigma) ** 2) / 2
    )
    return k / jnp.sum(k)


def init_preproc_params(rng, cfg) -> dict:
    """Params for the day-affine (+ dead inpLayer parity weights)."""
    k1, k2 = jax.random.split(rng)
    day_weights = jnp.tile(
        jnp.eye(NEURAL_DIM, dtype=jnp.float32)[None], (N_DAYS, 1, 1)
    )
    day_bias = jnp.zeros((N_DAYS, 1, NEURAL_DIM), jnp.float32)
    # Dead parity params: torch Linear init + identity added to the weight
    # (ref: b2p2t_model.py:129-136). Stacked (24, out, in) like torch layout.
    bound = 1.0 / math.sqrt(NEURAL_DIM)
    inp_w = (
        jax.random.uniform(
            k1, (N_DAYS, NEURAL_DIM, NEURAL_DIM), jnp.float32, -bound, bound
        )
        + jnp.eye(NEURAL_DIM, dtype=jnp.float32)[None]
    )
    inp_b = jax.random.uniform(
        k2, (N_DAYS, NEURAL_DIM), jnp.float32, -bound, bound
    )
    return {
        "day_weights": day_weights,
        "day_bias": day_bias,
        "inp_layers": {"weight": inp_w, "bias": inp_b},  # dead, parity only
    }


def gaussian_smooth(x: jnp.ndarray, smooth_kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' conv over time. x: (B, T, C).

    torch F.conv1d(padding='same') with even kernel k pads (k-1)//2 left and
    k//2 right; replicated exactly.
    """
    k = smooth_kernel.shape[0]
    c = x.shape[-1]
    # kernel layout (spatial, in/groups, out) for ('NTC','TIO','NTC')
    rhs = jnp.tile(smooth_kernel[:, None, None], (1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1,),
        padding=[((k - 1) // 2, k // 2)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=c,
    )


def day_affine_softsign(
    x: jnp.ndarray, params: dict, day_idxs: jnp.ndarray
) -> jnp.ndarray:
    """x @ day_weights[day] + day_bias[day], then softsign
    (ref: b2p2t_model.py:155-159)."""
    w = params["day_weights"][day_idxs]  # (B, C, C)
    b = params["day_bias"][day_idxs]  # (B, 1, C)
    y = jnp.einsum("btd,bdk->btk", x, w, preferred_element_type=jnp.float32) + b
    return jax.nn.soft_sign(y)


def unfold_time(x: jnp.ndarray, kernel_len: int, stride: int) -> jnp.ndarray:
    """Sliding windows over time, flattened channel-major.

    x: (B, T, C) -> (B, T', C*kernel_len) with T' = (T-kernel)//stride + 1.
    Feature ordering matches torch nn.Unfold on (B, C, T, 1): index =
    c*kernel_len + k (channel-major, ref: b2p2t_model.py:108-113,162-167).
    """
    b, t, c = x.shape
    t_out = (t - kernel_len) // stride + 1
    starts = jnp.arange(t_out) * stride  # (T',)
    idx = starts[:, None] + jnp.arange(kernel_len)[None, :]  # (T', k)
    windows = x[:, idx, :]  # (B, T', k, C)
    windows = jnp.transpose(windows, (0, 1, 3, 2))  # (B, T', C, k)
    return windows.reshape(b, t_out, c * kernel_len)


def preproc_out_lens(
    input_lens: jnp.ndarray, kernel_len: int, stride: int
) -> jnp.ndarray:
    """(L - kernel) // stride, truncated toward zero like the reference's
    float-div + int32 cast (ref: b2p2t_model.py:169-173)."""
    return ((input_lens - kernel_len) // stride).astype(jnp.int32)


def apply_preproc(
    params: dict,
    x: jnp.ndarray,
    day_idxs: jnp.ndarray,
    input_lens: jnp.ndarray,
    smooth_kernel: jnp.ndarray,
    kernel_len: int = 32,
    stride: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full chain: smooth -> day affine -> softsign -> unfold.

    Returns (features (B, T', C*kernel_len), out_lens (B,)).
    """
    x = gaussian_smooth(x, smooth_kernel)
    x = day_affine_softsign(x, params, day_idxs)
    feats = unfold_time(x, kernel_len, stride)
    return feats, preproc_out_lens(input_lens, kernel_len, stride)


def in_size_after_preprocessing(unfolder_kernel_len: int) -> int:
    return NEURAL_DIM * unfolder_kernel_len
