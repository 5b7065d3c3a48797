"""Wav2Vec2-Conformer encoder (rotary position embeddings) in functional JAX.

TPU-native re-implementation of the paper-headline backbone
(wav2vec2-conformer-rope-large-960h-ft; ref:
src/model/w2v_conformer_custom_feat_extractor.py:62-112 wrapping HF
Wav2Vec2ConformerEncoder). Per block (macaron):

    x = x + 0.5 * ffn1(LN(x))
    x = x + dropout(attn_rope(LN(x)))
    x = x + conv_module(x)          # LN -> pw-conv(GLU) -> dw-conv -> BN -> swish -> pw-conv
    x = LN(x + 0.5 * ffn2(LN(x)))   # final per-block LN
then a final encoder LayerNorm.

RoPE is applied to the *hidden states* before the q/k projections (HF quirk,
reproduced bit-for-bit so the pretrained checkpoint transfers). The HF module
also owns a positional conv embedding that its forward never calls — those
params are kept for checkpoint parity and masked from optimization, like the
reference's dead inpLayers.

BatchNorm running statistics live in a separate mutable `state` pytree; train
mode uses batch statistics and returns updated running stats.
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wav2vec2forbrain_tpu.models.activations import ACT2FN
from wav2vec2forbrain_tpu.models.fc import apply_linear, init_linear
from wav2vec2forbrain_tpu.models.wav2vec2 import (
    _dropout,
    _layer_norm,
    _layer_norm_routed,
)


@dataclass
class ConformerEncoderConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    # HF config default; the released rope-large-960h-ft checkpoint's
    # config.json specifies "swish" (see rope_large_960h()).
    hidden_act: str = "gelu"
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    conformer_conv_dropout: float = 0.1
    final_dropout: float = 0.1
    layerdrop: float = 0.1
    layer_norm_eps: float = 1e-5
    conv_depthwise_kernel_size: int = 31
    rotary_embedding_base: int = 10000
    position_embeddings_type: str = "rotary"
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    vocab_size: int = 32
    feat_extract_activation: str = "gelu"
    batch_norm_momentum: float = 0.1
    batch_norm_eps: float = 1e-5

    @classmethod
    def rope_large_960h(cls) -> "ConformerEncoderConfig":
        return cls(hidden_act="swish")

    @classmethod
    def tiny_test(cls, **kw) -> "ConformerEncoderConfig":
        d = dict(
            hidden_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            conv_depthwise_kernel_size=31,
        )
        d.update(kw)
        return cls(**d)


# --- init ----------------------------------------------------------------------


def _init_layer_norm(size: int) -> dict:
    return {
        "scale": jnp.ones((size,), jnp.float32),
        "bias": jnp.zeros((size,), jnp.float32),
    }


def _init_conv1d_kernel(rng, shape_torch, fan_in) -> jnp.ndarray:
    """torch Conv1d kaiming-uniform init; shape given in torch layout then
    converted by caller."""
    bound = math.sqrt(3.0) / math.sqrt(fan_in)
    return jax.random.uniform(rng, shape_torch, jnp.float32, -bound, bound)


def init_conformer_layer_params(rng, cfg: ConformerEncoderConfig) -> dict:
    h = cfg.hidden_size
    ks = cfg.conv_depthwise_kernel_size
    keys = jax.random.split(rng, 12)
    return {
        "ffn1_layer_norm": _init_layer_norm(h),
        "ffn1": {
            "intermediate_dense": init_linear(keys[0], h, cfg.intermediate_size),
            "output_dense": init_linear(keys[1], cfg.intermediate_size, h),
        },
        "self_attn_layer_norm": _init_layer_norm(h),
        "self_attn": {
            "linear_q": init_linear(keys[2], h, h),
            "linear_k": init_linear(keys[3], h, h),
            "linear_v": init_linear(keys[4], h, h),
            "linear_out": init_linear(keys[5], h, h),
        },
        "conv_module": {
            "layer_norm": _init_layer_norm(h),
            # stored in ('NTC','TIO','NTC')-friendly layouts:
            # pointwise: (in, out); depthwise: (k, 1, C)
            "pointwise_conv1": {
                "kernel": _init_conv1d_kernel(keys[6], (h, 2 * h), h)
            },
            "depthwise_conv": {
                "kernel": _init_conv1d_kernel(keys[7], (ks, 1, h), ks)
            },
            "batch_norm": {
                "scale": jnp.ones((h,), jnp.float32),
                "bias": jnp.zeros((h,), jnp.float32),
            },
            "pointwise_conv2": {
                "kernel": _init_conv1d_kernel(keys[8], (h, h), h)
            },
        },
        "ffn2_layer_norm": _init_layer_norm(h),
        "ffn2": {
            "intermediate_dense": init_linear(keys[9], h, cfg.intermediate_size),
            "output_dense": init_linear(keys[10], cfg.intermediate_size, h),
        },
        "final_layer_norm": _init_layer_norm(h),
    }


def init_conformer_encoder_params(rng, cfg: ConformerEncoderConfig) -> dict:
    h = cfg.hidden_size
    k = cfg.num_conv_pos_embeddings
    groups = cfg.num_conv_pos_embedding_groups
    rng, kc, kb = jax.random.split(rng, 3)
    fan_in = (h // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    v = jax.random.uniform(
        kc, (h, h // groups, k), jnp.float32,
        -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound,
    )
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    layers = []
    for _ in range(cfg.num_hidden_layers):
        rng, sub = jax.random.split(rng)
        layers.append(init_conformer_layer_params(sub, cfg))
    return {
        # dead parity params (HF owns them, never applies them in forward)
        "pos_conv": {
            "weight_g": g,
            "weight_v": v,
            "bias": jax.random.uniform(kb, (h,), jnp.float32, -bound, bound),
        },
        "layer_norm": _init_layer_norm(h),
        "layers": layers,
    }


def init_conformer_state(cfg: ConformerEncoderConfig) -> dict:
    h = cfg.hidden_size
    return {
        "layers": [
            {
                "batch_norm": {
                    "mean": jnp.zeros((h,), jnp.float32),
                    "var": jnp.ones((h,), jnp.float32),
                }
            }
            for _ in range(cfg.num_hidden_layers)
        ]
    }


# --- rotary ----------------------------------------------------------------------


def rotary_cos_sin(
    seq_len: int, head_size: int, base: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_size, 2, dtype=jnp.float32) / head_size)
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, head_size)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, num_heads: int):
    """HF quirk: rotate the hidden states (B, T, H) before q/k projection."""
    b, t, h = x.shape
    head = h // num_heads
    xh = x.reshape(b, t, num_heads, head)
    x1 = xh[..., : head // 2]
    x2 = xh[..., head // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = xh * cos[None, :, None, :] + rotated * sin[None, :, None, :]
    # keep the activation stream's dtype (f32 cos/sin promote bf16 inputs)
    return out.reshape(b, t, h).astype(x.dtype)


# --- blocks -----------------------------------------------------------------------


def conformer_feed_forward(p, x, cfg, rng, train, compute_dtype):
    from jax.ad_checkpoint import checkpoint_name

    sd = x.dtype  # activation-stream dtype: blocks emit what they receive
    act = ACT2FN[cfg.hidden_act]
    y = apply_linear(p["intermediate_dense"], x, compute_dtype, out_dtype=sd)
    # name every (B, T, intermediate)-wide tensor for the 'all_but_wide'
    # remat policy (see wav2vec2.remat_layer_fn): everything else is saved,
    # only these are recomputed in the backward
    y = checkpoint_name(y, "ffn_wide")
    y = checkpoint_name(act(y), "ffn_wide")
    rng, y = _dropout(rng, y, cfg.activation_dropout, train)
    y = checkpoint_name(y, "ffn_wide")
    y = apply_linear(p["output_dense"], y, compute_dtype, out_dtype=sd)
    rng, y = _dropout(rng, y, cfg.hidden_dropout, train)
    return checkpoint_name(y, "blk"), rng


def conformer_self_attention(
    p, x, cfg: ConformerEncoderConfig, cos, sin, rng, train, compute_dtype,
    use_pallas=False,
):
    b, t, h = x.shape
    heads = cfg.num_attention_heads
    head = h // heads
    cd = compute_dtype or x.dtype

    from jax.ad_checkpoint import checkpoint_name

    sd = x.dtype
    qk_states = _apply_rotary(x, cos, sin, heads)
    # "blk" marks the block-boundary tensors the 'blocks' remat policy
    # saves (activation-stream dtype, so bf16 under --activation_dtype):
    # q/k/v feed the attention custom-VJP (which keeps its own residuals),
    # everything else in the layer is recomputed from them + the layer input
    q = checkpoint_name(
        apply_linear(p["linear_q"], qk_states, cd, out_dtype=sd), "blk"
    )
    k = checkpoint_name(
        apply_linear(p["linear_k"], qk_states, cd, out_dtype=sd), "blk"
    )
    v = checkpoint_name(
        apply_linear(p["linear_v"], x, cd, out_dtype=sd), "blk"
    )

    from wav2vec2forbrain_tpu.ops.pallas_attention import mha_with_rng

    # one route for every backend: mha_with_rng dispatches Pallas kernel vs
    # XLA-BTH dense by the kernel policy (identical dropout streams either
    # way). Operands stay (B, T, H·D) — exactly as the projections emit
    # them, no reshapes/transposes on either side.
    ctx, rng = mha_with_rng(
        q, k, v, heads, 1.0 / math.sqrt(head), cfg.attention_dropout,
        rng, train, cd, use_pallas=use_pallas,
    )
    ctx = checkpoint_name(ctx, "blk")
    return (
        checkpoint_name(
            apply_linear(p["linear_out"], ctx, cd, out_dtype=sd), "blk"
        ),
        rng,
    )


def _batch_norm(
    p: dict,
    state: dict,
    x: jnp.ndarray,
    cfg: ConformerEncoderConfig,
    train: bool,
) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm over channels of (B, T, C): stats over (B, T).

    torch semantics: normalize with biased batch var in train, update running
    var with the unbiased estimate; eval uses running stats.
    """
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1))
        var = jnp.var(x32, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / jnp.maximum(n - 1, 1)
        m = cfg.batch_norm_momentum
        new_state = {
            "mean": (1 - m) * state["mean"] + m * mean,
            "var": (1 - m) * state["var"] + m * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    # normalize in f32 (mean/var promote), emit in the caller's stream
    # dtype — a no-op at f32, halved traffic on a bf16 stream
    y = (x - mean) * jax.lax.rsqrt(var + cfg.batch_norm_eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype), new_state


def conformer_conv_module(
    p, state, x, cfg: ConformerEncoderConfig, rng, train, compute_dtype,
    use_pallas: bool = False,
):
    from jax.ad_checkpoint import checkpoint_name

    cd = compute_dtype or x.dtype
    sd = x.dtype
    y = _layer_norm_routed(p["layer_norm"], x, cfg.layer_norm_eps, use_pallas)
    # pointwise conv1 (k=1, no bias) == dense to 2C, then GLU over channels
    y = jnp.dot(
        y.astype(cd), p["pointwise_conv1"]["kernel"].astype(cd),
        preferred_element_type=jnp.float32,
    ).astype(sd)
    # the conv module's (B,T,2C) and (B,T,C) tensors are the other big
    # per-layer activations; they ride the ACTIVATION-STREAM dtype (a no-op
    # at f32; under --activation_dtype=bfloat16 this halves the conv path's
    # HBM traffic — the r4 path kept them f32 even on a bf16 stream, which
    # made the conv module the worst roofline gap in the step at 17.7 ms vs
    # ~6.5 SOL). BN still computes its statistics in f32 (torch/autocast
    # semantics). Named for the 'all_but_wide' remat policy: recomputed in
    # the backward instead of saving ~GBs of stacks across 24 layers.
    y = checkpoint_name(y, "ffn_wide")
    from wav2vec2forbrain_tpu.ops.select import kernel_enabled

    if kernel_enabled("conv_glu", use_pallas, sd):
        # fused GLU -> depthwise (ops/pallas_conv_glu.py); the grouped conv
        # below is the module's measured non-matmul hot spot under XLA at
        # f32 (XLA's own bf16 conv wins at bf16 — ops/select.py routes).
        # Kernel IO rides the activation-stream dtype (f32 by default).
        from wav2vec2forbrain_tpu.ops.pallas_conv_glu import glu_dwconv

        y = glu_dwconv(
            y.astype(sd), p["depthwise_conv"]["kernel"][:, 0, :], cd
        )
    else:
        a, b_half = jnp.split(y.astype(jnp.float32), 2, axis=-1)
        y = (a * jax.nn.sigmoid(b_half)).astype(sd)
        # depthwise conv k=31, same padding
        ks = cfg.conv_depthwise_kernel_size
        pad = (ks - 1) // 2
        y = jax.lax.conv_general_dilated(
            y.astype(cd),
            p["depthwise_conv"]["kernel"].astype(cd),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=cfg.hidden_size,
        ).astype(sd)
    y = checkpoint_name(y, "ffn_wide")  # dwconv output, stream dtype (B,T,C)
    y, new_bn = _batch_norm(p["batch_norm"], state["batch_norm"], y, cfg, train)
    y = checkpoint_name(y, "ffn_wide")  # BN output, stream dtype (B,T,C)
    y = ACT2FN[cfg.hidden_act](y)
    y = jnp.dot(
        y.astype(cd), p["pointwise_conv2"]["kernel"].astype(cd),
        preferred_element_type=jnp.float32,
    ).astype(sd)
    rng, y = _dropout(rng, y, cfg.conformer_conv_dropout, train)
    return checkpoint_name(y, "blk"), {"batch_norm": new_bn}, rng


def conformer_layer(
    p, state, x, cfg: ConformerEncoderConfig, cos, sin, rng, train,
    compute_dtype, use_pallas=False,
):
    # (LN outputs measured as NOT worth 'blocks'-saving: 144.97 vs
    # 144.26 ms with them named — norm recompute is free next to the
    # saved-stack HBM traffic, so they stay unnamed for memory headroom)
    # FFN1 (half-step)
    residual = x
    y = _layer_norm_routed(p["ffn1_layer_norm"], x, cfg.layer_norm_eps, use_pallas)
    y, rng = conformer_feed_forward(p["ffn1"], y, cfg, rng, train, compute_dtype)
    x = y * 0.5 + residual

    # Self-attention
    residual = x
    y = _layer_norm_routed(
        p["self_attn_layer_norm"], x, cfg.layer_norm_eps, use_pallas
    )
    y, rng = conformer_self_attention(
        p["self_attn"], y, cfg, cos, sin, rng, train, compute_dtype,
        use_pallas,
    )
    rng, y = _dropout(rng, y, cfg.attention_dropout, train)
    x = residual + y

    # Convolution module
    residual = x
    y, new_state, rng = conformer_conv_module(
        p["conv_module"], state, x, cfg, rng, train, compute_dtype,
        use_pallas=use_pallas,
    )
    x = residual + y

    # FFN2 (half-step) + final block LN
    residual = x
    y = _layer_norm_routed(p["ffn2_layer_norm"], x, cfg.layer_norm_eps, use_pallas)
    y, rng = conformer_feed_forward(p["ffn2"], y, cfg, rng, train, compute_dtype)
    x = y * 0.5 + residual
    x = _layer_norm_routed(p["final_layer_norm"], x, cfg.layer_norm_eps, use_pallas)
    return x, new_state, rng


def apply_conformer_encoder(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    cfg: ConformerEncoderConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Full encoder. Returns (hidden (B,T,H), new_state). Train-mode
    LayerDrop matches torch semantics (wav2vec2.layerdrop_mask); a dropped
    layer leaves both the hidden states AND its batch-norm running stats
    untouched, like an HF skip."""
    from wav2vec2forbrain_tpu.models.wav2vec2 import layerdrop_mask

    rng, x = _dropout(rng, x, cfg.hidden_dropout, train)
    head = cfg.hidden_size // cfg.num_attention_heads
    cos, sin = rotary_cos_sin(x.shape[1], head, cfg.rotary_embedding_base)
    drop, rng = layerdrop_mask(rng, len(params["layers"]), cfg.layerdrop, train)
    new_layer_states = []
    for i, (p_layer, s_layer) in enumerate(zip(params["layers"], state["layers"])):
        y, new_s, rng = conformer_layer(
            p_layer, s_layer, x, cfg, cos, sin, rng, train, compute_dtype,
            use_pallas,
        )
        if drop is None:
            x = y
        else:
            x = jnp.where(drop[i], x, y)
            new_s = jax.tree_util.tree_map(
                lambda new, old: jnp.where(drop[i], old, new), new_s, s_layer
            )
        new_layer_states.append(new_s)
    x = _layer_norm_routed(
        params["layer_norm"], x, cfg.layer_norm_eps, use_pallas
    )
    return x, {"layers": new_layer_states}


# --- scan-over-layers variant ---------------------------------------------


def stack_conformer_layers(params: dict, state: dict):
    """Per-layer lists -> stacked arrays with a leading layer dim.

    XLA compiles the 24-layer encoder ~10x faster when the layers are one
    lax.scan body instead of an unrolled chain; numerics are identical.
    Stacking happens ONCE at model build — checkpoints of scanned models
    store the stacked layout."""
    stacked_p = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *params["layers"]
    )
    stacked_s = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *state["layers"]
    )
    new_p = {k: v for k, v in params.items() if k != "layers"}
    new_p["layers_stacked"] = stacked_p
    return new_p, {"layers_stacked": stacked_s}


def unstack_conformer_layers(params: dict, state: dict, num_layers: int):
    """Inverse of stack_conformer_layers (for interop/analysis)."""
    layers = [
        jax.tree_util.tree_map(lambda a: a[i], params["layers_stacked"])
        for i in range(num_layers)
    ]
    states = [
        jax.tree_util.tree_map(lambda a: a[i], state["layers_stacked"])
        for i in range(num_layers)
    ]
    new_p = {k: v for k, v in params.items() if k != "layers_stacked"}
    new_p["layers"] = layers
    return new_p, {"layers": states}


def apply_conformer_encoder_scanned(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    cfg: ConformerEncoderConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
    remat_policy: str = "min",
) -> Tuple[jnp.ndarray, dict]:
    """apply_conformer_encoder with the layer loop as one lax.scan."""
    from wav2vec2forbrain_tpu.models.wav2vec2 import (
        layerdrop_mask,
        remat_layer_fn,
    )

    rng, x = _dropout(rng, x, cfg.hidden_dropout, train)
    head = cfg.hidden_size // cfg.num_attention_heads
    cos, sin = rotary_cos_sin(x.shape[1], head, cfg.rotary_embedding_base)
    num_layers = jax.tree_util.tree_leaves(params["layers_stacked"])[0].shape[0]
    drop, rng = layerdrop_mask(rng, num_layers, cfg.layerdrop, train)

    # remat the layer body: under scan XLA cannot rematerialize across
    # iterations on its own and training OOMs HBM (policy trade-offs
    # documented on remat_layer_fn).
    def layer_fn(p_layer, s_layer, h, layer_rng):
        return conformer_layer(
            p_layer, s_layer, h, cfg, cos, sin, layer_rng, train,
            compute_dtype, use_pallas,
        )

    layer_fn = remat_layer_fn(layer_fn, remat_policy, cfg.intermediate_size)

    def body(carry, layer_in):
        h, key = carry
        p_layer, s_layer, d = layer_in
        layer_rng = None
        if key is not None:
            key, layer_rng = jax.random.split(key)
        h_new, new_s, _ = layer_fn(p_layer, s_layer, h, layer_rng)
        if d is not None:  # LayerDrop: keep hidden AND BN stats on skip
            h_new = jnp.where(d, h, h_new)
            new_s = jax.tree_util.tree_map(
                lambda new, old: jnp.where(d, old, new), new_s, s_layer
            )
        return (h_new, key), new_s

    (x, _), new_states = jax.lax.scan(
        body,
        (x, rng),
        (params["layers_stacked"], state["layers_stacked"], drop),
    )
    x = _layer_norm_routed(
        params["layer_norm"], x, cfg.layer_norm_eps, use_pallas
    )
    return x, {"layers_stacked": new_states}
