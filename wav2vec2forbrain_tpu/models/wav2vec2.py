"""Wav2Vec2 transformer encoder (feature-extractor-free) in functional JAX.

TPU-native re-implementation of the encoder stack the reference uses after
chopping off the audio conv feature extractor
(ref: src/model/w2v_custom_feat_extractor.py:139-191, which wraps HF
Wav2Vec2Encoder / Wav2Vec2EncoderStableLayerNorm + the ForCTC lm_head).

Architecture (post-LN / do_stable_layer_norm=False, e.g. base-960h):
    x = x + pos_conv(x); x = LN(x); x = dropout(x)
    per layer: x = LN(x + attn(x)); x = finalLN(x + ffn(x))
Pre-LN (stable, e.g. large-960h):
    x = x + pos_conv(x); x = dropout(x)
    per layer: x = x + attn(LN(x)); x = x + ffn(finalLN'(x)); final encoder LN

No attention mask is used anywhere — the reference always passes
attention_mask=None (ref: w2v_custom_feat_extractor.py:176-181), so padded
positions participate in softmax. Reproduced exactly.

Attention is a plain dense softmax(QK^T)V — sequence lengths here are
~25-170 post-unfold, far below where flash-style blocking pays off; matmuls
are kept large and bf16-castable for the MXU.
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wav2vec2forbrain_tpu.models.activations import ACT2FN
from wav2vec2forbrain_tpu.models.fc import apply_linear, init_linear


@dataclass
class Wav2Vec2EncoderConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    final_dropout: float = 0.1
    layerdrop: float = 0.1
    layer_norm_eps: float = 1e-5
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    vocab_size: int = 32
    feat_extract_activation: str = "gelu"

    @classmethod
    def base_960h(cls) -> "Wav2Vec2EncoderConfig":
        return cls()

    @classmethod
    def large_960h(cls) -> "Wav2Vec2EncoderConfig":
        return cls(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            do_stable_layer_norm=True,
        )

    @classmethod
    def tiny_test(cls, **kw) -> "Wav2Vec2EncoderConfig":
        d = dict(
            hidden_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )
        d.update(kw)
        return cls(**d)


# --- init ---------------------------------------------------------------------


def _init_layer_norm(size: int) -> dict:
    return {"scale": jnp.ones((size,), jnp.float32), "bias": jnp.zeros((size,), jnp.float32)}


def init_w2v_encoder_params(rng, cfg: Wav2Vec2EncoderConfig) -> dict:
    h = cfg.hidden_size
    k = cfg.num_conv_pos_embeddings
    groups = cfg.num_conv_pos_embedding_groups
    rng, kc, kb = jax.random.split(rng, 3)
    # torch conv default init: kaiming_uniform on (out, in/groups, k)
    fan_in = (h // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    v = jax.random.uniform(
        kc, (h, h // groups, k), jnp.float32, -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound
    )
    # weight_norm init: g = ||v|| over dims (0,1) per k
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    pos_conv = {
        "weight_g": g,
        "weight_v": v,
        "bias": jax.random.uniform(kb, (h,), jnp.float32, -bound, bound),
    }
    layers = []
    for _ in range(cfg.num_hidden_layers):
        rng, k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 7)
        layers.append(
            {
                "attention": {
                    "q_proj": init_linear(k1, h, h),
                    "k_proj": init_linear(k2, h, h),
                    "v_proj": init_linear(k3, h, h),
                    "out_proj": init_linear(k4, h, h),
                },
                "layer_norm": _init_layer_norm(h),
                "feed_forward": {
                    "intermediate_dense": init_linear(k5, h, cfg.intermediate_size),
                    "output_dense": init_linear(k6, cfg.intermediate_size, h),
                },
                "final_layer_norm": _init_layer_norm(h),
            }
        )
    params = {
        "pos_conv": pos_conv,
        "layer_norm": _init_layer_norm(h),
        "layers": layers,
    }
    if cfg.do_stable_layer_norm:
        # HF stable-layer-norm encoder shares the name "layer_norm" for its
        # final norm; we keep one entry and apply it at the end instead.
        pass
    return params


def init_lm_head_params(rng, cfg: Wav2Vec2EncoderConfig) -> dict:
    return init_linear(rng, cfg.hidden_size, cfg.vocab_size)


# --- forward ------------------------------------------------------------------


def _layer_norm(p: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _layer_norm_routed(p: dict, x: jnp.ndarray, eps: float, use_pallas: bool):
    """LN with per-kernel routing. The fused kernel wins isolated but loses
    e2e to fusion-boundary costs, so "auto" keeps LN on XLA; explicit
    policies can still select it (measurements: ops/pallas_layernorm.py)."""
    from wav2vec2forbrain_tpu.ops.select import kernel_enabled

    if x.ndim == 3 and kernel_enabled("layernorm", use_pallas, x.dtype):
        from wav2vec2forbrain_tpu.ops.pallas_layernorm import layer_norm_fused

        return layer_norm_fused(x, p["scale"], p["bias"], eps)
    return _layer_norm(p, x, eps)


def _dropout(rng, x: jnp.ndarray, rate: float, train: bool):
    if not train or rate <= 0.0:
        return rng, x
    from wav2vec2forbrain_tpu.ops.select import kernel_enabled

    if kernel_enabled("dropout", True, x.dtype):
        # stateless hash dropout: the custom VJP recomputes the mask in the
        # backward, so no pred residual round-trips HBM (ops/hash_dropout.py)
        from wav2vec2forbrain_tpu.ops.hash_dropout import dropout_with_rng

        return dropout_with_rng(rng, x, rate, train)
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - rate, x.shape)
    return rng, jnp.where(keep, x / (1.0 - rate), 0.0)


def layerdrop_mask(rng, num_layers: int, layerdrop: float, train: bool):
    """HF LayerDrop decisions (arXiv 1909.11556): in train mode layer i is
    skipped when u_i ~ U[0,1) < layerdrop — the semantics HF applies inside
    the encoders the reference fine-tunes through
    (ref: src/model/w2v_custom_feat_extractor.py:167-191 wraps
    Wav2Vec2Encoder, which rolls a per-layer rand each step).

    Returns (mask (L,) bool with True = skip, rng) or (None, rng) when
    inactive. Under jit the skipped layer is still COMPUTED; its contribution
    is where-masked out, keeping shapes and control flow static (XLA-friendly
    — a dropped layer costs its FLOPs but no recompile/divergence)."""
    if not train or layerdrop <= 0.0 or rng is None:
        return None, rng
    rng, sub = jax.random.split(rng)
    return jax.random.uniform(sub, (num_layers,)) < layerdrop, rng


def pos_conv_embed(p: dict, x: jnp.ndarray, cfg: Wav2Vec2EncoderConfig) -> jnp.ndarray:
    """Grouped weight-normed conv positional embedding. x: (B, T, H)."""
    g = p["weight_g"]  # (1, 1, k)
    v = p["weight_v"]  # (out, in/groups, k)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    w = g * v / jnp.maximum(norm, 1e-12)
    # torch conv weight (out, in/groups, k) -> ('NTC','TIO','NTC') kernel (k, in/groups, out)
    rhs = jnp.transpose(w, (2, 1, 0)).astype(x.dtype)
    k = cfg.num_conv_pos_embeddings
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
    )
    # bf16 stream: conv accumulates f32 on the MXU regardless; the f32 bias
    # add promotes, so cast back to the stream dtype
    y = (y + p["bias"]).astype(x.dtype)
    if k % 2 == 0:  # SamePadLayer: trim the extra right output
        y = y[:, : x.shape[1], :]
    return ACT2FN[cfg.feat_extract_activation](y)


def attention(
    p: dict,
    x: jnp.ndarray,
    num_heads: int,
    rng=None,
    dropout: float = 0.0,
    train: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, Optional[jax.Array]]:
    """HF Wav2Vec2Attention (Bart-style): q scaled by head_dim**-0.5."""
    b, t, h = x.shape
    head_dim = h // num_heads
    cd = compute_dtype or x.dtype

    from jax.ad_checkpoint import checkpoint_name

    sd = x.dtype
    # "blk": block-boundary saves for the 'blocks' remat policy (see
    # remat_layer_fn) — q/k/v feed the attention custom-VJP, the rest of
    # the layer recomputes from them + the layer input
    q = checkpoint_name(
        apply_linear(p["q_proj"], x, cd, out_dtype=sd) * (head_dim**-0.5),
        "blk",
    )
    k = checkpoint_name(apply_linear(p["k_proj"], x, cd, out_dtype=sd), "blk")
    v = checkpoint_name(apply_linear(p["v_proj"], x, cd, out_dtype=sd), "blk")

    from wav2vec2forbrain_tpu.ops.pallas_attention import mha_with_rng

    # one route for every backend: mha_with_rng dispatches Pallas kernel vs
    # XLA-BTH dense by the kernel policy (identical dropout streams either
    # way). Operands stay (B, T, H·D) — the projections' native layout. q
    # is pre-scaled above (Bart quirk) -> attention scale 1
    ctx, rng = mha_with_rng(
        q, k, v, num_heads, 1.0, dropout, rng, train, cd,
        use_pallas=use_pallas,
    )
    ctx = checkpoint_name(ctx, "blk")
    return (
        checkpoint_name(
            apply_linear(p["out_proj"], ctx, cd, out_dtype=sd), "blk"
        ),
        rng,
    )


def feed_forward(
    p: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2EncoderConfig,
    rng=None,
    train: bool = False,
    compute_dtype=None,
):
    from jax.ad_checkpoint import checkpoint_name

    sd = x.dtype  # activation-stream dtype: blocks emit what they receive
    act = ACT2FN[cfg.hidden_act]
    y = apply_linear(p["intermediate_dense"], x, compute_dtype, out_dtype=sd)
    # name every (B, T, intermediate)-wide tensor: the 'all_but_wide' remat
    # policy saves ALL other intermediates and recomputes only these (they
    # dominate per-layer activation memory ~4:1)
    y = checkpoint_name(y, "ffn_wide")
    y = checkpoint_name(act(y), "ffn_wide")
    rng, y = _dropout(rng, y, cfg.activation_dropout, train)
    y = checkpoint_name(y, "ffn_wide")
    y = apply_linear(p["output_dense"], y, compute_dtype, out_dtype=sd)
    rng, y = _dropout(rng, y, cfg.hidden_dropout, train)
    return checkpoint_name(y, "blk"), rng


def encoder_layer(
    p: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2EncoderConfig,
    rng=None,
    train: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, Optional[jax.Array]]:
    if cfg.do_stable_layer_norm:
        residual = x
        y = _layer_norm_routed(p["layer_norm"], x, cfg.layer_norm_eps, use_pallas)
        y, rng = attention(
            p["attention"], y, cfg.num_attention_heads, rng,
            cfg.attention_dropout, train, compute_dtype, use_pallas,
        )
        rng, y = _dropout(rng, y, cfg.hidden_dropout, train)
        x = residual + y
        ff_in = _layer_norm_routed(
            p["final_layer_norm"], x, cfg.layer_norm_eps, use_pallas
        )
        y, rng = feed_forward(
            p["feed_forward"], ff_in, cfg, rng, train, compute_dtype
        )
        x = x + y
    else:
        residual = x
        y, rng = attention(
            p["attention"], x, cfg.num_attention_heads, rng,
            cfg.attention_dropout, train, compute_dtype, use_pallas,
        )
        rng, y = _dropout(rng, y, cfg.hidden_dropout, train)
        x = residual + y
        x = _layer_norm_routed(p["layer_norm"], x, cfg.layer_norm_eps, use_pallas)
        y, rng = feed_forward(p["feed_forward"], x, cfg, rng, train, compute_dtype)
        x = x + y
        x = _layer_norm_routed(
            p["final_layer_norm"], x, cfg.layer_norm_eps, use_pallas
        )
    return x, rng


def apply_w2v_encoder(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2EncoderConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Full encoder. x: (B, T, H) -> (B, T, H). Train-mode LayerDrop matches
    torch semantics (see layerdrop_mask); eval never drops."""
    pos = pos_conv_embed(params["pos_conv"], x, cfg)
    x = x + pos
    if not cfg.do_stable_layer_norm:
        x = _layer_norm_routed(
            params["layer_norm"], x, cfg.layer_norm_eps, use_pallas
        )
    rng, x = _dropout(rng, x, cfg.hidden_dropout, train)
    drop, rng = layerdrop_mask(rng, len(params["layers"]), cfg.layerdrop, train)
    for i, layer in enumerate(params["layers"]):
        y, rng = encoder_layer(
            layer, x, cfg, rng, train, compute_dtype, use_pallas
        )
        x = y if drop is None else jnp.where(drop[i], x, y)
    if cfg.do_stable_layer_norm:
        x = _layer_norm_routed(
            params["layer_norm"], x, cfg.layer_norm_eps, use_pallas
        )
    return x


def _dots_nowide_policy(wide_dim: int):
    """dots_saveable minus 'wide' matmul outputs (feature dim >= wide_dim).

    wide_dim is the encoder's FFN intermediate size, so the banned outputs
    are exactly the conformer/w2v FFN up-projection intermediates —
    the single biggest saved residual per layer ((B,T,4096) f32) and the
    cheapest to recompute (one matmul from an input this policy DOES save).
    Banning just those keeps the scanned backward nearly recompute-free at
    ~half the residual memory of full dots_saveable."""
    def policy(prim, *avals, **params):
        if prim.name != "dot_general":
            return False
        (_, rc), (_, rb) = params["dimension_numbers"]
        rhs = avals[1]
        banned = set(rc) | set(rb)
        out_n = [
            rhs.shape[i] for i in range(len(rhs.shape)) if i not in banned
        ]
        return max(out_n, default=0) < wide_dim

    return policy


def remat_layer_fn(fn, policy_name: str, wide_dim: int = 4096):
    """Wrap a scan-body layer fn in jax.checkpoint per the configured policy.

    Under scan, XLA cannot rematerialize across iterations on its own and
    training OOMs HBM without remat. 'min' (dots_with_no_batch_dims_saveable)
    always fits; 'dots' keeps every matmul output (fewest backward
    recomputes, ~60M over v5e HBM at the headline batch even with the Pallas
    attention kernel's savings); 'dots_nowide' is 'dots' minus the (B,T,wide_dim)
    FFN intermediates (wide_dim = the config's intermediate_size);
    'blocks' saves ONLY the checkpoint_name'd block-boundary tensors
    (q/k/v, attention/ffn/conv outputs — activation-stream dtype, so bf16
    under --activation_dtype, where dots policies pin f32 pre-cast matmul
    outputs) and recomputes the glue between them; 'all_but_wide' saves
    EVERY intermediate except the (B,T,wide) 'ffn_wide'-named FFN tensors
    (fits only small shapes); 'none' disables remat (scan saves all
    per-iteration residuals — small configs only)."""
    if policy_name == "none":
        return fn
    policy = {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_nowide": _dots_nowide_policy(wide_dim),
        "blocks": jax.checkpoint_policies.save_only_these_names("blk"),
        "all_but_wide": jax.checkpoint_policies.save_anything_except_these_names(
            "ffn_wide"
        ),
        "min": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }[policy_name]
    return jax.checkpoint(fn, policy=policy)


def stack_w2v_layers(params: dict) -> dict:
    """Per-layer lists -> stacked arrays (scan-over-layers; see conformer)."""
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *params["layers"]
    )
    new_p = {k: v for k, v in params.items() if k != "layers"}
    new_p["layers_stacked"] = stacked
    return new_p


def unstack_w2v_layers(params: dict, num_layers: int) -> dict:
    layers = [
        jax.tree_util.tree_map(lambda a: a[i], params["layers_stacked"])
        for i in range(num_layers)
    ]
    new_p = {k: v for k, v in params.items() if k != "layers_stacked"}
    new_p["layers"] = layers
    return new_p


def apply_w2v_encoder_scanned(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2EncoderConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=None,
    use_pallas: bool = False,
    remat_policy: str = "min",
) -> jnp.ndarray:
    """apply_w2v_encoder with the layer loop as one lax.scan (remat'd)."""
    pos = pos_conv_embed(params["pos_conv"], x, cfg)
    x = x + pos
    if not cfg.do_stable_layer_norm:
        x = _layer_norm_routed(
            params["layer_norm"], x, cfg.layer_norm_eps, use_pallas
        )
    rng, x = _dropout(rng, x, cfg.hidden_dropout, train)
    num_layers = jax.tree_util.tree_leaves(params["layers_stacked"])[0].shape[0]
    drop, rng = layerdrop_mask(rng, num_layers, cfg.layerdrop, train)

    def layer_fn(p_layer, h, layer_rng):
        h, _ = encoder_layer(
            p_layer, h, cfg, layer_rng, train, compute_dtype, use_pallas
        )
        return h

    layer_fn = remat_layer_fn(layer_fn, remat_policy, cfg.intermediate_size)

    def body(carry, xs):
        h, key = carry
        p_layer, d = xs
        layer_rng = None
        if key is not None:
            key, layer_rng = jax.random.split(key)
        h_new = layer_fn(p_layer, h, layer_rng)
        h = h_new if d is None else jnp.where(d, h, h_new)
        return (h, key), None

    (x, _), _ = jax.lax.scan(body, (x, rng), (params["layers_stacked"], drop))
    if cfg.do_stable_layer_norm:
        x = _layer_norm_routed(
            params["layer_norm"], x, cfg.layer_norm_eps, use_pallas
        )
    return x


def apply_lm_head(
    params: dict,
    hidden: jnp.ndarray,
    cfg: Wav2Vec2EncoderConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """ForCTC head: final_dropout then vocab projection
    (ref: w2v_custom_feat_extractor.py:144-153)."""
    rng, hidden = _dropout(rng, hidden, cfg.final_dropout, train)
    return apply_linear(params, hidden, compute_dtype)
