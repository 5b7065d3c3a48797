"""PyTorch state-dict <-> JAX pytree converters.

Used for (a) golden tests against the torch reference implementations and
(b) importing pretrained HF wav2vec2 / wav2vec2-conformer checkpoints from a
local snapshot (ref checkpoints: facebook/wav2vec2-base-960h,
facebook/wav2vec2-conformer-rope-large-960h-ft; ref:
src/model/w2v_custom_feat_extractor.py:36-53).

All converters consume a flat {torch_name: np.ndarray} dict, so they work on
torch .bin/.pt state dicts as well as live modules.
"""

from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    # Always copy: torch .numpy() shares memory with the tensor, and
    # jnp.asarray on CPU can be zero-copy — without the copy, later in-place
    # torch mutations (e.g. batchnorm running stats) would silently alias
    # into converted JAX params.
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


def state_dict_to_numpy(module_or_dict) -> Dict[str, np.ndarray]:
    if hasattr(module_or_dict, "state_dict"):
        module_or_dict = module_or_dict.state_dict()
    return {k: _np(v) for k, v in module_or_dict.items()}


# --- Linear / FC -----------------------------------------------------------


def linear_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    p = prefix + "." if prefix else ""
    return {
        "kernel": sd[f"{p}weight"].T.copy(),
        "bias": sd[f"{p}bias"],
    }


def fc_from_torch(sd: Dict[str, np.ndarray], prefix: str, n_layers: int) -> dict:
    """torch nn.Sequential of Linear(+act): linears sit at even indices."""
    p = prefix + "." if prefix else ""
    layers = []
    idx = 0
    found = 0
    while found < n_layers:
        if f"{p}{idx}.weight" in sd:
            layers.append(linear_from_torch(sd, f"{p}{idx}"))
            found += 1
        idx += 1
        if idx > 10 * n_layers + 10:
            raise KeyError(f"Could not find {n_layers} linears under {prefix}")
    return {"layers": layers}


# --- GRU --------------------------------------------------------------------


def gru_from_torch(
    sd: Dict[str, np.ndarray],
    prefix: str,
    num_layers: int,
    bidirectional: bool = True,
    bias: bool = True,
    hidden_start: np.ndarray = None,
) -> dict:
    p = prefix + "." if prefix else ""
    layers = []
    suffixes = ["", "_reverse"] if bidirectional else [""]
    for layer in range(num_layers):
        directions = []
        for sfx in suffixes:
            d = {
                "w_ih": sd[f"{p}weight_ih_l{layer}{sfx}"].T.copy(),
                "w_hh": sd[f"{p}weight_hh_l{layer}{sfx}"].T.copy(),
            }
            if bias:
                d["b_ih"] = sd[f"{p}bias_ih_l{layer}{sfx}"]
                d["b_hh"] = sd[f"{p}bias_hh_l{layer}{sfx}"]
            directions.append(d)
        layers.append({"directions": directions})
    params = {"layers": layers}
    if hidden_start is not None:
        params["hidden_start"] = hidden_start
    return params


# --- Wav2Vec2 encoder --------------------------------------------------------


def _weight_norm_conv_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """Positional conv with torch weight_norm(dim=2): keep (g, v) so training
    preserves the reparameterized geometry."""
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    else:  # legacy naming
        g = sd[f"{prefix}.weight_g"]
        v = sd[f"{prefix}.weight_v"]
    return {"weight_g": g, "weight_v": v, "bias": sd[f"{prefix}.bias"]}


def _layer_norm_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def w2v_encoder_layer_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "attention": {
            "q_proj": linear_from_torch(sd, f"{prefix}.attention.q_proj"),
            "k_proj": linear_from_torch(sd, f"{prefix}.attention.k_proj"),
            "v_proj": linear_from_torch(sd, f"{prefix}.attention.v_proj"),
            "out_proj": linear_from_torch(sd, f"{prefix}.attention.out_proj"),
        },
        "layer_norm": _layer_norm_from_torch(sd, f"{prefix}.layer_norm"),
        "feed_forward": {
            "intermediate_dense": linear_from_torch(
                sd, f"{prefix}.feed_forward.intermediate_dense"
            ),
            "output_dense": linear_from_torch(
                sd, f"{prefix}.feed_forward.output_dense"
            ),
        },
        "final_layer_norm": _layer_norm_from_torch(sd, f"{prefix}.final_layer_norm"),
    }


def w2v_encoder_from_torch(
    sd: Dict[str, np.ndarray], prefix: str, num_layers: int
) -> dict:
    p = prefix + "." if prefix else ""
    return {
        "pos_conv": _weight_norm_conv_from_torch(sd, f"{p}pos_conv_embed.conv"),
        "layer_norm": _layer_norm_from_torch(sd, f"{p}layer_norm"),
        "layers": [
            w2v_encoder_layer_from_torch(sd, f"{p}layers.{i}")
            for i in range(num_layers)
        ],
    }


# --- Wav2Vec2-Conformer encoder ----------------------------------------------


def conformer_layer_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    params = {
        "ffn1_layer_norm": _layer_norm_from_torch(sd, f"{prefix}.ffn1_layer_norm"),
        "ffn1": {
            "intermediate_dense": linear_from_torch(
                sd, f"{prefix}.ffn1.intermediate_dense"
            ),
            "output_dense": linear_from_torch(sd, f"{prefix}.ffn1.output_dense"),
        },
        "self_attn_layer_norm": _layer_norm_from_torch(
            sd, f"{prefix}.self_attn_layer_norm"
        ),
        "self_attn": {
            "linear_q": linear_from_torch(sd, f"{prefix}.self_attn.linear_q"),
            "linear_k": linear_from_torch(sd, f"{prefix}.self_attn.linear_k"),
            "linear_v": linear_from_torch(sd, f"{prefix}.self_attn.linear_v"),
            "linear_out": linear_from_torch(sd, f"{prefix}.self_attn.linear_out"),
        },
        "conv_module": {
            "layer_norm": _layer_norm_from_torch(
                sd, f"{prefix}.conv_module.layer_norm"
            ),
            # torch conv1d weights: pw (2C, C, 1) / dw (C, 1, k) / pw2 (C, C, 1)
            "pointwise_conv1": {
                "kernel": sd[f"{prefix}.conv_module.pointwise_conv1.weight"][
                    :, :, 0
                ].T.copy()
            },
            "depthwise_conv": {
                # (C, 1, k) -> (k, 1, C) for ('NTC','TIO','NTC')
                "kernel": np.transpose(
                    sd[f"{prefix}.conv_module.depthwise_conv.weight"], (2, 1, 0)
                ).copy()
            },
            "batch_norm": {
                "scale": sd[f"{prefix}.conv_module.batch_norm.weight"],
                "bias": sd[f"{prefix}.conv_module.batch_norm.bias"],
            },
            "pointwise_conv2": {
                "kernel": sd[f"{prefix}.conv_module.pointwise_conv2.weight"][
                    :, :, 0
                ].T.copy()
            },
        },
        "ffn2_layer_norm": _layer_norm_from_torch(sd, f"{prefix}.ffn2_layer_norm"),
        "ffn2": {
            "intermediate_dense": linear_from_torch(
                sd, f"{prefix}.ffn2.intermediate_dense"
            ),
            "output_dense": linear_from_torch(sd, f"{prefix}.ffn2.output_dense"),
        },
        "final_layer_norm": _layer_norm_from_torch(sd, f"{prefix}.final_layer_norm"),
    }
    # relative position embedding variant (not used by the rope checkpoint)
    if f"{prefix}.self_attn.linear_pos.weight" in sd:
        params["self_attn"]["linear_pos"] = {
            "kernel": sd[f"{prefix}.self_attn.linear_pos.weight"].T.copy()
        }
        params["self_attn"]["pos_bias_u"] = sd[f"{prefix}.self_attn.pos_bias_u"]
        params["self_attn"]["pos_bias_v"] = sd[f"{prefix}.self_attn.pos_bias_v"]
    return params


def conformer_encoder_from_torch(
    sd: Dict[str, np.ndarray], prefix: str, num_layers: int
) -> dict:
    p = prefix + "." if prefix else ""
    return {
        # pos_conv_embed exists in the HF module but is never applied in its
        # forward; kept for checkpoint parity, masked from optimization.
        "pos_conv": _weight_norm_conv_from_torch(sd, f"{p}pos_conv_embed.conv"),
        "layer_norm": _layer_norm_from_torch(sd, f"{p}layer_norm"),
        "layers": [
            conformer_layer_from_torch(sd, f"{p}layers.{i}")
            for i in range(num_layers)
        ],
    }


def conformer_batch_norm_state_from_torch(
    sd: Dict[str, np.ndarray], prefix: str, num_layers: int
) -> dict:
    p = prefix + "." if prefix else ""
    return {
        "layers": [
            {
                "batch_norm": {
                    "mean": sd[f"{p}layers.{i}.conv_module.batch_norm.running_mean"],
                    "var": sd[f"{p}layers.{i}.conv_module.batch_norm.running_var"],
                }
            }
            for i in range(num_layers)
        ]
    }


# --- reference brain encoder (B2P2TModel + FC/GRU) ----------------------------


def brain_encoder_from_torch(sd: Dict[str, np.ndarray]) -> dict:
    """Convert a reference `brain_encoder.pt` state dict
    (B2P2TModel(B2TBrainFeatureExtractor), ref: src/model/b2p2t_model.py:93-136
    and brain_feature_extractor.py:23-54) into our `params["brain"]` subtree.

    GRU geometry is inferred from the key names/shapes. The 24 dead
    `inpLayer{i}` Linears are carried into the parity slot; keys named
    `discriminator`/`suc_for_ctc` are dropped like the reference's partial
    load (ref: brain_feature_extractor.py:109-122).
    """
    sd = {
        k: v
        for k, v in sd.items()
        if not (k.startswith("discriminator") or k.startswith("suc_for_ctc"))
    }
    g = "neural_decoder.encoder.gru"
    num_layers = 0
    while f"{g}.weight_ih_l{num_layers}" in sd:
        num_layers += 1
    if num_layers == 0:
        raise KeyError("no GRU weights found under neural_decoder.encoder.gru")
    bidirectional = f"{g}.weight_ih_l0_reverse" in sd
    bias = f"{g}.bias_ih_l0" in sd
    hidden_start = sd.get("neural_decoder.encoder.hidden_start")
    if hidden_start is not None:
        # torch stores (L*D, 1, H); ours is (L*D, H)
        hidden_start = np.asarray(hidden_start).reshape(
            hidden_start.shape[0], -1
        )
    gru = gru_from_torch(sd, g, num_layers, bidirectional, bias, hidden_start)

    n_fc = sum(
        1
        for k in sd
        if k.startswith("neural_decoder.encoder.fc.") and k.endswith(".weight")
    )
    fc = fc_from_torch(sd, "neural_decoder.encoder.fc", n_fc)

    n_days = sd["day_weights"].shape[0]
    inp_w = np.stack([sd[f"inpLayer{i}.weight"] for i in range(n_days)])
    inp_b = np.stack([sd[f"inpLayer{i}.bias"] for i in range(n_days)])
    return {
        "preproc": {
            "day_weights": sd["day_weights"],
            "day_bias": sd["day_bias"],
            "inp_layers": {"weight": inp_w, "bias": inp_b},
        },
        "gru": gru,
        "fc": fc,
    }


def full_model_from_torch(
    sd: Dict[str, np.ndarray], encoder_family: str, num_layers: int
):
    """Convert a reference full-model state dict (W2VBrainEncoderModel /
    W2VConformerBrainEncoderModel, ref: w2v_custom_feat_extractor.py:22-63 and
    w2v_conformer_custom_feat_extractor.py:16-59) into (params, state).

    Key layout: brain_encoder.* (B2P2TModel), w2v_encoder.{wav2vec2|
    wav2vec2_conformer}.encoder.*, w2v_encoder.lm_head.*.
    """
    brain_sd = {
        k[len("brain_encoder."):]: v
        for k, v in sd.items()
        if k.startswith("brain_encoder.")
    }
    brain = brain_encoder_from_torch(brain_sd)
    if encoder_family == "conformer":
        enc_prefix = "w2v_encoder.wav2vec2_conformer.encoder"
        encoder = conformer_encoder_from_torch(sd, enc_prefix, num_layers)
        state = {
            "encoder": conformer_batch_norm_state_from_torch(
                sd, enc_prefix, num_layers
            )
        }
    else:
        enc_prefix = "w2v_encoder.wav2vec2.encoder"
        encoder = w2v_encoder_from_torch(sd, enc_prefix, num_layers)
        state = {"encoder": {}}
    head = linear_from_torch(sd, "w2v_encoder.lm_head")
    params = {"brain": brain, "w2v": {"encoder": encoder, "lm_head": head}}
    return params, state
