"""Full B2P2T + Wav2Vec2(-Conformer) model assembly (functional JAX).

The TPU-native equivalent of the reference's module composition
(ref: src/experiments/b2t_gru_w2v_experiment.py:95-107 building
B2P2TModel(B2TBrainFeatureExtractor) + W2VBrainEncoderModel, and the
conformer variant at src/experiments/b2t_gru_w2v_conformer_experiment.py:78-85).

Everything between the collated batch and the CTC loss is ONE pure function
(`forward` / `loss_fn`) suitable for jit/pjit over a device mesh. Parameters
are a nested dict pytree:

    params = {
      "brain":  {"preproc": ..., "gru": ..., "fc": ...}        # "brain_encoder"
      "w2v":    {"encoder": ..., "lm_head": ...}               # "w2v_encoder"
    }
    state  = {"encoder": ...}   # conformer batch-norm running stats ({} for w2v)

The brain/w2v split mirrors the reference's two optimizer param groups
(ref: b2t_gru_w2v_experiment.py:109-145): under unfreeze_strategy
"brain_encoder" the whole `w2v` subtree (incl. lm_head) is frozen.
"""

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from wav2vec2forbrain_tpu.models.configs import (
    B2P2TBrainFeatureExtractorArgsModel,
)
from wav2vec2forbrain_tpu.models.conformer import (
    ConformerEncoderConfig,
    apply_conformer_encoder,
    init_conformer_encoder_params,
    init_conformer_state,
)
from wav2vec2forbrain_tpu.models.fc import apply_fc, init_fc, init_linear, apply_linear
from wav2vec2forbrain_tpu.models.gru import apply_gru, init_gru_params
from wav2vec2forbrain_tpu.models.preprocessing import (
    GAUSS_KERNEL_SIZE,
    apply_preproc,
    gaussian_kernel,
    in_size_after_preprocessing,
    init_preproc_params,
)
from wav2vec2forbrain_tpu.models.wav2vec2 import (
    Wav2Vec2EncoderConfig,
    apply_lm_head,
    apply_w2v_encoder,
    init_lm_head_params,
    init_w2v_encoder_params,
)
from wav2vec2forbrain_tpu.ops.ctc import ctc_loss


@dataclass
class ModelSpec:
    """Static (hashable enough for closure capture) model description."""

    # preprocessing (ref: b2p2t_model.py:20-24)
    unfolder_kernel_len: int = 32
    unfolder_stride_len: int = 4
    gaussian_smooth_width: float = 0.3
    # brain feature extractor (ref: brain_feature_extractor.py:13-21)
    gru_hidden_size: int = 256
    gru_bidirectional: bool = True
    gru_num_layers: int = 2
    gru_bias: bool = True
    gru_dropout: float = 0.0
    gru_learnable_initial_state: bool = False
    fc_hidden_sizes: Tuple[int, ...] = ()
    fc_activation: str = "gelu"
    latent_size: int = 768
    # encoder family
    encoder_family: str = "wav2vec2"  # or "conformer"
    w2v_cfg: Optional[Wav2Vec2EncoderConfig] = None
    conformer_cfg: Optional[ConformerEncoderConfig] = None
    # training-time behaviour
    ctc_loss_reduction: str = "mean"
    compute_dtype: Any = jnp.float32
    # Dtype of the encoder's activation STREAM (block inputs/outputs,
    # residuals, saved bwd residuals). bfloat16 halves the HBM-bound
    # elementwise glue between matmuls and the training-memory residuals;
    # LayerNorm/BatchNorm/softmax/CTC internals and all params stay f32.
    # Default f32 = exact reference numerics.
    activation_dtype: Any = jnp.float32
    # Pallas TPU kernels: fused preprocessing (ops/pallas_preproc), fused
    # biGRU recurrence (ops/pallas_gru), fused attention (ops/pallas_attention)
    use_pallas: bool = False
    scan_layers: bool = False  # conformer layers as one lax.scan (fast compile)
    remat_policy: str = "min"  # scan-body remat: min | dots | none
    # Optional intermediate CTC head on the PRE-encoder brain latents with a
    # combined loss `ctc + w * (aux | aux^2)` — the reference
    # W2VBrainEncoderModel's dormant pre_w2v_head_for_additional_loss /
    # additonal_loss_weight / additional_loss_squared hooks
    # (ref: src/model/w2v_custom_feat_extractor.py:30-32,57-63,96-118).
    # Dormant there too: no registered reference experiment passes them.
    aux_head_vocab_size: Optional[int] = None
    additional_loss_weight: float = 1.0
    additional_loss_squared: bool = False

    @property
    def encoder_cfg(self):
        return self.w2v_cfg if self.encoder_family == "wav2vec2" else self.conformer_cfg

    @classmethod
    def from_args(
        cls,
        bfe_args: B2P2TBrainFeatureExtractorArgsModel,
        latent_size: int,
        encoder_family: str,
        encoder_cfg,
        ctc_loss_reduction: str = "mean",
        compute_dtype=jnp.float32,
        use_pallas: bool = False,
        scan_layers: bool = False,
        remat_policy: str = "min",
        activation_dtype=jnp.float32,
    ) -> "ModelSpec":
        return cls(
            unfolder_kernel_len=bfe_args.unfolder_kernel_len,
            unfolder_stride_len=bfe_args.unfolder_stride_len,
            gaussian_smooth_width=bfe_args.gaussian_smooth_width,
            gru_hidden_size=bfe_args.encoder_gru_hidden_size,
            gru_bidirectional=bfe_args.encoder_bidirectional,
            gru_num_layers=bfe_args.encoder_num_gru_layers,
            gru_bias=bfe_args.encoder_bias,
            gru_dropout=bfe_args.encoder_dropout,
            gru_learnable_initial_state=bfe_args.encoder_learnable_inital_state,
            fc_hidden_sizes=tuple(bfe_args.encoder_fc_hidden_sizes),
            fc_activation=bfe_args.encoder_fc_activation_function,
            latent_size=latent_size,
            encoder_family=encoder_family,
            w2v_cfg=encoder_cfg if encoder_family == "wav2vec2" else None,
            conformer_cfg=encoder_cfg if encoder_family == "conformer" else None,
            ctc_loss_reduction=ctc_loss_reduction,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            scan_layers=scan_layers,
            remat_policy=remat_policy,
            activation_dtype=activation_dtype,
            aux_head_vocab_size=getattr(bfe_args, "aux_head_vocab_size", None),
            additional_loss_weight=(
                getattr(bfe_args, "additional_loss_weight", None) or 1.0
            ),
            additional_loss_squared=bool(
                getattr(bfe_args, "additional_loss_squared", False)
            ),
        )


# Model outputs are plain dicts {logits, logit_lens, loss, state} — a dict
# subclass would be a pytree LEAF to jax transforms (exact-type registry) and
# leak tracers out of value_and_grad.
ModelOutput = dict


# --- init ---------------------------------------------------------------------


def init_model_params(rng, spec: ModelSpec) -> Tuple[dict, dict]:
    """Random init of the full param tree + mutable state.

    The w2v subtree is normally overwritten by converted pretrained weights
    (w2v_skip_loading_weights=False, ref: b2t_gru_w2v_experiment.py:62-65).
    """
    k_pre, k_gru, k_fc, k_enc, k_head = jax.random.split(rng, 5)
    gru_in = in_size_after_preprocessing(spec.unfolder_kernel_len)
    gru_out = spec.gru_hidden_size * (2 if spec.gru_bidirectional else 1)
    brain = {
        "preproc": init_preproc_params(k_pre, None),
        "gru": init_gru_params(
            k_gru,
            gru_in,
            spec.gru_hidden_size,
            spec.gru_num_layers,
            spec.gru_bidirectional,
            spec.gru_bias,
            spec.gru_learnable_initial_state,
        ),
        "fc": init_fc(k_fc, gru_out, spec.latent_size, spec.fc_hidden_sizes),
    }
    if spec.encoder_family == "wav2vec2":
        cfg = spec.w2v_cfg
        encoder = init_w2v_encoder_params(k_enc, cfg)
        if spec.scan_layers:
            from wav2vec2forbrain_tpu.models.wav2vec2 import stack_w2v_layers

            encoder = stack_w2v_layers(encoder)
        head = init_lm_head_params(k_head, cfg)
        state = {"encoder": {}}
    else:
        cfg = spec.conformer_cfg
        encoder = init_conformer_encoder_params(k_enc, cfg)
        head = init_linear(k_head, cfg.hidden_size, cfg.vocab_size)
        enc_state = init_conformer_state(cfg)
        if spec.scan_layers:
            from wav2vec2forbrain_tpu.models.conformer import (
                stack_conformer_layers,
            )

            encoder, enc_state = stack_conformer_layers(encoder, enc_state)
        state = {"encoder": enc_state}
    params = {"brain": brain, "w2v": {"encoder": encoder, "lm_head": head}}
    if spec.aux_head_vocab_size is not None:
        k_aux = jax.random.fold_in(k_head, 1)
        params["aux_head"] = init_linear(
            k_aux, spec.latent_size, spec.aux_head_vocab_size
        )
    return params, state


# --- forward ------------------------------------------------------------------


def _dropout(rng, x, rate, train):
    if not train or rate <= 0.0:
        return rng, x
    from wav2vec2forbrain_tpu.ops.select import kernel_enabled

    if kernel_enabled("dropout", True, x.dtype):
        from wav2vec2forbrain_tpu.ops.hash_dropout import dropout_with_rng

        return dropout_with_rng(rng, x, rate, train)
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - rate, x.shape)
    return rng, jnp.where(keep, x / (1.0 - rate), 0.0)


def forward(
    params: dict,
    state: dict,
    spec: ModelSpec,
    x: jnp.ndarray,
    day_idxs: jnp.ndarray,
    input_lens: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    return_extras: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Batch (B, T, 256) -> (logits (B, T', vocab), logit_lens (B,), new_state).

    With return_extras=True a 4th dict rides along:
    - "hidden_states": the encoder's last hidden states, the tensor the
      lm_head projects (ref ModelOutput.hidden_states,
      src/model/w2v_custom_feat_extractor.py:144-153 — post final-dropout
      there; identical in eval mode, where the latent analysis consumes it)
    - "aux_logits" (aux head configured): intermediate CTC head over the
      PRE-encoder brain latents
    The flag is trace-time static: the default-off program is unchanged."""
    cd = spec.compute_dtype
    # inputs may arrive in a half-precision wire format (--h2d_dtype); the
    # preprocessing chain itself is always float32
    x = x.astype(jnp.float32)
    from wav2vec2forbrain_tpu.ops.select import kernel_enabled

    if kernel_enabled("preproc", spec.use_pallas):
        from wav2vec2forbrain_tpu.ops.pallas_preproc import apply_preproc_pallas

        feats, out_lens = apply_preproc_pallas(
            params["brain"]["preproc"],
            x,
            day_idxs,
            input_lens,
            spec.gaussian_smooth_width,
            spec.unfolder_kernel_len,
            spec.unfolder_stride_len,
        )
    else:
        smooth_kernel = gaussian_kernel(
            GAUSS_KERNEL_SIZE, spec.gaussian_smooth_width
        )
        feats, out_lens = apply_preproc(
            params["brain"]["preproc"],
            x,
            day_idxs,
            input_lens,
            smooth_kernel,
            spec.unfolder_kernel_len,
            spec.unfolder_stride_len,
        )

    if rng is not None:
        rng, gru_rng, enc_rng, head_rng = jax.random.split(rng, 4)
    else:
        gru_rng = enc_rng = head_rng = None

    h = apply_gru(
        params["brain"]["gru"],
        feats,
        spec.gru_hidden_size,
        spec.gru_num_layers,
        spec.gru_bidirectional,
        spec.gru_dropout,
        train,
        gru_rng,
        spec.gru_learnable_initial_state,
        compute_dtype=cd,
        use_pallas=(spec.use_pallas and spec.gru_bidirectional),
    )
    latents = apply_fc(params["brain"]["fc"], h, spec.fc_activation, cd)
    # the encoder's activation stream runs in spec.activation_dtype (blocks
    # emit what they receive); the heads always emit f32 logits
    enc_in = latents.astype(spec.activation_dtype)

    if spec.encoder_family == "wav2vec2":
        if "layers_stacked" in params["w2v"]["encoder"]:
            from wav2vec2forbrain_tpu.models.wav2vec2 import (
                apply_w2v_encoder_scanned,
            )

            hidden = apply_w2v_encoder_scanned(
                params["w2v"]["encoder"], enc_in, spec.w2v_cfg, enc_rng,
                train, cd, use_pallas=spec.use_pallas,
                remat_policy=spec.remat_policy,
            )
        else:
            hidden = apply_w2v_encoder(
                params["w2v"]["encoder"], enc_in, spec.w2v_cfg, enc_rng,
                train, cd, use_pallas=spec.use_pallas,
            )
        new_state = state
        logits = apply_lm_head(
            params["w2v"]["lm_head"], hidden, spec.w2v_cfg, head_rng, train, cd
        )
        last_hidden = hidden  # pre-final-dropout; == post-dropout in eval
    else:
        cfg = spec.conformer_cfg
        if "layers_stacked" in params["w2v"]["encoder"]:
            import functools

            from wav2vec2forbrain_tpu.models.conformer import (
                apply_conformer_encoder_scanned,
            )

            enc_fn = functools.partial(
                apply_conformer_encoder_scanned,
                remat_policy=spec.remat_policy,
            )
        else:
            enc_fn = apply_conformer_encoder
        hidden, new_enc_state = enc_fn(
            params["w2v"]["encoder"], state["encoder"], enc_in, cfg, enc_rng,
            train, cd, use_pallas=spec.use_pallas,
        )
        new_state = {"encoder": new_enc_state}
        # ForCTC head: final dropout + vocab projection
        head_rng, hidden = _dropout(head_rng, hidden, cfg.final_dropout, train)
        logits = apply_linear(params["w2v"]["lm_head"], hidden, cd)
        last_hidden = hidden

    if not return_extras:
        return logits.astype(jnp.float32), out_lens, new_state
    extras = {
        "hidden_states": last_hidden.astype(jnp.float32),
        # the pre-encoder brain latents (the reference's encoded_brain.logits
        # — what the latent analysis calls the "pre" space)
        "latents": latents.astype(jnp.float32),
    }
    if spec.aux_head_vocab_size is not None:
        extras["aux_logits"] = apply_linear(
            params["aux_head"], latents, cd
        ).astype(jnp.float32)
    return logits.astype(jnp.float32), out_lens, new_state, extras


def forward_with_loss(
    params: dict,
    state: dict,
    spec: ModelSpec,
    x: jnp.ndarray,
    day_idxs: jnp.ndarray,
    input_lens: jnp.ndarray,
    targets: Optional[jnp.ndarray],
    target_lens: Optional[jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    sample_mask: Optional[jnp.ndarray] = None,
    return_hidden: bool = False,
) -> ModelOutput:
    """With an aux head configured the returned `loss` is the COMBINED loss
    `ctc + w * (aux | aux^2)` and `metrics` carries ctc/intermediate/combined
    scalars under the reference's names
    (ref: src/model/w2v_custom_feat_extractor.py:96-129); without one,
    `loss` is the plain CTC loss and `metrics` is {}."""
    aux_on = spec.aux_head_vocab_size is not None
    fwd = forward(
        params, state, spec, x, day_idxs, input_lens, rng, train,
        return_extras=(aux_on or return_hidden),
    )
    logits, logit_lens, new_state = fwd[:3]
    extras = fwd[3] if len(fwd) > 3 else {}
    loss = None
    metrics = {}
    if targets is not None:
        loss = ctc_loss(
            logits,
            logit_lens,
            targets,
            target_lens,
            spec.ctc_loss_reduction,
            sample_mask=sample_mask,
        )
        if aux_on:
            # intermediate head: CTC on the pre-encoder latents against the
            # same targets/lengths (the reference forwards batch.target and
            # the brain logit_lens to the aux model,
            # w2v_custom_feat_extractor.py:120-136)
            aux_loss = ctc_loss(
                extras["aux_logits"],
                logit_lens,
                targets,
                target_lens,
                spec.ctc_loss_reduction,
                sample_mask=sample_mask,
            )
            metrics["ctc_loss"] = loss
            metrics["intermediate_loss"] = aux_loss
            aux_term = aux_loss**2 if spec.additional_loss_squared else aux_loss
            if spec.additional_loss_squared:
                metrics["intermediate_loss_squared"] = aux_term
            loss = loss + aux_term * spec.additional_loss_weight
            metrics["combined_loss"] = loss
    out = ModelOutput(
        logits=logits,
        logit_lens=logit_lens,
        loss=loss,
        state=new_state,
        metrics=metrics,
    )
    if return_hidden:
        out["hidden_states"] = extras["hidden_states"]
    return out


# --- optimizer param labeling -------------------------------------------------


def param_labels(params: dict, unfreeze_strategy: str) -> dict:
    """Pytree of {"brain","w2v","frozen"} labels matching `params` structure.

    - dead inpLayer parity weights are always frozen
      (ref: b2p2t_model.py:129-136 never calls them)
    - unfreeze_strategy "brain_encoder": whole w2v subtree (incl lm_head) frozen
      (ref: b2t_gru_w2v_experiment.py:128-133)
    """

    def label_tree(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    brain = dict(params["brain"])
    labels_brain = {
        k: label_tree(v, "brain") for k, v in brain.items() if k != "preproc"
    }
    pre = dict(params["brain"]["preproc"])
    labels_pre = {
        k: label_tree(v, "frozen" if k == "inp_layers" else "brain")
        for k, v in pre.items()
    }
    labels_brain["preproc"] = labels_pre

    w2v_label = "w2v" if unfreeze_strategy == "brain_encoder+w2v" else "frozen"
    labels_w2v = label_tree(params["w2v"], w2v_label)
    labels = {"brain": labels_brain, "w2v": labels_w2v}
    if "aux_head" in params:
        # the intermediate head consumes brain latents; it trains with the
        # brain group's lr schedule (the reference's aux model would sit in
        # the default param group, i.e. the non-w2v one)
        labels["aux_head"] = label_tree(params["aux_head"], "brain")
    return labels
