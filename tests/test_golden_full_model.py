"""End-to-end golden parity vs the COMPOSED reference PyTorch model.

Builds the reference's actual module composition in-process —
B2P2TModel(B2TBrainFeatureExtractor) via bfe_w_preprocessing_from_config
(ref: src/model/brain_feature_extractor.py:96-123) wrapped by
W2VBrainEncoderModel / W2VConformerBrainEncoderModel
(ref: src/model/w2v_custom_feat_extractor.py:22-136,
w2v_conformer_custom_feat_extractor.py:16-59) — converts its random weights
with models/convert.full_model_from_torch, and asserts logits, logit_lens,
CTC loss, and one two-group Adam step match models/assembly.forward_with_loss
+ train/steps.build_steps on a fixed batch. This covers the exact composition
quirks: the −100 target masking interplay (b2p2t_model.py:145-148 and
w2v_custom_feat_extractor.py:70), the no-`+1` length arithmetic
(b2p2t_model.py:169-173), and the two-optimizer-group split
(b2t_gru_w2v_experiment.py:109-145).

Tiny configs only (hidden 96, 2 layers) — checkpoints are never downloaded;
HF configs are written to tmp dirs so Wav2Vec2Config.from_pretrained works
offline, and weights are random.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from wav2vec2forbrain_tpu.models import convert
from wav2vec2forbrain_tpu.models.assembly import (
    ModelSpec,
    forward_with_loss,
    param_labels,
)
from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)

HIDDEN = 96
GRU_HIDDEN = 32
T_IN = 120
LENS = (120, 96)  # (T - 32) / 4 -> logit lens (22, 16)


@pytest.fixture
def ref_env(monkeypatch):
    """Import the reference package CPU-safe: no-op .cuda() on modules and
    tensors (the reference hardcodes .cuda() in forward paths)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self
    )
    yield


def _bfe_args():
    """Reference-side brain feature extractor + preprocessing args."""
    from src.model.brain_feature_extractor import (
        B2P2TBrainFeatureExtractorArgsModel,
    )

    return B2P2TBrainFeatureExtractorArgsModel(
        encoder_gru_hidden_size=GRU_HIDDEN,
        encoder_num_gru_layers=2,
        encoder_bidirectional=True,
        encoder_learnable_inital_state=True,
        encoder_fc_hidden_sizes=[64],
        encoder_fc_activation_function="gelu",
    )


def _model_spec(family, encoder_cfg):
    return ModelSpec(
        gru_hidden_size=GRU_HIDDEN,
        gru_num_layers=2,
        gru_bidirectional=True,
        gru_learnable_initial_state=True,
        fc_hidden_sizes=(64,),
        fc_activation="gelu",
        latent_size=HIDDEN,
        encoder_family=family,
        w2v_cfg=encoder_cfg if family == "wav2vec2" else None,
        conformer_cfg=encoder_cfg if family == "conformer" else None,
    )


def _make_batch(seed=7):
    """Fixed ragged batch: zero-padded inputs, 0-padded targets with no
    adjacent repeats (CTC-feasible at logit lens 22/16)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, T_IN, 256)).astype(np.float32)
    for b, ln in enumerate(LENS):
        x[b, ln:] = 0.0
    target_lens = np.array([12, 9], np.int32)
    targets = np.zeros((2, 14), np.int64)
    for b, tl in enumerate(target_lens):
        row = rng.integers(1, 32, size=tl)
        for i in range(1, tl):
            if row[i] == row[i - 1]:
                row[i] = 1 + (row[i] % 31)
                if row[i] == row[i - 1]:
                    row[i] = 1 + ((row[i] + 1) % 31)
        targets[b, :tl] = row
    return {
        "x": x,
        "targets": targets,
        "day_idxs": np.array([3, 17], np.int32),
        "input_lens": np.array(LENS, np.int32),
        "target_lens": target_lens,
    }


def _ref_batch(d):
    from src.datasets.batch_types import B2tSampleBatch

    batch = B2tSampleBatch(
        torch.from_numpy(d["x"]), torch.from_numpy(d["targets"])
    )
    batch.day_idxs = torch.from_numpy(d["day_idxs"]).to(torch.int64)
    batch.input_lens = torch.from_numpy(d["input_lens"]).to(torch.float32)
    batch.target_lens = torch.from_numpy(d["target_lens"]).to(torch.int64)
    return batch


def _build_ref_w2v(tmp_path, stable: bool):
    """The reference's exact composition for b2p2t_gru+w2v
    (ref: b2t_gru_w2v_experiment.py:95-107) on a tiny offline config."""
    from transformers import Wav2Vec2Config

    from src.args.base_args import PRETRAINED_LATENT_SIZES
    from src.model.brain_feature_extractor import (
        bfe_w_preprocessing_from_config,
    )
    from src.model.w2v_custom_feat_extractor import (
        W2VBrainEncoderModel,
        W2VBrainEncoderModelArgs,
    )

    ckpt_dir = str(tmp_path / "w2v_tiny")
    Wav2Vec2Config(
        hidden_size=HIDDEN,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable,
        vocab_size=32,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        attn_implementation="eager",
    ).save_pretrained(ckpt_dir)
    PRETRAINED_LATENT_SIZES[ckpt_dir] = HIDDEN

    torch.manual_seed(11 + int(stable))
    brain = bfe_w_preprocessing_from_config(_bfe_args(), None, ckpt_dir)
    model = W2VBrainEncoderModel(
        W2VBrainEncoderModelArgs(w2v_do_stable_layer_norm=stable),
        brain,
        ckpt_dir,
        skip_loading_weights=True,
    )
    our_cfg = Wav2Vec2EncoderConfig.tiny_test(
        do_stable_layer_norm=stable,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )
    return model, _model_spec("wav2vec2", our_cfg)


def _build_ref_conformer(tmp_path, monkeypatch):
    """The conformer composition (ref: b2t_gru_w2v_conformer_experiment.py:
    78-85). The reference wrapper always calls from_pretrained; for an
    offline random-init golden test that classmethod is redirected to plain
    construction with the same config."""
    from transformers import Wav2Vec2ConformerConfig

    from src.args.base_args import PRETRAINED_LATENT_SIZES
    from src.model import w2v_conformer_custom_feat_extractor as ref_mod
    from src.model.brain_feature_extractor import (
        bfe_w_preprocessing_from_config,
    )

    ckpt_dir = str(tmp_path / "conformer_tiny")
    Wav2Vec2ConformerConfig(
        hidden_size=HIDDEN,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        conv_depthwise_kernel_size=31,
        position_embeddings_type="rotary",
        vocab_size=32,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        conformer_conv_dropout=0.0,
        final_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        attn_implementation="eager",
    ).save_pretrained(ckpt_dir)
    PRETRAINED_LATENT_SIZES[ckpt_dir] = HIDDEN

    monkeypatch.setattr(
        ref_mod.Wav2Vec2ConformerWithoutFeatExtrForCTC,
        "from_pretrained",
        classmethod(lambda cls, ckpt, config=None, **kw: cls(config)),
    )
    torch.manual_seed(23)
    brain = bfe_w_preprocessing_from_config(_bfe_args(), None, ckpt_dir)
    model = ref_mod.W2VConformerBrainEncoderModel(brain, ckpt_dir)
    our_cfg = ConformerEncoderConfig.tiny_test(
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        conformer_conv_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )
    return model, _model_spec("conformer", our_cfg)


def _our_params(model, family):
    sd = convert.state_dict_to_numpy(model)
    params, state = convert.full_model_from_torch(sd, family, 2)
    return (
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, state),
    )


def _run_ours(params, state, spec, d, train=False):
    return forward_with_loss(
        params,
        state,
        spec,
        jnp.asarray(d["x"]),
        jnp.asarray(d["day_idxs"]),
        jnp.asarray(d["input_lens"]),
        jnp.asarray(d["targets"].astype(np.int32)),
        jnp.asarray(d["target_lens"]),
        rng=jax.random.PRNGKey(0) if train else None,
        train=train,
    )


# --- eval-mode parity ----------------------------------------------------------


@pytest.mark.parametrize("stable", [False, True])
def test_full_w2v_eval_parity(ref_env, tmp_path, stable):
    model, spec = _build_ref_w2v(tmp_path, stable)
    model.eval()
    d = _make_batch()
    with torch.no_grad():
        ref_out = model.forward(_ref_batch(d))
    params, state = _our_params(model, "wav2vec2")
    ours = _run_ours(params, state, spec, d)

    np.testing.assert_array_equal(
        np.asarray(ours["logit_lens"]), ref_out.logit_lens.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits"]), ref_out.logits.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        float(ours["loss"]), float(ref_out.loss), atol=1e-5, rtol=1e-5
    )


def test_full_conformer_eval_parity(ref_env, tmp_path, monkeypatch):
    model, spec = _build_ref_conformer(tmp_path, monkeypatch)
    model.eval()
    d = _make_batch()
    with torch.no_grad():
        ref_out = model.forward(_ref_batch(d))
    params, state = _our_params(model, "conformer")
    ours = _run_ours(params, state, spec, d)

    np.testing.assert_allclose(
        np.asarray(ours["logits"]), ref_out.logits.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        float(ours["loss"]), float(ref_out.loss), atol=1e-5, rtol=1e-5
    )


# --- train-mode parity (dropout 0; conformer exercises train-mode BN) ---------


def test_full_conformer_train_mode_parity(ref_env, tmp_path, monkeypatch):
    model, spec = _build_ref_conformer(tmp_path, monkeypatch)
    model.train()
    d = _make_batch()
    # convert BEFORE the torch train-mode forward mutates BN running stats
    params, state = _our_params(model, "conformer")
    ref_out = model.forward(_ref_batch(d))
    ref_bn = {
        i: (
            layer.conv_module.batch_norm.running_mean.detach().numpy().copy(),
            layer.conv_module.batch_norm.running_var.detach().numpy().copy(),
        )
        for i, layer in enumerate(
            model.w2v_encoder.wav2vec2_conformer.encoder.layers
        )
    }

    ours = _run_ours(params, state, spec, d, train=True)
    np.testing.assert_allclose(
        float(ours["loss"]), float(ref_out.loss), atol=2e-5, rtol=1e-5
    )
    for i, (mean, var) in ref_bn.items():
        got = ours["state"]["encoder"]["layers"][i]["batch_norm"]
        np.testing.assert_allclose(np.asarray(got["mean"]), mean, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["var"]), var, atol=1e-5)


# --- one two-group Adam step ----------------------------------------------------


@pytest.mark.parametrize("family", ["wav2vec2", "conformer"])
def test_full_model_adam_step_parity(ref_env, tmp_path, monkeypatch, family):
    """One optimizer step with the reference's exact two param groups
    (brain lr vs w2v lr, ref: b2t_gru_w2v_experiment.py:109-145) must move
    every parameter identically. eps=1e-4 keeps the Adam map Lipschitz so
    fp32 gradient noise cannot flip near-zero update directions."""
    from wav2vec2forbrain_tpu.train.optim import make_optimizer
    from wav2vec2forbrain_tpu.train.steps import (
        StepConfig,
        build_steps,
        merge_params,
        partition_params,
        prune_labels,
    )
    from wav2vec2forbrain_tpu.data.batch import B2tBatch

    if family == "wav2vec2":
        model, spec = _build_ref_w2v(tmp_path, stable=False)
    else:
        model, spec = _build_ref_conformer(tmp_path, monkeypatch)
    model.train()
    d = _make_batch()
    brain_lr, w2v_lr, eps = 1e-3, 1e-4, 1e-4

    params, state = _our_params(model, family)

    # --- torch side: two param groups exactly like the reference factory
    opt = torch.optim.Adam(
        [
            {"params": model.brain_encoder.parameters()},
            {"params": model.w2v_encoder.parameters(), "lr": w2v_lr},
        ],
        lr=brain_lr,
        weight_decay=0.0,
        eps=eps,
    )
    opt.zero_grad()
    ref_out = model.forward(_ref_batch(d))
    ref_out.loss.backward()
    opt.step()
    ref_params_after, _ = convert.full_model_from_torch(
        convert.state_dict_to_numpy(model), family, 2
    )

    # --- our side: labeled partition + jitted train step
    labels = param_labels(params, "brain_encoder+w2v")
    trainable, frozen = partition_params(params, labels)
    trainable_labels = prune_labels(labels, trainable)
    tx = make_optimizer(trainable_labels, "adam", 0.0, eps)
    opt_state = tx.init(trainable)
    train_step, _ = build_steps(
        spec, trainable_labels, tx, StepConfig(None, 0.0, 0.0)
    )
    batch = B2tBatch(
        input=d["x"],
        target=d["targets"].astype(np.int32),
        day_idxs=d["day_idxs"],
        input_lens=d["input_lens"],
        target_lens=d["target_lens"],
    )
    out = train_step(
        trainable,
        frozen,
        opt_state,
        state,
        batch,
        jax.random.PRNGKey(1),
        jnp.float32(brain_lr),
        jnp.float32(w2v_lr),
    )
    np.testing.assert_allclose(
        float(out.loss), float(ref_out.loss), atol=2e-5, rtol=1e-5
    )
    ours_after = merge_params(jax.device_get(out.params), frozen)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params_after)
    flat_ours = jax.tree_util.tree_leaves_with_path(ours_after)
    assert len(flat_ref) == len(flat_ours)
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        assert path_r == path_o
        np.testing.assert_allclose(
            np.asarray(leaf_o),
            np.asarray(leaf_r),
            atol=3e-5,
            err_msg=str(path_r),
        )


# --- aux-head / intermediate-loss hooks ---------------------------------------


@pytest.mark.parametrize("squared", [False, True])
def test_aux_head_combined_loss_parity(ref_env, tmp_path, squared):
    """The dormant reference hooks (pre_w2v_head_for_additional_loss +
    additonal_loss_weight/additional_loss_squared,
    ref: src/model/w2v_custom_feat_extractor.py:30-32,96-118) against our
    aux_head_vocab_size spec: combined loss, intermediate/combined metrics,
    and ModelOutput.hidden_states must match the torch composition with a
    matched toy CTC head."""
    import dataclasses

    from torch import nn

    from src.model.b2tmodel import B2TModel as RefB2TModel
    from src.model.b2tmodel import ModelOutput as RefModelOutput
    from src.model.w2v_custom_feat_extractor import (
        W2VBrainEncoderModel,
        W2VBrainEncoderModelArgs,
    )
    from src.args.base_args import PRETRAINED_LATENT_SIZES
    from src.model.brain_feature_extractor import (
        bfe_w_preprocessing_from_config,
    )
    from transformers import Wav2Vec2Config

    class ToyCtcHead(RefB2TModel):
        """Linear -> CTC over the pre-encoder latents, mirroring how the
        reference's phoneme-head models compute their loss."""

        def __init__(self, hidden, vocab):
            super().__init__()
            self.linear = nn.Linear(hidden, vocab)
            self.loss = nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)

        def forward(self, batch):
            logits = self.linear(batch.input)
            loss = self.loss(
                torch.log_softmax(logits, -1).transpose(0, 1),
                batch.target,
                batch.input_lens,
                batch.target_lens,
            )
            return RefModelOutput(logits, {}, loss=loss)

    ckpt_dir = str(tmp_path / "w2v_tiny_aux")
    Wav2Vec2Config(
        hidden_size=HIDDEN,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        vocab_size=32,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        attn_implementation="eager",
    ).save_pretrained(ckpt_dir)
    PRETRAINED_LATENT_SIZES[ckpt_dir] = HIDDEN

    torch.manual_seed(31)
    brain = bfe_w_preprocessing_from_config(_bfe_args(), None, ckpt_dir)
    aux = ToyCtcHead(HIDDEN, 32)
    model = W2VBrainEncoderModel(
        W2VBrainEncoderModelArgs(),
        brain,
        ckpt_dir,
        skip_loading_weights=True,
        pre_w2v_head_for_additional_loss=aux,
        additonal_loss_weight=0.7,
        additional_loss_squared=squared,
    )
    model.eval()
    d = _make_batch()
    with torch.no_grad():
        ref_out = model.forward(_ref_batch(d))

    our_cfg = Wav2Vec2EncoderConfig.tiny_test(
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )
    spec = dataclasses.replace(
        _model_spec("wav2vec2", our_cfg),
        aux_head_vocab_size=32,
        additional_loss_weight=0.7,
        additional_loss_squared=squared,
    )
    params, state = _our_params(model, "wav2vec2")
    params["aux_head"] = {
        "kernel": jnp.asarray(aux.linear.weight.detach().numpy().T),
        "bias": jnp.asarray(aux.linear.bias.detach().numpy()),
    }
    ours = forward_with_loss(
        params,
        state,
        spec,
        jnp.asarray(d["x"]),
        jnp.asarray(d["day_idxs"]),
        jnp.asarray(d["input_lens"]),
        jnp.asarray(d["targets"].astype(np.int32)),
        jnp.asarray(d["target_lens"]),
        rng=None,
        train=False,
        return_hidden=True,
    )

    np.testing.assert_allclose(
        float(ours["loss"]), float(ref_out.loss), atol=2e-5, rtol=1e-5
    )
    for key in ("intermediate_loss", "combined_loss"):
        np.testing.assert_allclose(
            float(ours["metrics"][key]),
            float(ref_out.metrics[key]),
            atol=2e-5,
            rtol=1e-5,
            err_msg=key,
        )
    assert float(ours["metrics"]["ctc_loss"]) == pytest.approx(
        float(ref_out.metrics["ctc_loss"]), rel=1e-5, abs=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["hidden_states"]),
        ref_out.hidden_states.numpy(),
        atol=1e-4,
    )
