"""End-to-end training smoke tests on synthetic T12 data with tiny encoders.

Covers the full lifecycle (construction → run() → artifacts), Trainer
semantics (best-model reload, early stopping, history schema), checkpoint
resume, and the multi-chip sharded path on the 8-device CPU mesh.
"""

import json
import os

import numpy as np
import pytest

import wav2vec2forbrain_tpu.experiments.impl as impl
from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
from wav2vec2forbrain_tpu.args.yaml_config import YamlConfigModel
from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

W2V_CKPT = "facebook/wav2vec2-base-960h"
CONF_CKPT = "facebook/wav2vec2-conformer-rope-large-960h-ft"


def tiny_yaml_config(tmp_path, splits_dir) -> YamlConfigModel:
    return YamlConfigModel(
        cache_dir=str(tmp_path / "cache"),
        fig_dir=str(tmp_path / "figs"),
        n3gram_lm_model_path=str(tmp_path / "missing_3gram.arpa"),
        n5gram_lm_model_path=str(tmp_path / "missing_5gram.arpa"),
        dataset_splits_dir=splits_dir,
        wandb_api_key="offline",
    )


@pytest.fixture
def tiny_encoders(monkeypatch):
    """Patch checkpoint->config resolution to tiny encoder sizes."""

    def fake_cfg(checkpoint):
        if "conformer" in checkpoint:
            return "conformer", ConformerEncoderConfig.tiny_test()
        return "wav2vec2", Wav2Vec2EncoderConfig.tiny_test()

    monkeypatch.setattr(impl, "encoder_config_for_checkpoint", fake_cfg)
    monkeypatch.setitem(PRETRAINED_LATENT_SIZES, W2V_CKPT, 96)
    monkeypatch.setitem(PRETRAINED_LATENT_SIZES, CONF_CKPT, 96)


def base_config(**overrides) -> dict:
    cfg = dict(
        experiment_type="b2p2t_gru+w2v",
        batch_size=3,
        epochs=2,
        learning_rate=1e-3,
        w2v_skip_loading_weights=True,
        encoder_gru_hidden_size=16,
        encoder_num_gru_layers=1,
        seed=0,
        use_wandb=False,
        # bound jit shapes: one (T, U) bucket for the synthetic data
        pad_to_multiple=256,
        target_pad_to_multiple=32,
    )
    cfg.update(overrides)
    return cfg


def test_gru_w2v_e2e_run(tmp_path, synthetic_splits_dir, tiny_encoders):
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(base_config(), yaml_cfg)
    exp.run()

    # artifact layout parity (ref results dir contract)
    assert os.path.exists(os.path.join(exp.results_dir, "config.json"))
    assert os.path.exists(os.path.join(exp.results_dir, "model.msgpack"))
    assert os.path.exists(os.path.join(exp.results_dir, "history.json"))
    assert os.path.exists(os.path.join(exp.results_dir, "history.png"))
    assert os.path.exists(os.path.join(exp.results_dir, "metrics.jsonl"))

    with open(os.path.join(exp.results_dir, "history.json")) as f:
        hist = json.load(f)
    assert len(hist["epochs"]) == 2
    # metric-name parity: sweeps key on test_ctc_loss / *_word_error_rate
    avg = hist["epochs"][0]["val"]["average"]
    assert "word_error_rate" in avg["metrics"]
    assert np.isfinite(avg["loss"])
    test_avg = hist["test"]["average"]
    assert "word_error_rate" in test_avg["metrics"]

    with open(os.path.join(exp.results_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    metric_rows = [l for l in lines if l["_type"] == "metrics"]
    assert any("val_ctc_loss" in row for row in metric_rows)
    assert any("test_ctc_loss" in row for row in metric_rows)


def test_store_final_model_off(tmp_path, synthetic_splits_dir, tiny_encoders):
    """--store_final_model=false skips the model.msgpack D2H fetch but keeps
    every metrics artifact (bench/sweep harness mode)."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(
        base_config(epochs=1, store_final_model=False), yaml_cfg
    )
    exp.run()
    assert not os.path.exists(os.path.join(exp.results_dir, "model.msgpack"))
    for artifact in ("config.json", "history.json", "metrics.jsonl"):
        assert os.path.exists(os.path.join(exp.results_dir, artifact))


def test_conformer_e2e_run(tmp_path, synthetic_splits_dir, tiny_encoders):
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    cfg = base_config(
        experiment_type="b2p2t_gru+w2v_conformer",
        wav2vec_checkpoint=CONF_CKPT,
        tokenizer_checkpoint=CONF_CKPT,
        epochs=1,
        unfreeze_strategy="brain_encoder+w2v",
        w2v_learning_rate=1e-4,
        w2v_warmup_start_step=0,
        w2v_warmup_steps=2,
    )
    cfg.pop("encoder_gru_hidden_size")
    exp = impl.B2TGruAndW2VConformerExperiment(cfg, yaml_cfg)
    exp.run()
    assert os.path.exists(os.path.join(exp.results_dir, "model.msgpack"))
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        hist = json.load(f)
    assert len(hist["epochs"]) == 1
    assert np.isfinite(hist["test"]["average"]["loss"])


def test_early_stopping_and_best_model(tmp_path, synthetic_splits_dir, tiny_encoders):
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    cfg = base_config(
        epochs=6,
        early_stopping_patience=2,
        early_stopping_delta=1e9,  # nothing counts as improvement
    )
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    exp.run()
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        hist = json.load(f)
    # delta so large that epoch 0 of the window is always "best" -> stop at
    # the patience boundary
    assert len(hist["epochs"]) == 2


def test_checkpoint_resume(tmp_path, synthetic_splits_dir, tiny_encoders):
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(base_config(epochs=1), yaml_cfg)
    exp.run()
    ckpt = os.path.join(exp.results_dir, "model.msgpack")

    exp2 = impl.B2TGruAndW2VExperiment(
        base_config(epochs=1, from_checkpoint=ckpt), yaml_cfg
    )
    # history replay pre-seeds the early-stopping window
    assert exp2.checkpoint_history is not None
    assert len(exp2.checkpoint_history.epochs) == 1
    exp2.run()
    with open(os.path.join(exp2.results_dir, "history.json")) as f:
        hist = json.load(f)
    assert len(hist["epochs"]) == 2  # 1 replayed + 1 new


def test_periodic_train_state_resume(tmp_path, synthetic_splits_dir, tiny_encoders):
    """Full train-state checkpoint (params+optimizer+rng) resumes exactly
    where it stopped: epochs continue, optimizer moments survive."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(
        base_config(epochs=2, checkpoint_every_n_epochs=1), yaml_cfg
    )
    exp.run()
    state_dir = os.path.join(exp.results_dir, "train_state")
    assert os.path.exists(os.path.join(state_dir, "state.msgpack"))

    exp2 = impl.B2TGruAndW2VExperiment(
        base_config(epochs=4, resume_train_state=state_dir), yaml_cfg
    )
    exp2.run()
    with open(os.path.join(exp2.results_dir, "history.json")) as f:
        hist = json.load(f)
    # 2 replayed epochs + 2 new ones
    assert len(hist["epochs"]) == 4


def test_checkpoint_layout_interop(tmp_path, synthetic_splits_dir, tiny_encoders):
    """Checkpoints transfer between scan-stacked and per-layer layouts."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(
        base_config(epochs=1, scan_layers=True), yaml_cfg
    )
    exp.run()
    ckpt = os.path.join(exp.results_dir, "model.msgpack")

    exp2 = impl.B2TGruAndW2VExperiment(
        base_config(epochs=1, scan_layers=False, from_checkpoint=ckpt,
                    only_test=True),
        yaml_cfg,
    )
    # loss of the reloaded model in the other layout must match the stored
    # model's test loss
    exp2.run()
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        loss_a = json.load(f)["test"]["average"]["loss"]
    with open(os.path.join(exp2.results_dir, "test_predictions.json")) as f:
        loss_b = json.load(f)["average"]["loss"]
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-4)


def test_only_test_predictions(tmp_path, synthetic_splits_dir, tiny_encoders):
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(
        base_config(only_test=True, visualize_predictions_n_batches=1), yaml_cfg
    )
    exp.run()
    pred_path = os.path.join(exp.results_dir, "test_predictions.json")
    assert os.path.exists(pred_path)
    with open(pred_path) as f:
        preds = json.load(f)
    assert len(preds["history"]) > 0
    first = preds["history"][0]
    assert "batch" in first and "predictions" in first["batch"]
    assert os.path.exists(
        os.path.join(exp.results_dir, "test_predictions", "batch_0.png")
    )


def test_data_parallel_mesh_run(tmp_path, synthetic_splits_dir, tiny_encoders):
    """8-virtual-device CPU mesh: batch sharded over 'data', ragged last
    batch padded+masked. Loss must match the single-device run."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    cfg = base_config(epochs=1, mesh_data_parallel=4, batch_size=3)
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    assert exp.mesh.shape["data"] == 4
    exp.run()
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        hist_dp = json.load(f)

    cfg1 = base_config(epochs=1, mesh_data_parallel=1, batch_size=3)
    exp1 = impl.B2TGruAndW2VExperiment(cfg1, yaml_cfg)
    exp1.run()
    with open(os.path.join(exp1.results_dir, "history.json")) as f:
        hist_1 = json.load(f)

    np.testing.assert_allclose(
        hist_dp["test"]["average"]["loss"],
        hist_1["test"]["average"]["loss"],
        rtol=2e-4,
    )


def test_model_parallel_mesh_run(tmp_path, synthetic_splits_dir, tiny_encoders):
    """2x2 dp x tp mesh: Megatron-style sharded encoder matmuls must give
    the same losses as the unsharded run."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    cfg = base_config(
        epochs=1, mesh_data_parallel=2, mesh_model_parallel=2, batch_size=2
    )
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    assert exp.mesh.shape == {"data": 2, "model": 2}
    exp.run()
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        hist_tp = json.load(f)

    cfg1 = base_config(epochs=1, mesh_data_parallel=1, batch_size=2)
    exp1 = impl.B2TGruAndW2VExperiment(cfg1, yaml_cfg)
    exp1.run()
    with open(os.path.join(exp1.results_dir, "history.json")) as f:
        hist_1 = json.load(f)

    np.testing.assert_allclose(
        hist_tp["test"]["average"]["loss"],
        hist_1["test"]["average"]["loss"],
        rtol=2e-4,
    )


def test_competition_mode_e2e(tmp_path, tiny_encoders):
    """--competition_mode routes the test split to competitionHoldOut/ and
    uses EVERY block of train/ for training (ref: brain2text.py:90-126);
    only_test produces the predictions artifact from the holdout data."""
    from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir
    from wav2vec2forbrain_tpu.experiments.args_models import (
        B2TGruAndW2VArgsModel,
    )

    splits = make_synthetic_splits_dir(
        str(tmp_path / "t12"),
        n_trials=4,
        n_blocks=2,
        seed=3,
        with_competition_holdout=True,
    )
    yaml_cfg = tiny_yaml_config(tmp_path, splits)
    cfg = base_config(
        only_test=True, competition_mode=True, visualize_predictions_n_batches=0
    )

    # split routing: test reads ALL holdout blocks; train keeps every block
    args = B2TGruAndW2VArgsModel(**cfg)
    test_ds = Brain2TextDataset(args, splits, "test")
    train_ds = Brain2TextDataset(args, splits, "train")
    # 2 sessions x 4 trials from competitionHoldOut/; train keeps ALL blocks
    assert len(test_ds) == 8
    assert len(train_ds) == 8
    # sanity: without competition_mode, test carves block 0 out of train/
    plain = B2TGruAndW2VArgsModel(**{**cfg, "competition_mode": False})
    assert len(Brain2TextDataset(plain, splits, "test")) == 4
    assert len(Brain2TextDataset(plain, splits, "train")) == 4

    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    exp.run()
    pred_path = os.path.join(exp.results_dir, "test_predictions.json")
    assert os.path.exists(pred_path)
    with open(pred_path) as f:
        preds = json.load(f)
    n_preds = sum(
        len(h["batch"]["predictions"]) for h in preds["history"] if h["batch"]
    )
    assert n_preds == 8


def test_pallas_under_dp_mesh_e2e(tmp_path, synthetic_splits_dir, tiny_encoders):
    """use_pallas with a dp4 mesh (interpret-mode kernels on sharded
    batches) must give the same test loss as the jnp path on the same
    weights (same seed, only_test)."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    losses = {}
    for use_pallas in (False, True):
        cfg = base_config(
            only_test=True,
            mesh_data_parallel=4,
            use_pallas=use_pallas,
            visualize_predictions_n_batches=0,
        )
        exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
        exp.run()
        with open(
            os.path.join(exp.results_dir, "test_predictions.json")
        ) as f:
            losses[use_pallas] = json.load(f)["average"]["loss"]
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5)


def test_h2d_dtype_float16_close_to_float32(
    tmp_path, synthetic_splits_dir, tiny_encoders
):
    """--h2d_dtype=float16 transfers the features half-width and upcasts on
    device; training must stay numerically close to the f32 wire (the inputs
    are z-scored, so f16 keeps ~3 decimal digits)."""
    # one variable per case: three wire dtypes (threaded prefetch), plus the
    # inline batch stream at the baseline dtype
    cases = {
        "float32": {},
        "float16": {"h2d_dtype": "float16"},
        "bfloat16": {"h2d_dtype": "bfloat16"},
        "act_bf16": {"activation_dtype": "bfloat16"},
        "inline_stream": {"host_prefetch": False},
    }
    losses = {}
    for name, overrides in cases.items():
        yaml_cfg = tiny_yaml_config(tmp_path / name, synthetic_splits_dir)
        exp = impl.B2TGruAndW2VExperiment(
            base_config(epochs=1, return_best_model=False, **overrides),
            yaml_cfg,
        )
        exp.run()
        with open(os.path.join(exp.results_dir, "history.json")) as f:
            hist = json.load(f)
        losses[name] = hist["test"]["average"]["loss"]
    for name in ("float16", "bfloat16", "act_bf16"):
        assert np.isfinite(losses[name])
        assert abs(losses[name] - losses["float32"]) < 0.05 * (
            1.0 + abs(losses["float32"])
        )
    # the inline stream feeds IDENTICAL batches — bitwise-equal training
    assert losses["inline_stream"] == losses["float32"]


def test_remat_policy_auto_resolution(
    tmp_path, synthetic_splits_dir, tiny_encoders
):
    """--remat_policy defaults to 'auto'. Off-accelerator (here) the HBM
    chooser never probes: scanned specs resolve to 'min' (golden numerics
    expect the baseline policy) and unrolled specs pin 'min' (the field is
    unused without the scan body, but the spec must be deterministic).
    Explicit policies pass through untouched."""
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)

    scanned = impl.B2TGruAndW2VExperiment(
        base_config(scan_layers=True), yaml_cfg
    )
    assert scanned.base_config.remat_policy == "auto"
    assert scanned.spec.remat_policy == "min"

    unrolled = impl.B2TGruAndW2VExperiment(
        base_config(scan_layers=False), yaml_cfg
    )
    assert unrolled.spec.remat_policy == "min"

    explicit = impl.B2TGruAndW2VExperiment(
        base_config(scan_layers=True, remat_policy="dots_nowide"), yaml_cfg
    )
    assert explicit.spec.remat_policy == "dots_nowide"

    # HBM-budget inputs for the accelerator path: the device-cache estimate
    # is 0 when the cache is off and the dataset footprint when it is on
    off = impl.B2TGruAndW2VExperiment(
        base_config(device_data_cache="off"), yaml_cfg
    )
    assert off._estimate_device_cache_bytes() == 0
    on = impl.B2TGruAndW2VExperiment(
        base_config(device_data_cache="on"), yaml_cfg
    )
    est = on._estimate_device_cache_bytes()
    n = sum(
        len(dl.dataset)
        for dl in (on.dataloader_train, on.dataloader_val, on.dataloader_test)
    )
    # (T, C) at the f32 wire default, every sample padded to the bucket
    assert est == n * 256 * 256 * 4
