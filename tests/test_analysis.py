"""Analysis + profiling subsystem tests."""

import json
import os

import numpy as np

from wav2vec2forbrain_tpu.analysis.results_analysis import (
    compare_setups,
    load_sweep_summary,
    setup_stats,
)
from wav2vec2forbrain_tpu.analysis.latent_analysis import (
    latent_statistics,
    plot_latent_comparison,
)
from wav2vec2forbrain_tpu.util.profiling import StepTimer


def test_load_sweep_summary_jsonl(tmp_path):
    p = tmp_path / "summary.jsonl"
    rows = [{"run": i, "test_ctc_loss": 1.0 + i} for i in range(4)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    vals = load_sweep_summary(str(p), "test_ctc_loss")
    assert vals == [1.0, 2.0, 3.0, 4.0]


def test_load_sweep_summary_csv(tmp_path):
    p = tmp_path / "fft.csv"
    p.write_text("name,test_word_error_rate\nrun1,0.35\nrun2,0.31\nrun3,\n")
    vals = load_sweep_summary(str(p), "test_word_error_rate")
    assert vals == [0.35, 0.31]


def test_compare_setups_with_wilcoxon(tmp_path):
    rng = np.random.default_rng(0)
    fft = list(rng.normal(0.35, 0.02, 20))
    frozen = list(rng.normal(0.55, 0.03, 20))
    out = compare_setups(
        {"fft": fft, "frozen": frozen}, out_plot=str(tmp_path / "box.png")
    )
    assert out["fft"]["n"] == 20
    assert out["fft"]["median"] < out["frozen"]["median"]
    w = out["_pairwise_wilcoxon"]["fft_vs_frozen"]
    assert w["p_value"] < 0.01
    assert (tmp_path / "box.png").exists()


def test_latent_statistics_and_plot(tmp_path):
    rng = np.random.default_rng(0)
    brain = rng.normal(0, 1, (50, 16))
    audio = rng.normal(0.5, 1, (60, 16))
    stats = latent_statistics(brain, audio)
    assert -1 <= stats["centroid_cosine"] <= 1
    assert np.asarray(stats["brain_pca"]).shape == (50, 2)
    plot_latent_comparison(stats, str(tmp_path / "latent.png"))
    assert (tmp_path / "latent.png").exists()


def test_embed_brain_and_audio(tmp_path, synthetic_splits_dir, monkeypatch):
    """Latent-analysis embeddings run against a real (tiny) experiment."""
    import jax

    import wav2vec2forbrain_tpu.experiments.impl as impl
    from tests.test_train_e2e import base_config, tiny_yaml_config
    from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
    from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig
    from wav2vec2forbrain_tpu.analysis.latent_analysis import (
        embed_audio,
        embed_brain,
        latent_statistics,
    )
    from wav2vec2forbrain_tpu.models.audio_frontend import (
        FeatureEncoderConfig,
        init_feature_encoder_params,
    )

    def fake_cfg(checkpoint):
        return "wav2vec2", Wav2Vec2EncoderConfig.tiny_test()

    monkeypatch.setattr(impl, "encoder_config_for_checkpoint", fake_cfg)
    monkeypatch.setitem(
        PRETRAINED_LATENT_SIZES, "facebook/wav2vec2-base-960h", 96
    )
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(base_config(), yaml_cfg)
    brain = embed_brain(exp, max_batches=1)
    assert brain.ndim == 2 and brain.shape[1] == 96

    fe_cfg = FeatureEncoderConfig(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=96,
    )
    fe_params = init_feature_encoder_params(jax.random.PRNGKey(0), fe_cfg)
    audio = [np.random.default_rng(0).standard_normal((2, 400)).astype(np.float32)]
    aud = embed_audio(audio, fe_params, fe_cfg)
    assert aud.shape[1] == 96
    stats = latent_statistics(brain, aud)
    assert "centroid_cosine" in stats


def test_step_timer():
    t = StepTimer()
    t.add(0.1, 32)
    t.add(0.1, 32)
    m = t.metrics("train", n_chips=2)
    assert m["train_step_ms"] == 100.0
    assert m["train_samples_per_sec"] == 320.0
    assert m["train_samples_per_sec_per_chip"] == 160.0
    assert setup_stats([])["n"] == 0


def test_tts_generation_orchestration(tmp_path):
    """generate_speech_audio mirrors the reference's resume-capable
    generate→mp3→wav flow (ref: latent_analysis_util.py:55-80) with
    injectable callables, so the orchestration runs offline."""
    from wav2vec2forbrain_tpu.analysis.latent_analysis import (
        generate_speech_audio,
    )

    tts_calls = []
    conv_calls = []

    def fake_tts(text, mp3_path):
        tts_calls.append(text)
        with open(mp3_path, "wb") as f:
            f.write(text.encode())

    def fake_convert(mp3_path, wav_path):
        conv_calls.append(mp3_path)
        with open(mp3_path, "rb") as src, open(wav_path, "wb") as dst:
            dst.write(src.read())

    texts = ["HELLO WORLD", "THE CAT SAT"]
    out = generate_speech_audio(
        texts, str(tmp_path), tts=fake_tts, mp3_to_wav=fake_convert
    )
    assert out["newly_generated"] == 2
    assert tts_calls == texts
    assert [os.path.basename(p) for p in out["wav_paths"]] == ["0.wav", "1.wav"]
    assert all(os.path.exists(p) for p in out["wav_paths"])

    # resume: nothing regenerated on the second run
    out2 = generate_speech_audio(
        texts, str(tmp_path), tts=fake_tts, mp3_to_wav=fake_convert
    )
    assert out2["newly_generated"] == 0
    assert len(tts_calls) == 2 and len(conv_calls) == 2

    # a new transcript only generates the missing index
    out3 = generate_speech_audio(
        texts + ["NEW ONE"], str(tmp_path), tts=fake_tts, mp3_to_wav=fake_convert
    )
    assert out3["newly_generated"] == 1
    assert tts_calls[-1] == "NEW ONE"


def test_tts_generation_offline_reuses_existing(tmp_path):
    from wav2vec2forbrain_tpu.analysis.latent_analysis import (
        generate_speech_audio,
        make_elevenlabs_tts,
    )

    # no key -> no TTS callable
    assert make_elevenlabs_tts(None) is None
    assert make_elevenlabs_tts("<your value here>") is None

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    (wav_dir / "0.wav").write_bytes(b"x")
    out = generate_speech_audio(["A", "B"], str(tmp_path), tts=None)
    assert out["wav_paths"][0] is not None
    assert out["wav_paths"][1] is None
    assert out["missing"] == 1


def test_post_encoder_representations(tmp_path, synthetic_splits_dir, monkeypatch):
    """Reference parity for the POST-encoder comparison: both streams run
    through the w2v encoder and pre/post spaces are compared
    (ref: src/analysis/latent_analysis_util.py:126-161 audio, :165-214
    brain). Pre rows must equal the pre-only embed_brain path."""
    import jax

    import wav2vec2forbrain_tpu.experiments.impl as impl
    from tests.test_train_e2e import base_config, tiny_yaml_config
    from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
    from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig
    from wav2vec2forbrain_tpu.analysis.latent_analysis import (
        embed_audio_representations,
        embed_brain,
        embed_brain_representations,
        representation_statistics,
    )
    from wav2vec2forbrain_tpu.models.audio_frontend import (
        FeatureEncoderConfig,
        init_feature_encoder_params,
    )

    cfg = Wav2Vec2EncoderConfig.tiny_test()
    monkeypatch.setattr(
        impl, "encoder_config_for_checkpoint", lambda c: ("wav2vec2", cfg)
    )
    monkeypatch.setitem(
        PRETRAINED_LATENT_SIZES, "facebook/wav2vec2-base-960h", 96
    )
    yaml_cfg = tiny_yaml_config(tmp_path, synthetic_splits_dir)
    exp = impl.B2TGruAndW2VExperiment(base_config(), yaml_cfg)

    brain = embed_brain_representations(exp, max_batches=1)
    assert brain["pre"].shape[1] == 96
    assert brain["post"].shape == brain["pre"].shape  # hidden == latent here
    assert brain["pre_agg"].shape[0] == brain["post_agg"].shape[0]
    # the pre space must be exactly what the pre-only path computes
    np.testing.assert_allclose(
        brain["pre"], embed_brain(exp, max_batches=1), atol=1e-5
    )
    # the encoder must actually transform the representation
    assert not np.allclose(brain["post"], brain["pre"], atol=1e-3)

    fe_cfg = FeatureEncoderConfig(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=96,
    )
    fe_params = init_feature_encoder_params(jax.random.PRNGKey(0), fe_cfg)
    audio_batches = [
        np.random.default_rng(0).standard_normal((2, 400)).astype(np.float32)
    ]
    enc_params = jax.device_get(exp._merged_params())["w2v"]["encoder"]
    audio = embed_audio_representations(
        audio_batches, fe_params, fe_cfg, enc_params, cfg
    )
    assert audio["post"].shape[1] == 96

    stats = representation_statistics(brain, audio)
    assert "centroid_cosine" in stats["pre"]
    assert "centroid_cosine" in stats["post"]
    assert np.isfinite(stats["post"]["centroid_cosine"])


def test_greedy_decode_truncates_at_batch_max_len():
    """The greedy evaluator decodes exactly the width the reference pads to
    (max(logit_lens)), so --pad_to_multiple bucket tails never leak argmax
    garbage into WER; frames between a sample's own length and the batch max
    ARE decoded (reference parity: evaluator.py:57-120 decodes the full
    batch-max-padded tensor)."""
    from wav2vec2forbrain_tpu.data.batch import B2tBatch
    from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
    from wav2vec2forbrain_tpu.train.evaluator import DefaultEvaluator

    tok = Wav2Vec2CTCTokenizer()
    vocab = tok.get_vocab_list()
    a_id = vocab.index("A")
    t_id = vocab.index("T")
    # 2 samples, bucket width 8; logit_lens = [3, 5] -> decode width 5.
    # Sample 0 carries garbage in frames 3..4 (inside batch max: decoded,
    # like the reference) and in 5..7 (bucket tail: dropped).
    pad = 0
    pred_ids = np.array(
        [
            [a_id, pad, pad, t_id, pad, t_id, t_id, t_id],
            [a_id, pad, a_id, pad, a_id, t_id, t_id, t_id],
        ],
        dtype=np.int32,
    )
    target = np.array([[a_id, t_id], [a_id, a_id]], dtype=np.int32)
    batch = B2tBatch(
        input=np.zeros((2, 8, 4), np.float32),
        target=target,
        day_idxs=np.zeros((2,), np.int32),
        input_lens=np.array([3, 5], np.int32),
        target_lens=np.array([2, 2], np.int32),
    )
    ev = DefaultEvaluator(tok, "val")
    preds = {
        "loss": 0.0,
        "pred_ids": pred_ids,
        "logit_lens": np.array([3, 5], np.int32),
    }
    decoded, _labels = ev.decode_predictions(preds, batch)
    assert decoded[0] == "AT"     # frame-3 T decoded, bucket tail T's not
    assert decoded[1] == "AAA"    # three A's collapse-safe via pad gaps

    # without logit_lens the full width decodes (backward-compatible path)
    decoded_full, _ = ev.decode_predictions(
        {"loss": 0.0, "pred_ids": pred_ids}, batch
    )
    assert decoded_full[0] == "ATT"


def test_greedy_decode_crop_lens_blanks_per_sample_tail():
    """--greedy_decode_crop_lens: per-sample frames past logit_lens are
    blanked (opt-in; default keeps reference batch-max-width behaviour)."""
    from wav2vec2forbrain_tpu.data.batch import B2tBatch
    from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
    from wav2vec2forbrain_tpu.train.evaluator import DefaultEvaluator

    tok = Wav2Vec2CTCTokenizer()
    vocab = tok.get_vocab_list()
    a_id, t_id = vocab.index("A"), vocab.index("T")
    pred_ids = np.array(
        [[a_id, 0, 0, t_id, 0], [a_id, 0, a_id, 0, a_id]], dtype=np.int32
    )
    batch = B2tBatch(
        input=np.zeros((2, 5, 4), np.float32),
        target=np.array([[a_id], [a_id]], np.int32),
        day_idxs=np.zeros((2,), np.int32),
        input_lens=np.array([3, 5], np.int32),
        target_lens=np.array([1, 1], np.int32),
    )
    preds = {
        "loss": 0.0,
        "pred_ids": pred_ids,
        "logit_lens": np.array([3, 5], np.int32),
    }
    cropped = DefaultEvaluator(tok, "val", crop_lens=True)
    dec, _ = cropped.decode_predictions(preds, batch)
    assert dec[0] == "A"  # frame-3 T is past sample 0's length: blanked
    assert dec[1] == "AAA"
    parity = DefaultEvaluator(tok, "val")
    dec2, _ = parity.decode_predictions(preds, batch)
    assert dec2[0] == "AT"


# --- raw-data EDA (analysis/raw_data_analysis.py) ---------------------------


def test_raw_eda_binning_and_correlation():
    from wav2vec2forbrain_tpu.analysis import raw_data_analysis as eda

    rng = np.random.default_rng(0)
    t, c = 200, 8
    base = rng.normal(size=(t, 1))
    # 8 channels = one shared signal + small noise -> high avg correlation
    x = base + 0.05 * rng.normal(size=(t, c))
    binned = eda.bin_time_series(x, 10)
    assert binned.shape == (20, c)
    np.testing.assert_allclose(binned[0], x[:10].mean(axis=0))
    assert eda.avg_correlation(x) > 0.9

    # independent channels -> low correlation
    y = rng.normal(size=(t, c))
    assert eda.avg_correlation(y) < 0.5

    # constant channel must not produce NaNs
    z = y.copy()
    z[:, 0] = 3.0
    assert np.isfinite(eda.avg_correlation(z))


def test_raw_eda_optimal_window_prefers_signal_scale():
    from wav2vec2forbrain_tpu.analysis import raw_data_analysis as eda

    rng = np.random.default_rng(1)
    t, c = 600, 6
    # shared slow signal: frame-level noise decorrelates channels, so
    # averaging over larger windows raises cross-channel correlation and
    # the penalty-free argmax should sit well above the minimum window
    slow = np.repeat(rng.normal(size=(t // 20, 1)), 20, axis=0)
    x = slow + 1.5 * rng.normal(size=(t, c))
    win = eda.optimal_window(x, max_bin_len=60, bin_len_penalty=0.2)
    assert set(win) >= {"bin_lens", "scores", "best_bin_len"}
    assert win["best_bin_len_no_penalty"] > 5
    # penalty can only pull the choice toward shorter windows
    assert win["best_bin_len"] <= win["best_bin_len_no_penalty"] + 5


def test_raw_eda_pca_counts():
    from wav2vec2forbrain_tpu.analysis import raw_data_analysis as eda

    rng = np.random.default_rng(2)
    # rank-2 data: 95% of variance within the first 2 components
    t, c = 300, 10
    basis = rng.normal(size=(2, c))
    x = rng.normal(size=(t, 2)) @ basis + 1e-3 * rng.normal(size=(t, c))
    assert eda.pca_components_for_variance(x, 0.95) <= 2
    ratios = eda.pca_explained_variance_ratio(x)
    assert abs(ratios.sum() - 1.0) < 1e-9
    proj = eda.pca_project(x, 2)
    assert proj.shape == (t, 2)


def test_raw_eda_dataset_summary_and_figures(tmp_path, synthetic_splits_dir):
    from wav2vec2forbrain_tpu.analysis import raw_data_analysis as eda
    from wav2vec2forbrain_tpu.args.base_args import B2TDatasetArgsModel
    from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset

    ds = Brain2TextDataset(
        B2TDatasetArgsModel(), synthetic_splits_dir, split="train"
    )
    summary = eda.analyze_dataset(ds, max_samples=4, seed=0)
    assert summary["n_analyzed"] == min(4, len(ds))
    cmat = summary["channel_correlation"]
    assert cmat.shape[0] == cmat.shape[1] == summary["channel_stats"]["n_channels"]
    np.testing.assert_allclose(np.diag(cmat), 1.0)
    assert summary["channel_stats"]["per_day"]  # grouped by day

    out = eda.summary_json(summary)
    json.dumps(out)  # must be serializable

    figs = eda.save_figures(summary, str(tmp_path / "figs"))
    assert len(figs) == 4 and all(os.path.exists(p) for p in figs)


def test_raw_eda_cli(tmp_path, synthetic_splits_dir, capsys):
    from wav2vec2forbrain_tpu.analysis.raw_data_analysis import main

    out = main(
        [
            "--dataset_splits_dir",
            synthetic_splits_dir,
            "--max_samples",
            "3",
            "--fig_dir",
            str(tmp_path / "figs"),
        ]
    )
    assert out["n_analyzed"] >= 1
    assert os.path.exists(tmp_path / "figs" / "raw_data_summary.json")
