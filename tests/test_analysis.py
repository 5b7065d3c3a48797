"""Analysis + profiling subsystem tests."""

import json

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


def test_step_timer():
    t = StepTimer()
    t.add(0.1, 32)
    t.add(0.1, 32)
    m = t.metrics("train", n_chips=2)
    assert m["train_step_ms"] == 100.0
    assert m["train_samples_per_sec"] == 320.0
    assert m["train_samples_per_sec_per_chip"] == 160.0
    assert setup_stats([])["n"] == 0
