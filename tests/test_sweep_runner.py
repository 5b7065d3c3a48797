"""Local sweep runner: grid expansion, flag extraction, metric lookup."""

import importlib.util
import json
import os
import sys

import yaml

spec = importlib.util.spec_from_file_location(
    "sweep", os.path.join(os.path.dirname(__file__), "..", "sweep.py")
)
sweep = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sweep)

SWEEPS_DIR = os.path.join(os.path.dirname(__file__), "..", "sweeps")


def test_reference_sweep_yaml_grids():
    """All three sweep YAMLs expand to the reference's 45-run grid."""
    for name in (
        "b2p2t_gru+w2v_frozen_w2v.yaml",
        "b2p2t_gru+w2v_full_fine_tuning.yaml",
        "b2p2t_gru+w2v_training_from_scratch.yaml",
    ):
        with open(os.path.join(SWEEPS_DIR, name)) as f:
            cfg = yaml.safe_load(f)
        grid = list(sweep.expand_grid(cfg["parameters"]))
        assert len(grid) == 45, name
        assert cfg["run_cap"] == 45
        assert cfg["metric"]["name"] == "test_ctc_loss"
        flags = sweep.fixed_flags(cfg["command"])
        assert any(f.startswith("--experiment_type=") for f in flags)
        assert not any(f.startswith("--use_wandb") for f in flags)


def test_fixed_flags_skips_placeholders():
    cmd = ["${env}", "${interpreter}", "run.py", "${args}", "--a=1", "--use_wandb=true"]
    assert sweep.fixed_flags(cmd) == ["--a=1"]


def test_read_metric(tmp_path):
    d = tmp_path / "experiment_results" / "exp" / "run1"
    os.makedirs(d)
    with open(d / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"_type": "metrics", "test_ctc_loss": 2.0}) + "\n")
        f.write(json.dumps({"_type": "metrics", "test_ctc_loss": 1.5}) + "\n")
    value, run_dir = sweep.read_metric(str(tmp_path), "exp", "test_ctc_loss")
    assert value == 1.5
    assert run_dir == str(d)
    missing, _ = sweep.read_metric(str(tmp_path), "nope", "test_ctc_loss")
    assert missing is None
