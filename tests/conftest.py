"""Test config: force CPU with 8 virtual devices so sharding/mesh tests run
without TPU hardware (the TPU equivalent of multi-node simulation)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even under the axon TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter start; re-force CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    """Real-artifact validation hooks (docs/REAL_ARTIFACT_VALIDATION.md).

    The artifacts are unreachable in the build environment (zero egress,
    private T12 data); tests/test_real_artifacts.py skips unless these are
    passed, so the runbook is copy-paste executable the day they exist."""
    parser.addoption(
        "--real-checkpoint",
        default=None,
        help="HF checkpoint id/path for full-size golden validation "
        "(e.g. facebook/wav2vec2-conformer-rope-large-960h-ft)",
    )
    parser.addoption(
        "--real-arpa",
        default=None,
        help="path to a real ARPA LM (the reference's 3gram.arpa)",
    )
    parser.addoption(
        "--real-binary",
        default=None,
        help="path to a kenlm build_binary probing binary of --real-arpa",
    )


@pytest.fixture(scope="session")
def synthetic_splits_dir(tmp_path_factory):
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    root = tmp_path_factory.mktemp("t12_synth")
    return make_synthetic_splits_dir(str(root), n_trials=6, n_blocks=2, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
