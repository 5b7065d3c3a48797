"""Multi-host (2-process) wiring test.

Runs the REAL experiment lifecycle under jax.distributed with 2 processes
x 4 virtual CPU devices each (the CPU stand-in for a 2-host TPU pod slice,
gloo collectives over localhost), and checks that:

- the run completes end-to-end (device cache upload, sharded gathers,
  multi-step chunks, evaluator payload fetches, best-model save/reload)
- only process 0 writes artifacts (config.json/history.json/metrics.jsonl)
- process 0's losses match a single-process 8-virtual-device run of the
  SAME config to float-reduction tolerance (the global batch, shuffle
  order, and optimizer math are identical; only the all-reduce topology
  differs)

Covers parallel/distributed.py (host_fetchable, is_coordinator, barrier,
shared_uuid) and the Trainer/experiment coordinator guards.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(TESTS_DIR)

CHILD = r"""
import os, sys
import jax

# force CPU + 4 virtual devices BEFORE any backend/distributed init (the
# axon sitecustomize pre-sets jax_platforms; tests must override in-process)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

tests_dir, splits_dir, out_dir = sys.argv[1:4]
sys.path.insert(0, tests_dir)

import wav2vec2forbrain_tpu.experiments.impl as impl
from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

impl.encoder_config_for_checkpoint = lambda ckpt: (
    "wav2vec2", Wav2Vec2EncoderConfig.tiny_test()
)
PRETRAINED_LATENT_SIZES["facebook/wav2vec2-base-960h"] = 96

from pathlib import Path
from test_train_e2e import base_config, tiny_yaml_config

yaml_cfg = tiny_yaml_config(Path(out_dir), splits_dir)
cfg = base_config(
    batch_size=8, epochs=2, device_data_cache="on", multi_step_chunk=2
)
exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
exp.run()
print("RESULTS_DIR=" + exp.results_dir, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def hetero_splits(tmp_path_factory):
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    root = tmp_path_factory.mktemp("t12_mh")
    return make_synthetic_splits_dir(str(root), n_trials=10, n_blocks=2, seed=0)


def test_two_process_train_matches_single_process(
    tmp_path, hetero_splits, tiny_encoders  # noqa: F811
):
    port = _free_port()
    child_path = tmp_path / "mh_child.py"
    child_path.write_text(CHILD)
    # ONE shared output dir: multi-host runs require the results/cache tree
    # on a filesystem every process can read (the coordinator writes, the
    # others read back e.g. the best-model checkpoint)
    shared_dir = tmp_path / "shared"
    shared_dir.mkdir()
    procs = []
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO_DIR + os.pathsep + env_base.get("PYTHONPATH", "")
    # the child forces platform via jax.config, not env (conftest's env vars
    # leak here and are harmless, but JAX_PLATFORMS must not name axon)
    env_base["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"
    for pid in (0, 1):
        env = dict(env_base)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(child_path), TESTS_DIR, hetero_splits,
                 str(shared_dir)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    # artifact writes: coordinator only
    res0 = [l for l in outs[0].splitlines() if l.startswith("RESULTS_DIR=")]
    assert res0, outs[0][-2000:]
    results_dir = res0[0].split("=", 1)[1]
    for name in ("config.json", "history.json", "metrics.jsonl", "model.msgpack"):
        assert os.path.exists(os.path.join(results_dir, name)), name
    # exactly ONE run directory exists (process 1 never mkdir'd its own —
    # its timestamped results_dir path is merely computed, never created)
    runs = os.listdir(os.path.dirname(results_dir))
    assert runs == [os.path.basename(results_dir)], runs
    # the temp best-model dir was cleaned up by the coordinator after the
    # barrier-synchronized reload
    ckpt_root = os.path.join(str(shared_dir), "cache", "model_checkpoints")
    assert os.listdir(ckpt_root) == [], os.listdir(ckpt_root)

    # numerics: proc0 history == single-process 8-device run (same config)
    import wav2vec2forbrain_tpu.experiments.impl as impl
    from test_train_e2e import base_config, tiny_yaml_config

    yaml_cfg = tiny_yaml_config(tmp_path / "single", hetero_splits)
    cfg = base_config(
        batch_size=8, epochs=2, device_data_cache="on", multi_step_chunk=2
    )
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    exp.run()
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        single = json.load(f)
    with open(os.path.join(results_dir, "history.json")) as f:
        multi = json.load(f)
    for e_s, e_m in zip(single["epochs"], multi["epochs"]):
        for split in ("train", "val"):
            assert e_s[split]["average"]["loss"] == pytest.approx(
                e_m[split]["average"]["loss"], rel=1e-4
            ), split
    assert single["test"]["average"]["loss"] == pytest.approx(
        multi["test"]["average"]["loss"], rel=1e-4
    )
    assert np.isfinite(single["test"]["average"]["loss"])


# reuse the tiny-encoder patch from the e2e suite for the in-process run
from test_train_e2e import tiny_encoders  # noqa: E402,F401
