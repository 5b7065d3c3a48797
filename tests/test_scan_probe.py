"""scan_layers=auto compile-cache probe (util/compile_probe.py).

The probe must answer "is the unrolled train-step program already in the
persistent compile cache?" across PROCESSES: a warm run with
--scan_layers=false writes the executable; a later --scan_layers=auto run
must reconstruct the byte-identical lowered program (same shapes, shardings,
donation) and detect the hit without compiling. Subprocesses are the only
honest test of that key match.
"""

import os
import subprocess
import sys

_COMMON = r"""
import os, sys
import wav2vec2forbrain_tpu.experiments.impl as impl
from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
from wav2vec2forbrain_tpu.args.yaml_config import YamlConfigModel
from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

CKPT = "facebook/wav2vec2-base-960h"
impl.encoder_config_for_checkpoint = lambda c: (
    "wav2vec2", Wav2Vec2EncoderConfig.tiny_test())
PRETRAINED_LATENT_SIZES[CKPT] = 96

root = sys.argv[1]
yaml_cfg = YamlConfigModel(
    cache_dir=os.path.join(root, "cache"),
    fig_dir=os.path.join(root, "figs"),
    n3gram_lm_model_path=os.path.join(root, "missing3.arpa"),
    n5gram_lm_model_path=os.path.join(root, "missing5.arpa"),
    dataset_splits_dir=os.path.join(root, "t12"),
    wandb_api_key="offline",
)


def make_exp(scan_layers, **extra):
    cfg = dict(
        experiment_type="b2p2t_gru+w2v",
        batch_size=2,
        epochs=60,  # planned steps >= probe threshold
        learning_rate=1e-3,
        w2v_skip_loading_weights=True,
        encoder_gru_hidden_size=16,
        encoder_num_gru_layers=1,
        seed=0,
        use_wandb=False,
        pad_to_multiple=256,
        target_pad_to_multiple=32,
        scan_layers=scan_layers,
    )
    cfg.update(extra)
    return impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)


# force the chunked-Trainer path on CPU (where auto resolves both off):
# the probe must then lower the K-step chunk program, not the single step
CHUNKED = dict(multi_step_chunk="4", device_data_cache="on")
"""

_WARM = _COMMON + r"""
import jax
# persist even fast CPU compiles so the probe process can find them
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
exp = make_exp(scan_layers=False)
from wav2vec2forbrain_tpu.train.train_loop import Trainer
tr = Trainer(exp)
batch = next(iter(exp.dataloader_train))
dev_b, _ = tr._put(batch)
out = exp.train_step(
    tr.trainable, tr.frozen, tr.opt_state, tr.model_state, dev_b, tr.rng,
    1e-4, 1e-5,
)
out.loss.block_until_ready()
print("WARMED")
"""

_PROBE = _COMMON + r"""
exp = make_exp(scan_layers="auto")
print("RESOLVED_SCAN", exp.spec.scan_layers)
"""

_WARM_CHUNKED = _COMMON + r"""
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
exp = make_exp(scan_layers=False, **CHUNKED)
from wav2vec2forbrain_tpu.train.train_loop import Trainer
tr = Trainer(exp)
assert tr._multi_step_k >= 2 and tr._cache_by_loader, "chunking inactive?"
# one real chunked train epoch: compiles (and persists) the Trainer's
# actual (K, width) multi-step program
tr._train_epoch(exp.dataloader_train, 0)
print("WARMED_CHUNKED")
"""

_PROBE_CHUNKED = _COMMON + r"""
exp = make_exp(scan_layers="auto", **CHUNKED)
assert exp._trainer_would_chunk(), "probe must target the chunk program"
print("RESOLVED_SCAN", exp.spec.scan_layers)
"""


def _run(script, root, cache_dir):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        JAX_COMPILATION_CACHE_DIR=cache_dir,
        HF_HUB_OFFLINE="1",
        TRANSFORMERS_OFFLINE="1",
    )
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    return subprocess.run(
        [sys.executable, "-c", script, root],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_auto_unrolls_on_cache_hit_across_processes(tmp_path):
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    root = str(tmp_path)
    make_synthetic_splits_dir(
        os.path.join(root, "t12"), n_trials=8, n_blocks=2, seed=0
    )
    cache_dir = os.path.join(root, "xla_cache")

    # cold cache: auto stays scanned (and the probe ran without error)
    r_cold = _run(_PROBE, root, cache_dir)
    assert "RESOLVED_SCAN True" in r_cold.stdout, (
        r_cold.stdout + r_cold.stderr
    )
    assert "probe failed" not in r_cold.stdout, r_cold.stdout

    # warm the cache with an explicit unrolled run in another process
    r_warm = _run(_WARM, root, cache_dir)
    assert "WARMED" in r_warm.stdout, r_warm.stdout + r_warm.stderr

    # auto must now detect the hit and pick unrolled
    r_hot = _run(_PROBE, root, cache_dir)
    assert "RESOLVED_SCAN False" in r_hot.stdout, (
        r_hot.stdout + r_hot.stderr
    )
    assert "already compiled" in r_hot.stdout, r_hot.stdout


def test_auto_unrolls_on_chunked_trainer_cache_hit(tmp_path):
    """Round-4 regression: with --multi_step_chunk + device cache active the
    Trainer compiles the K-step chunk program (train/steps.build_multi_step),
    not the single step — the probe must lower THAT program or a warm cache
    reads as cold. The cross-process hit below proves the probe's lowering
    and the Trainer's real compile share a persistent-cache key."""
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    root = str(tmp_path)
    make_synthetic_splits_dir(
        os.path.join(root, "t12"), n_trials=8, n_blocks=2, seed=0
    )
    cache_dir = os.path.join(root, "xla_cache")

    # cold: stays scanned, probe ran (and targeted the chunk program)
    r_cold = _run(_PROBE_CHUNKED, root, cache_dir)
    assert "RESOLVED_SCAN True" in r_cold.stdout, (
        r_cold.stdout + r_cold.stderr
    )
    assert "probe failed" not in r_cold.stdout, r_cold.stdout

    # warm with a REAL chunked Trainer epoch in another process
    r_warm = _run(_WARM_CHUNKED, root, cache_dir)
    assert "WARMED_CHUNKED" in r_warm.stdout, r_warm.stdout + r_warm.stderr

    r_hot = _run(_PROBE_CHUNKED, root, cache_dir)
    assert "RESOLVED_SCAN False" in r_hot.stdout, (
        r_hot.stdout + r_hot.stderr
    )
    assert "already compiled" in r_hot.stdout, r_hot.stdout
