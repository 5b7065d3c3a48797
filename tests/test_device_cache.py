"""Device-resident dataset cache (train/device_cache.py) parity tests.

The cache must be a pure transport optimization: with a single (T, U)
bucket, gathered device batches are bit-identical to collated+padded
streamed batches, and a full Trainer run produces identical losses either
way (same shuffle RNG stream via DataLoader.iter_index_batches).
"""

import json
import os

import jax
import numpy as np
import pytest

import wav2vec2forbrain_tpu.experiments.impl as impl
from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset
from wav2vec2forbrain_tpu.data.loader import DataLoader
from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.train.device_cache import (
    DeviceDatasetCache,
    build_split_caches,
)
from wav2vec2forbrain_tpu.train.train_loop import _pad_batch

from test_train_e2e import W2V_CKPT, base_config, tiny_yaml_config

# reuse the tiny-encoder monkeypatching fixture
from test_train_e2e import tiny_encoders  # noqa: F401


def _make_loader(synthetic_splits_dir, batch_size=3, shuffle=False):
    from wav2vec2forbrain_tpu.args.base_args import B2TDatasetArgsModel

    class _Cfg(B2TDatasetArgsModel):
        pass

    cfg = _Cfg()
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, split="train")
    tok = Wav2Vec2CTCTokenizer.from_pretrained(W2V_CKPT)
    collate = ds.get_collate_fn(
        tok, pad_to_multiple=256, target_pad_to_multiple=32
    )
    return (
        DataLoader(ds, batch_size, collate, shuffle=shuffle, seed=0),
        ds,
        tok,
    )


def _plan(ds, tok, wire="float32"):
    return DeviceDatasetCache.plan(
        ds,
        tok,
        pad_to_multiple=256,
        target_pad_to_multiple=32,
        wire_dtype=wire,
    )


def test_gathered_batch_matches_collated(synthetic_splits_dir):
    loader, ds, tok = _make_loader(synthetic_splits_dir)
    cache = _plan(ds, tok).upload()

    collated = list(loader)
    streamed = list(cache.stream(loader, batch_size=3, data_axis=1))
    assert len(collated) == len(streamed)
    for host, (dev_b, true_b, host_b) in zip(collated, streamed):
        assert true_b == host.input.shape[0]
        ref = _pad_batch(host, max(3, true_b))
        np.testing.assert_array_equal(np.asarray(dev_b.input), ref.input)
        np.testing.assert_array_equal(np.asarray(dev_b.target), ref.target)
        np.testing.assert_array_equal(np.asarray(dev_b.day_idxs), ref.day_idxs)
        np.testing.assert_array_equal(
            np.asarray(dev_b.input_lens), ref.input_lens
        )
        np.testing.assert_array_equal(
            np.asarray(dev_b.target_lens), ref.target_lens
        )
        np.testing.assert_array_equal(
            np.asarray(dev_b.sample_mask), ref.sample_mask
        )
        # evaluator's host view: true rows of the same arrays
        np.testing.assert_array_equal(host_b.target, host.target)
        np.testing.assert_array_equal(host_b.target_lens, host.target_lens)


def test_shuffle_order_identical_to_streaming(synthetic_splits_dir):
    loader_a, ds, tok = _make_loader(synthetic_splits_dir, shuffle=True)
    loader_b, _, _ = _make_loader(synthetic_splits_dir, shuffle=True)
    cache = _plan(ds, tok).upload()
    # two epochs: the RNG stream must advance identically in both modes
    for _ in range(2):
        streamed = [b.day_idxs.tolist() for b in loader_a]
        gathered = [
            hb.day_idxs.tolist()
            for _, _, hb in cache.stream(loader_b, batch_size=3)
        ]
        assert streamed == gathered


def test_wire_dtype_storage(synthetic_splits_dir):
    _, ds, tok = _make_loader(synthetic_splits_dir)
    cache = _plan(ds, tok, wire="float16").upload()
    batch = cache.device_batch(
        np.zeros((3,), np.int32), np.ones((3,), np.float32)
    )
    assert batch.input.dtype == np.float16


def test_budget_falls_back_to_streaming(synthetic_splits_dir, capsys):
    loader, ds, tok = _make_loader(synthetic_splits_dir)

    class _Cfg:
        pad_to_multiple = 256
        target_pad_to_multiple = 32
        h2d_dtype = "float32"
        remove_punctuation = True
        preprocessing = "seperate_zscoring"

    caches = build_split_caches(
        {"train": loader}, tok, _Cfg(), max_bytes=1, verbose=True
    )
    assert caches == {}
    assert "exceeds" in capsys.readouterr().out


def test_dp_mesh_gather_sharded(synthetic_splits_dir):
    from jax.sharding import PartitionSpec as P

    from wav2vec2forbrain_tpu.parallel.mesh import batch_sharding, make_mesh

    loader, ds, tok = _make_loader(synthetic_splits_dir, batch_size=4)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    cache = _plan(ds, tok).upload(mesh, batch_sharding(mesh))
    (dev_b, true_b, _host_b) = next(iter(cache.stream(loader, batch_size=4)))
    assert dev_b.input.sharding.spec == P("data")
    ref = _pad_batch(next(iter(loader)), 4)
    np.testing.assert_array_equal(np.asarray(dev_b.input), ref.input)


def test_trainer_cached_equals_streamed(
    tmp_path, synthetic_splits_dir, tiny_encoders  # noqa: F811
):
    """Full e2e: device_data_cache=on reproduces the streamed run's losses
    exactly (single-bucket config, identical shuffle stream, CPU floats are
    deterministic)."""
    histories = []
    for mode in ("off", "on"):
        yaml_cfg = tiny_yaml_config(tmp_path / mode, synthetic_splits_dir)
        cfg = base_config(device_data_cache=mode, epochs=2)
        exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
        exp.run()
        with open(os.path.join(exp.results_dir, "history.json")) as f:
            histories.append(json.load(f))
    off, on = histories
    for e_off, e_on in zip(off["epochs"], on["epochs"]):
        for split in ("train", "val"):
            assert e_off[split]["average"]["loss"] == pytest.approx(
                e_on[split]["average"]["loss"], rel=1e-6
            )
    assert off["test"]["average"]["loss"] == pytest.approx(
        on["test"]["average"]["loss"], rel=1e-6
    )
