"""Length-bucket tests (train/device_cache.py multi-bucket gathers).

With --length_buckets=N each cached batch is gathered at the smallest
bucket width covering its longest sample instead of the dataset-wide max.
For models whose padding is exactly masked (the gru+w2v family), losses are
independent of padding width — so a bucketed run must reproduce the
single-bucket run's losses while running most batches at narrower shapes.
"""

import json
import os

import numpy as np
import pytest

import wav2vec2forbrain_tpu.experiments.impl as impl
from wav2vec2forbrain_tpu.data.synthetic import make_session_mat

from test_train_e2e import base_config, tiny_yaml_config
from test_train_e2e import tiny_encoders  # noqa: F401


def test_width_for_picks_smallest_covering_bucket():
    from wav2vec2forbrain_tpu.train.device_cache import DeviceDatasetCache

    n, t_max = 6, 512
    cache = DeviceDatasetCache(
        feats=np.zeros((n, t_max, 4), np.float32),
        targets=np.zeros((n, 8), np.int32),
        day_idxs=np.zeros((n,), np.int32),
        input_lens=np.asarray([100, 130, 260, 300, 400, 512], np.int32),
        target_lens=np.ones((n,), np.int32),
    )
    assert cache.width_for([0, 1]) == t_max  # bucketing off: dataset max
    cache.set_buckets([128, 256, 384])  # normalized to cover 512
    assert cache._buckets == [128, 256, 384, 512]
    assert cache.width_for([0]) == 128
    assert cache.width_for([0, 1]) == 256  # 130 > 128
    assert cache.width_for([2, 3]) == 384
    assert cache.width_for([4]) == 512  # 400 > 384
    assert cache.width_for([5]) == 512


def test_bucketed_gather_slices_features():
    import jax

    from wav2vec2forbrain_tpu.train.device_cache import DeviceDatasetCache

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(5, 96, 4)).astype(np.float32)
    cache = DeviceDatasetCache(
        feats=feats,
        targets=np.arange(10, dtype=np.int32).reshape(5, 2),
        day_idxs=np.arange(5, dtype=np.int32),
        input_lens=np.asarray([20, 30, 90, 40, 96], np.int32),
        target_lens=np.ones((5,), np.int32),
    ).upload()
    cache.set_buckets([32, 64])
    idx = np.asarray([0, 1], np.int32)
    mask = np.ones((2,), np.float32)
    b = cache.device_batch(idx, mask, cache.width_for([0, 1]))
    assert b.input.shape == (2, 32, 4)
    np.testing.assert_array_equal(np.asarray(b.input), feats[[0, 1], :32])
    # full width still available (e.g. for the widest bucket)
    b_full = cache.device_batch(idx, mask)
    assert b_full.input.shape == (2, 96, 4)


def test_t12_length_distribution(tmp_path):
    from scipy.io import loadmat

    path = str(tmp_path / "s.mat")
    make_session_mat(
        path,
        n_trials=200,
        min_frames=100,
        max_frames=700,
        length_distribution="t12",
        seed=0,
    )
    m = loadmat(path)
    lens = np.asarray([m["tx1"][0, i].shape[0] for i in range(200)])
    assert lens.min() >= 100 and lens.max() <= 700
    assert 180 < np.median(lens) < 380  # right-skewed around ~270
    assert lens.max() > 500  # the long tail exists


def _run_history(tmp_path, splits_dir, tag, **cfg_kwargs):
    yaml_cfg = tiny_yaml_config(tmp_path / tag, splits_dir)
    cfg = base_config(epochs=2, pad_to_multiple=64, **cfg_kwargs)
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    exp.run()
    with open(os.path.join(exp.results_dir, "history.json")) as f:
        return json.load(f)


def _assert_histories_match(ref, h, rel):
    for e_ref, e_h in zip(ref["epochs"], h["epochs"]):
        for split in ("train", "val"):
            assert e_ref[split]["average"]["loss"] == pytest.approx(
                e_h[split]["average"]["loss"], rel=rel
            ), split
    assert ref["test"]["average"]["loss"] == pytest.approx(
        h["test"]["average"]["loss"], rel=rel
    )


def test_exact_buckets_reproduce_streaming_numerics(
    tmp_path, synthetic_splits_dir_hetero, tiny_encoders  # noqa: F811
):
    """length_buckets='exact' on heterogeneous-length data reproduces the
    STREAMING run's losses: every batch is gathered at the collate's
    batch-max width, so even the padding-consuming biGRU (reference
    parity: unpacked torch GRU reads padded frames) sees identical inputs.
    NB: single-bucket cached mode deliberately does NOT have this property
    on multi-width data (documented max-bucket numerics)."""
    streamed = _run_history(
        tmp_path, synthetic_splits_dir_hetero, "s", device_data_cache="off"
    )
    exact = _run_history(
        tmp_path,
        synthetic_splits_dir_hetero,
        "e",
        device_data_cache="on",
        length_buckets="exact",
    )
    _assert_histories_match(streamed, exact, rel=1e-6)
    # chunking composes: chunks are formed only from consecutive SAME-width
    # batches, so exact buckets + chunks still reproduce streaming (up to
    # scan-vs-standalone fusion noise)
    exact_chunked = _run_history(
        tmp_path,
        synthetic_splits_dir_hetero,
        "ec",
        device_data_cache="on",
        length_buckets="exact",
        multi_step_chunk=2,
    )
    _assert_histories_match(streamed, exact_chunked, rel=2e-5)


def test_quantile_buckets_transport_parity(
    tmp_path, synthetic_splits_dir_hetero, tiny_encoders  # noqa: F811
):
    """At a FIXED quantile-bucket config, chunking is a pure transport
    change (chunks only ever group consecutive same-width batches, so every
    batch runs at its own bucket width either way): chunked == unchunked
    losses. Bucketed-vs-single-bucket losses legitimately differ for the
    padding-consuming biGRU — the documented quantile numeric envelope
    (device_cache.py module docstring)."""
    unchunked = _run_history(
        tmp_path,
        synthetic_splits_dir_hetero,
        "u",
        device_data_cache="on",
        length_buckets=3,
    )
    chunked = _run_history(
        tmp_path,
        synthetic_splits_dir_hetero,
        "c",
        device_data_cache="on",
        length_buckets=3,
        multi_step_chunk=2,
    )
    _assert_histories_match(unchunked, chunked, rel=2e-5)
    for e in unchunked["epochs"]:
        assert np.isfinite(e["train"]["average"]["loss"])
        assert "word_error_rate" in e["val"]["average"]["metrics"]


def test_reachable_widths():
    from wav2vec2forbrain_tpu.train.device_cache import DeviceDatasetCache

    n, t_max = 6, 512
    cache = DeviceDatasetCache(
        feats=np.zeros((n, t_max, 4), np.float32),
        targets=np.zeros((n, 8), np.int32),
        day_idxs=np.zeros((n,), np.int32),
        input_lens=np.asarray([100, 130, 260, 300, 400, 512], np.int32),
        target_lens=np.ones((n,), np.int32),
    )
    assert cache.reachable_widths() == [512]  # bucketing off
    cache.set_buckets([128, 256, 384])
    # every width some sample's length buckets to — matches width_for
    assert cache.reachable_widths() == [128, 256, 384, 512]
    cache.set_buckets([384])  # no sample needs more than 512
    assert cache.reachable_widths() == [384, 512]


def test_precompile_buckets_noop_and_no_midrun_compiles(
    tmp_path, synthetic_splits_dir_hetero, tiny_encoders  # noqa: F811
):
    """--precompile_buckets dispatches all-invalid chunks: (a) training
    numerics are bit-identical to a run without it, and (b) after the
    precompile pass, no (train or eval) chunk program compiles mid-run —
    the round-4 long-seq bench's hidden 8x epoch collapse was exactly a
    rare small-width batch compiling inside a late epoch."""
    from wav2vec2forbrain_tpu.train.train_loop import Trainer

    base = _run_history(
        tmp_path,
        synthetic_splits_dir_hetero,
        "np",
        device_data_cache="on",
        length_buckets=3,
        multi_step_chunk=2,
        precompile_buckets=False,
    )

    yaml_cfg = tiny_yaml_config(tmp_path / "pc", synthetic_splits_dir_hetero)
    cfg = base_config(
        epochs=2,
        pad_to_multiple=64,
        device_data_cache="on",
        length_buckets=3,
        multi_step_chunk=2,
        precompile_buckets=True,
    )
    exp = impl.B2TGruAndW2VExperiment(cfg, yaml_cfg)
    from wav2vec2forbrain_tpu.train.logger import make_logger

    exp.logger = make_logger(exp.results_dir, exp.raw_config, False)
    trainer = Trainer(exp)
    trainer._precompile_bucket_programs()
    ms, me = exp.get_multi_step(), exp.get_multi_eval()
    n_train, n_eval = ms._cache_size(), me._cache_size()
    assert n_train > 0 and n_eval > 0
    history = trainer.train()
    # every width was compiled up front: epochs added no new executables
    assert ms._cache_size() == n_train
    assert me._cache_size() == n_eval
    h = history.to_dict()
    _assert_histories_match(base, h, rel=1e-6)


def test_length_sorted_batches_composition():
    """--length_sorted_batches: every index appears exactly once, each batch
    is a run of consecutive length-sorted samples (so its width is its own
    covering bucket), and only the batch ORDER reshuffles per epoch."""
    from wav2vec2forbrain_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 10

    lens = [30, 5, 12, 40, 7, 22, 3, 18, 25, 9]
    dl = DataLoader(
        _DS(),
        batch_size=3,
        collate_fn=None,
        shuffle=True,
        seed=0,
        length_key=lambda i: lens[i],
    )
    e1 = list(dl.iter_index_batches())
    e2 = list(dl.iter_index_batches())
    flat = [i for b in e1 for i in b]
    assert sorted(flat) == list(range(10))
    for b in e1:
        bl = [lens[i] for i in b]
        assert bl == sorted(bl)
    # composition is deterministic across epochs; order may shuffle
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e2))
    # batches tile the length-sorted order in runs of batch_size
    order = sorted(range(10), key=lambda i: lens[i])
    expected = {tuple(order[s : s + 3]) for s in range(0, 10, 3)}
    assert set(map(tuple, e1)) == expected


def test_length_sorted_day_sampler_keeps_days_unmixed():
    from wav2vec2forbrain_tpu.data.loader import Brain2TextBatchSampler

    class _S:
        def __init__(self, day, t):
            self.day_idx = day
            self.input = np.zeros((t, 4), np.float32)

    class _DS:
        def __init__(self):
            self.samples = [
                _S(0, 30), _S(0, 5), _S(0, 12), _S(0, 40), _S(0, 7),
                _S(1, 22), _S(1, 3), _S(1, 18),
            ]

        def __len__(self):
            return len(self.samples)

    ds = _DS()
    sampler = Brain2TextBatchSampler(
        ds,
        batch_size=2,
        shuffle=False,
        length_key=lambda i: ds.samples[i].input.shape[0],
    )
    for batch in sampler:
        days = {ds.samples[i].day_idx for i in batch}
        assert len(days) == 1
        bl = [ds.samples[i].input.shape[0] for i in batch]
        assert bl == sorted(bl)
    flat = [i for b in sampler.batches for i in b]
    assert sorted(flat) == list(range(8))


@pytest.fixture
def synthetic_splits_dir_hetero(tmp_path_factory):
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    root = tmp_path_factory.mktemp("t12_hetero")
    return make_synthetic_splits_dir(
        str(root),
        n_trials=9,
        n_blocks=3,
        min_frames=80,
        max_frames=320,
        length_distribution="t12",
        seed=3,
    )
