import numpy as np
import pytest

from wav2vec2forbrain_tpu.args.base_args import B2TDatasetArgsModel
from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset
from wav2vec2forbrain_tpu.data.loader import Brain2TextBatchSampler, DataLoader
from wav2vec2forbrain_tpu.data.preprocessing import (
    preprocess_seperate_zscoring,
    resample_sample,
)
from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.util.seq import calc_seq_len


def test_calc_seq_len():
    assert calc_seq_len(np.array([5, 6, 7, 0, 0])) == 3
    assert calc_seq_len(np.array([0, 0])) == 0
    assert calc_seq_len(np.array([5, 0, 7, 0])) == 3


def test_block_split_policy(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel()
    train = Brain2TextDataset(cfg, synthetic_splits_dir, "train")
    val = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    test = Brain2TextDataset(cfg, synthetic_splits_dir, "test")
    # 2 sessions x 6 trials, 2 blocks each: test = first block (3 trials/sess),
    # train = remaining (3 trials/sess), val = all trials of the test/ dir.
    assert len(test) == 6
    assert len(train) == 6
    assert len(val) == 12
    sample = train[0]
    assert sample.input.shape[1] == 256
    assert sample.input.dtype == np.float32
    assert sample.target == sample.target.upper()


def test_zscoring_stats(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel()
    val = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    # block-wise z-scored features should be ~zero-mean unit-std per block
    all_feats = np.concatenate([s.input for s in val.samples], axis=0)
    assert abs(float(all_feats.mean())) < 0.1
    assert 0.8 < float(all_feats.std()) < 1.2


def test_area_slicing(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel(preprocessing="only_tx_zscored", area="6v")
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    assert ds[0].input.shape[1] == 128


def test_resample_doubling():
    x = np.arange(10, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    y = resample_sample(x, 100, 50)
    assert y.shape == (20, 4)
    # linear interp, align_corners=False: interior midpoints average neighbours
    assert np.allclose(y[2, 0], 0.75)

    # golden check vs torch.nn.functional.interpolate (the reference op)
    import torch
    from torch.nn.functional import interpolate

    xt = torch.tensor(x)
    yt = (
        interpolate(xt.unsqueeze(0).transpose(-1, -2), scale_factor=2, mode="linear")
        .transpose(-1, -2)
        .squeeze(0)
        .numpy()
    )
    assert np.allclose(y, yt, atol=1e-6)


def test_collate(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel()
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    tok = Wav2Vec2CTCTokenizer()
    collate = ds.get_collate_fn(tok)
    batch = collate([ds[i] for i in range(4)])
    assert batch.input.shape[0] == 4
    assert batch.input.shape[2] == 256
    assert batch.input.shape[1] == int(batch.input_lens.max())
    assert batch.target.shape[0] == 4
    assert (batch.target_lens > 0).all()
    # padding region must be zeros
    for i in range(4):
        assert np.all(batch.input[i, batch.input_lens[i] :] == 0)


def test_collate_bucketing(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel()
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    tok = Wav2Vec2CTCTokenizer()
    collate = ds.get_collate_fn(tok, pad_to_multiple=64, target_pad_to_multiple=16)
    batch = collate([ds[i] for i in range(4)])
    assert batch.input.shape[1] % 64 == 0
    assert batch.target.shape[1] % 16 == 0


def test_limit_samples(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel(limit_samples=3)
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    assert len(ds) == 3


def test_day_batch_sampler(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel()
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    sampler = Brain2TextBatchSampler(ds, batch_size=4)
    for idxs in sampler:
        days = {ds.samples[i].day_idx for i in idxs}
        assert len(days) == 1


def test_loader_covers_dataset(synthetic_splits_dir):
    cfg = B2TDatasetArgsModel()
    ds = Brain2TextDataset(cfg, synthetic_splits_dir, "val")
    tok = Wav2Vec2CTCTokenizer()
    loader = DataLoader(
        ds, batch_size=5, collate_fn=ds.get_collate_fn(tok), shuffle=True, seed=1
    )
    total = sum(b.input.shape[0] for b in loader)
    assert total == len(ds)
    assert len(loader) == 3


def test_synthetic_signal_mode(tmp_path):
    """signal_strength>0 embeds a deterministic character-aligned code: same
    seed -> identical features; the signal shifts the channel means in a
    sentence-dependent way while keeping the loader schema unchanged."""
    import numpy as np
    from scipy.io import loadmat

    from wav2vec2forbrain_tpu.data.synthetic import make_session_mat

    a1, a2, b = (str(tmp_path / f"{n}.mat") for n in ("a1", "a2", "b"))
    make_session_mat(a1, n_trials=3, seed=5, signal_strength=1.0)
    make_session_mat(a2, n_trials=3, seed=5, signal_strength=1.0)
    make_session_mat(b, n_trials=3, seed=5, signal_strength=0.0)

    m1, m2, m0 = loadmat(a1), loadmat(a2), loadmat(b)
    np.testing.assert_array_equal(m1["tx1"][0, 0], m2["tx1"][0, 0])
    assert [str(s) for s in m1["sentenceText"]] == [
        str(s) for s in m0["sentenceText"]
    ]  # same text stream, different features
    assert m1["tx1"][0, 0].shape == m0["tx1"][0, 0].shape
    # the additive code moves per-channel means measurably vs pure noise
    diff = np.abs(
        m1["tx1"][0, 0].mean(axis=0) - m0["tx1"][0, 0].mean(axis=0)
    ).max()
    assert diff > 0.1
