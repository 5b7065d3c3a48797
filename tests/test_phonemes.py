"""Phoneme subsystem tests: helper conversion, dataset, B2P evaluator."""

import numpy as np

from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.train.evaluator import B2PEvaluator
from wav2vec2forbrain_tpu.util.phoneme_helper import (
    PHONE_DEF,
    PHONE_DEF_SIL,
    FallbackG2p,
    decode_predicted_phoneme_ids,
    get_phoneme_seq,
    make_g2p,
)


def test_phone_inventory():
    assert len(PHONE_DEF) == 39
    assert PHONE_DEF_SIL[-1] == "SIL"
    assert len(set(PHONE_DEF_SIL)) == 40


def test_get_phoneme_seq_sil_insertion():
    g2p = FallbackG2p()
    ids, phones = get_phoneme_seq(g2p, "HI THERE")
    # SIL at the word boundary and at the end, ids shifted +1
    assert phones[-1] == "SIL"
    assert "SIL" in phones[:-1]
    assert all(1 <= i <= 40 for i in ids)
    assert [PHONE_DEF_SIL[i - 1] for i in ids] == phones


def test_get_phoneme_seq_empty():
    ids, phones = get_phoneme_seq(FallbackG2p(), "")
    assert phones == ["SIL"]
    assert ids == [40]


def test_decode_round_trip():
    g2p = make_g2p()
    ids, phones = get_phoneme_seq(g2p, "CAT")
    assert decode_predicted_phoneme_ids(ids) == " ".join(phones)
    # blanks (0) are dropped
    assert decode_predicted_phoneme_ids([0, ids[0], 0]) == phones[0]


def test_phoneme_dataset(synthetic_splits_dir):
    from wav2vec2forbrain_tpu.args.base_args import B2TDatasetArgsModel
    from wav2vec2forbrain_tpu.data.phoneme_dataset import (
        Brain2TextWPhonemesDataset,
    )

    ds = Brain2TextWPhonemesDataset(
        B2TDatasetArgsModel(), synthetic_splits_dir, split="train"
    )
    assert len(ds) > 0
    s = ds[0]
    assert s.phonemes[-1] == "SIL"
    assert len(s.target) == len(s.phonemes)
    assert s.transcription
    collate = ds.get_phoneme_collate_fn()
    batch = collate([ds[0], ds[1]])
    assert batch.target.shape[0] == 2
    assert batch.target_lens[0] == len(ds[0].target)
    assert batch.input.shape[-1] == 256


def test_b2p_evaluator_per():
    ev = B2PEvaluator("test")
    # target: phones ids [5, 7, 9]; prediction collapses to [5, 9] -> 1 edit
    batch = B2tBatch(
        input=np.zeros((1, 4, 256), np.float32),
        target=np.asarray([[5, 7, 9, 0]], np.int32),
        day_idxs=np.zeros((1,), np.int32),
        input_lens=np.asarray([4], np.int32),
        target_lens=np.asarray([3], np.int32),
        sample_mask=np.ones((1,), np.float32),
    )
    preds = {
        "loss": 1.0,
        "pred_ids": np.asarray([[5, 5, 0, 9]], np.int32),
    }
    ev.track_batch(preds, batch)
    hist = ev.evaluate()
    assert abs(hist.get_average().metrics["phoneme_error_rate"] - 1 / 3) < 1e-9
    assert hist.decoded[0].predictions[0].split() == [
        PHONE_DEF_SIL[4], PHONE_DEF_SIL[8]
    ]
