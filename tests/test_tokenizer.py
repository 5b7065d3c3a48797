import numpy as np

from wav2vec2forbrain_tpu.data.tokenizer import W2V_CTC_VOCAB, Wav2Vec2CTCTokenizer


def test_encode_roundtrip():
    tok = Wav2Vec2CTCTokenizer()
    ids = tok.encode("HELLO WORLD")
    assert tok.decode(ids, group_tokens=False) == "HELLO WORLD"


def test_batch_padding():
    tok = Wav2Vec2CTCTokenizer()
    batch = tok(["HI", "HELLO"]).input_ids
    assert batch.shape == (2, 5)
    assert batch[0, 2] == tok.pad_token_id
    assert tok.batch_decode(batch, group_tokens=False) == ["HI", "HELLO"]


def test_ctc_group_decode():
    tok = Wav2Vec2CTCTokenizer()
    v = W2V_CTC_VOCAB
    # H H <pad> E L <pad> L L O  ->  "HELLO"
    ids = [v["H"], v["H"], 0, v["E"], v["L"], 0, v["L"], v["L"], v["O"]]
    assert tok.decode(ids, group_tokens=True) == "HELLO"


def test_word_delimiter_and_specials():
    tok = Wav2Vec2CTCTokenizer()
    v = W2V_CTC_VOCAB
    ids = [v["A"], v["|"], v["B"], v["</s>"], v["C"]]
    # specials are NOT skipped (HF skip_special_tokens=False default)
    assert tok.decode(ids, group_tokens=False) == "A B</s>C"


def test_unknown_char_maps_to_unk():
    tok = Wav2Vec2CTCTokenizer()
    ids = tok.encode("A#B")
    assert ids[1] == tok.unk_token_id


def test_matches_hf_tokenizer_if_available():
    """Golden check against HF's slow tokenizer when constructible offline."""
    import json
    import tempfile

    try:
        from transformers import Wav2Vec2CTCTokenizer as HFTok
    except Exception:
        return
    with tempfile.TemporaryDirectory() as d:
        with open(f"{d}/vocab.json", "w") as f:
            json.dump(W2V_CTC_VOCAB, f)
        hf = HFTok(
            f"{d}/vocab.json",
            unk_token="<unk>",
            pad_token="<pad>",
            bos_token="<s>",
            eos_token="</s>",
            word_delimiter_token="|",
        )
    ours = Wav2Vec2CTCTokenizer()
    texts = ["HELLO WORLD", "A B C", "IT'S FINE"]
    hf_ids = hf(texts, padding="longest").input_ids
    our_ids = ours(texts).input_ids
    assert np.array_equal(np.asarray(hf_ids), our_ids)
    seqs = [
        [5, 5, 0, 6, 4, 4, 7, 2],
        [11, 0, 11, 12, 1, 3],
    ]
    for s in seqs:
        assert hf.decode(s, group_tokens=True) == ours.decode(s, group_tokens=True)
        assert hf.decode(s, group_tokens=False) == ours.decode(
            s, group_tokens=False
        )
