"""Native CTC beam-search + ARPA n-gram decoder tests.

Properties tested (pyctcdecode/kenlm are not installed here; semantics are
validated against hand-computed expectations):
- beam search without LM recovers the greedy transcription on peaked logits
- CTC collapse rules: repeats merge, blank separates doubled letters
- the ARPA LM steers acoustically ambiguous decodes toward in-LM words
- alpha/beta knobs move scores the right way; lens truncate decoding
"""

import math
import os

import numpy as np
import pytest

from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.decode.lm_decode import (
    CTCBeamDecoder,
    log_softmax,
    make_lm_decoder,
)

TOK = Wav2Vec2CTCTokenizer()
VOCAB = TOK.get_vocab_list()
V = len(VOCAB)
IDX = {t: i for i, t in enumerate(VOCAB)}


def logits_for(tokens, peak=8.0):
    """Peaked logits emitting the given token sequence, one per frame."""
    t = len(tokens)
    x = np.zeros((t, V), np.float32)
    for i, tok in enumerate(tokens):
        x[i, IDX[tok]] = peak
    return x


def decode_one(decoder, frames, **kw):
    lp = log_softmax(frames[None])
    return decoder.decode_batch(lp, **kw)[0]


@pytest.fixture(scope="module")
def plain_decoder():
    return CTCBeamDecoder(VOCAB)


def test_greedy_parity_on_peaked_logits(plain_decoder):
    frames = logits_for(list("HELLO") + ["|"] + list("WORLD"))
    # CTC collapse of LL needs a blank between to emit both
    assert decode_one(plain_decoder, frames) == "HELO WORLD"


def test_repeat_and_blank_semantics(plain_decoder):
    frames = logits_for(["H", "E", "L", "<pad>", "L", "O"])
    assert decode_one(plain_decoder, frames) == "HELLO"
    frames = logits_for(["H", "H", "E", "E", "<pad>", "E"])
    assert decode_one(plain_decoder, frames) == "HEE"


def test_lens_truncate(plain_decoder):
    frames = logits_for(list("HI") + ["|"] + list("WORLD"))
    lp = log_softmax(frames[None])
    out = plain_decoder.decode_batch(lp, lens=np.asarray([2], np.int32))
    assert out[0] == "HI"


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    """Tiny 2-gram LM strongly preferring 'THE CAT' over 'THE CAR'."""
    p = tmp_path_factory.mktemp("lm") / "tiny.arpa"
    lines = [
        "\\data\\",
        "ngram 1=6",
        "ngram 2=4",
        "",
        "\\1-grams:",
        "-10.0\t<unk>\t0.0",
        "-0.5\t<s>\t-0.5",
        "-0.5\t</s>",
        "-0.8\tTHE\t-0.3",
        "-1.0\tCAT\t-0.3",
        "-4.0\tCAR\t-0.3",
        "",
        "\\2-grams:",
        "-0.2\t<s> THE",
        "-0.3\tTHE CAT",
        "-3.5\tTHE CAR",
        "-0.2\tCAT </s>",
        "",
        "\\end\\",
    ]
    p.write_text("\n".join(lines))
    return str(p)


def ambiguous_cat_car():
    """'THE CA?' where the last letter is acoustically split 50/50 T vs R."""
    frames = logits_for(list("THE") + ["|"] + list("CA") + ["A"], peak=8.0)
    # replace final frame: near-tie between T and R (R slightly favoured)
    frames[-1] = np.zeros(V, np.float32)
    frames[-1, IDX["R"]] = 6.0
    frames[-1, IDX["T"]] = 5.8
    return frames


def test_lm_steers_ambiguous_decode(arpa_path):
    frames = ambiguous_cat_car()
    no_lm = CTCBeamDecoder(VOCAB)
    assert decode_one(no_lm, frames) == "THE CAR"
    with_lm = CTCBeamDecoder(VOCAB, lm_path=arpa_path, alpha=0.6, beta=0.0)
    assert with_lm.lm_order == 2
    assert decode_one(with_lm, frames) == "THE CAT"
    # alpha=0 disables LM influence
    alpha0 = CTCBeamDecoder(VOCAB, lm_path=arpa_path, alpha=0.0, beta=0.0)
    assert decode_one(alpha0, frames) == "THE CAR"


def test_score_boundary_uses_sentence_context(arpa_path):
    # with boundary scoring, "CAT </s>" bigram further boosts CAT
    frames = ambiguous_cat_car()
    d = CTCBeamDecoder(
        VOCAB, lm_path=arpa_path, alpha=0.4, beta=0.0, score_boundary=True
    )
    assert decode_one(d, frames) == "THE CAT"


def test_make_lm_decoder_evaluator_hook(arpa_path):
    decode = make_lm_decoder(VOCAB, arpa_path, alpha=0.6, beta=0.0)
    frames = ambiguous_cat_car()
    logits = frames[None]
    out = decode(logits, np.asarray([frames.shape[0]], np.int32))
    assert out == ["THE CAT"]


def test_missing_lm_path_falls_back(capsys):
    decode = make_lm_decoder(VOCAB, "/nonexistent/lm.arpa")
    assert "does not exist" in capsys.readouterr().out
    frames = logits_for(list("HI"))
    assert decode(frames[None], np.asarray([2], np.int32)) == ["HI"]


def test_batch_threading(plain_decoder):
    batch = np.stack(
        [
            log_softmax(logits_for(list("HI") + ["|"] + list("CAT"))),
            log_softmax(logits_for(list("NO") + ["|"] + list("WAY"))),
        ]
    )
    out = plain_decoder.decode_batch(batch, n_threads=2)
    assert out == ["HI CAT", "NO WAY"]


def test_async_lm_decode_pool_metrics_and_order():
    """The worker-pool LM decode must produce the SAME history (per-batch
    metrics, averaged metrics, stored predictions, decode order) as a
    synchronous decode — late-resolved metrics are folded into both the
    entries and the running total before aggregation."""
    import time

    import numpy as np

    from wav2vec2forbrain_tpu.data.batch import B2tBatch
    from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
    from wav2vec2forbrain_tpu.train.evaluator import EvaluatorWithLMDecoder

    tok = Wav2Vec2CTCTokenizer.from_pretrained("facebook/wav2vec2-base-960h")
    vocab = tok.get_vocab_list()
    v = len(vocab)

    calls = []

    def slow_decoder(logits, logit_lens):
        # deliberately out-of-order completion pressure: the first batch is
        # the slowest
        time.sleep(0.2 if not calls else 0.01)
        calls.append(logits.shape[0])
        return ["HEY THERE"] * logits.shape[0]

    ev = EvaluatorWithLMDecoder(
        tok,
        "test",
        lm_decoder=slow_decoder,
        lm_decode_test_predictions=True,
        lm_decode_workers=3,
    )
    rng = np.random.default_rng(0)
    n_batches, b, t = 4, 2, 12
    sentences = ["HEY THERE", "HI YOU"]
    target = np.full((b, 12), tok.pad_token_id, np.int32)
    for i, s in enumerate(sentences):
        ids = tok.encode(s.upper())[:12]
        target[i, : len(ids)] = ids
    for i in range(n_batches):
        logits = rng.normal(size=(b, t, v)).astype(np.float32)
        preds = {
            "loss": 1.0 + i,
            "pred_ids": np.argmax(logits, -1),
            "logits": logits,
            "logit_lens": np.full((b,), t, np.int32),
        }
        batch = B2tBatch(
            input=np.zeros((b, 4, 4), np.float32),
            target=target,
            day_idxs=np.zeros((b,), np.int32),
            input_lens=np.full((b,), 4, np.int32),
            target_lens=np.full((b,), 12, np.int32),
            sample_mask=np.ones((b,), np.float32),
        )
        ev.track_batch(preds, batch)
    hist = ev.evaluate()
    ev.clean_up()
    assert len(ev.lm_decoded_batches) == n_batches
    # per-entry metrics present and exact: predictions == first label
    for entry in hist.metrics:
        assert "word_error_rate_lm_decode" in entry.metrics
        assert "char_error_rate_lm_decode" in entry.metrics
    avg = hist.get_average()
    # "HEY THERE" vs labels ["HEY THERE", "HI YOU"]: WER = mean(0, 1) = 0.5
    assert avg.metrics["word_error_rate_lm_decode"] == 0.5
    # the running loss average is unaffected by async resolution
    assert avg.loss == np.mean([1.0 + i for i in range(n_batches)])
    # stored predictions carry the lm decodes, in batch order
    for stored in hist.decoded:
        assert stored["predictions_lm_decoded"] == ["HEY THERE"] * b
