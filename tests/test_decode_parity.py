"""Native C++ decoder vs the independent Python pyctcdecode oracle.

pyctcdecode/kenlm cannot be installed here, so parity is established against
tests/pyctc_oracle.py — a second from-spec implementation sharing no code or
data structures with the C++ (strings/dicts/recursion vs arena IDs/iterative
backoff). Transcript equality across many random, deliberately ambiguous
logit batches and across every decode knob (alpha/beta/unk/boundary/widths)
is strong evidence both implement pyctcdecode 0.5.0's algorithm
(ref semantics: src/train/evaluator.py:189-210 via
Wav2Vec2ProcessorWithLM.batch_decode).
"""

import numpy as np
import pytest

from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.decode.lm_decode import CTCBeamDecoder

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from pyctc_oracle import OracleArpaLM, oracle_decode  # noqa: E402

TOK = Wav2Vec2CTCTokenizer()
VOCAB = TOK.get_vocab_list()
V = len(VOCAB)
IDX = {t: i for i, t in enumerate(VOCAB)}

WORDS = [
    "THE", "CAT", "CAR", "CART", "CARTS", "A", "AT", "HAT", "THAT",
    "SAT", "ON", "MAT", "MATTER", "MATTERS", "SO", "SOON", "NO", "NOON",
]


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    """A 3-gram LM over WORDS with randomized-but-fixed scores and partial
    coverage (some bigrams/trigrams present, some missing → backoff paths)."""
    rng = np.random.default_rng(123)
    uni = ["<unk>", "<s>", "</s>"] + WORDS
    lines = ["\\data\\", f"ngram 1={len(uni)}", "ngram 2=30", "ngram 3=12", ""]
    lines.append("\\1-grams:")
    for w in uni:
        lp = -0.5 - 3.0 * rng.random()
        bo = -0.1 - 0.8 * rng.random()
        if w == "</s>":
            lines.append(f"{lp:.4f}\t{w}")
        else:
            lines.append(f"{lp:.4f}\t{w}\t{bo:.4f}")
    lines.append("")
    lines.append("\\2-grams:")
    pool = ["<s>"] + WORDS
    seen = set()
    while len(seen) < 30:
        a = pool[rng.integers(len(pool))]
        b = (WORDS + ["</s>"])[rng.integers(len(WORDS) + 1)]
        if (a, b) in seen:
            continue
        seen.add((a, b))
        lp = -0.2 - 2.5 * rng.random()
        bo = -0.1 - 0.5 * rng.random()
        if b == "</s>":
            lines.append(f"{lp:.4f}\t{a} {b}")
        else:
            lines.append(f"{lp:.4f}\t{a} {b}\t{bo:.4f}")
    lines.append("")
    lines.append("\\3-grams:")
    seen2 = set()
    bigrams = list(seen)
    while len(seen2) < 12:
        a, b = bigrams[rng.integers(len(bigrams))]
        if b == "</s>":
            continue
        c = (WORDS + ["</s>"])[rng.integers(len(WORDS) + 1)]
        if (a, b, c) in seen2:
            continue
        seen2.add((a, b, c))
        lp = -0.1 - 2.0 * rng.random()
        lines.append(f"{lp:.4f}\t{a} {b} {c}")
    lines += ["", "\\end\\", ""]
    p = tmp_path_factory.mktemp("parity_lm") / "parity.arpa"
    p.write_text("\n".join(lines))
    return str(p)


def _ambiguous_logits(rng, T):
    """Log-domain scores biased toward word chars, delimiters, and blanks so
    beams genuinely compete (pure noise decodes to short garbage)."""
    chars = sorted(set("".join(WORDS)))
    x = rng.normal(0.0, 1.0, size=(T, V)).astype(np.float32)
    # bias a random "intended" spelling path
    word_seq = [WORDS[rng.integers(len(WORDS))] for _ in range(3)]
    flat = list("|".join(word_seq))
    t = 0
    for ch in flat:
        if t >= T:
            break
        x[t, IDX[ch]] += rng.uniform(1.0, 4.0)
        if rng.random() < 0.4 and t + 1 < T:  # stretch emission
            t += 1
            x[t, IDX[ch]] += rng.uniform(0.5, 3.0)
        if rng.random() < 0.5 and t + 1 < T:  # blank gap
            t += 1
            x[t, IDX["<pad>"]] += rng.uniform(0.5, 3.0)
        t += 1
    # add plausible confusions on random frames
    for _ in range(T // 2):
        ti = rng.integers(T)
        x[ti, IDX[chars[rng.integers(len(chars))]]] += rng.uniform(0.5, 3.0)
    return x


SETTINGS = [
    dict(alpha=0.5, beta=0.5, score_boundary=False),
    dict(alpha=0.5, beta=1.5, score_boundary=True),
    dict(alpha=1.2, beta=0.0, score_boundary=True),
    dict(alpha=0.0, beta=0.5, score_boundary=False),
]


@pytest.mark.parametrize("setting_idx", range(len(SETTINGS)))
def test_lm_decode_parity_on_ambiguous_batches(arpa_path, setting_idx):
    s = SETTINGS[setting_idx]
    rng = np.random.default_rng(1000 + setting_idx)
    dec = CTCBeamDecoder(
        VOCAB,
        lm_path=arpa_path,
        alpha=s["alpha"],
        beta=s["beta"],
        score_boundary=s["score_boundary"],
    )
    lm = OracleArpaLM(arpa_path)
    n = 8
    lens = rng.integers(12, 40, size=n).astype(np.int32)
    T = int(lens.max())
    batch = np.stack(
        [
            np.pad(
                _ambiguous_logits(rng, int(ln)),
                ((0, T - int(ln)), (0, 0)),
            )
            for ln in lens
        ]
    )
    got = dec.decode_batch(
        batch, lens, beam_width=24, beam_prune_logp=-12.0, token_min_logp=-3.0
    )
    for i in range(n):
        want = oracle_decode(
            batch[i, : lens[i]],
            VOCAB,
            lm=lm,
            beam_width=24,
            beam_prune_logp=-12.0,
            token_min_logp=-3.0,
            alpha=s["alpha"],
            beta=s["beta"],
            score_boundary=s["score_boundary"],
        )
        assert got[i] == want, f"sample {i} setting {s}"


def test_no_lm_parity(arpa_path):
    rng = np.random.default_rng(7)
    dec = CTCBeamDecoder(VOCAB)
    for i in range(6):
        x = _ambiguous_logits(rng, 25)
        got = dec.decode_batch(
            x[None],
            np.asarray([25], np.int32),
            beam_width=16,
            beam_prune_logp=-10.0,
            token_min_logp=-4.0,
        )[0]
        want = oracle_decode(
            x,
            VOCAB,
            lm=None,
            beam_width=16,
            beam_prune_logp=-10.0,
            token_min_logp=-4.0,
        )
        assert got == want, f"sample {i}"


def test_partial_word_scoring_changes_survivor(arpa_path):
    """A beam whose in-progress word cannot complete to any LM unigram must
    be penalized DURING the search (not only at completion) — the scenario
    the round-1 decoder got wrong. 'MATT' is a prefix of MATTER(S); 'MATX'
    is not. With the unk offset active the X beam must lose even though its
    acoustics are slightly better; with unk offset 0 the acoustics win.
    Native and oracle must agree in both regimes."""
    frames = np.full((6, V), -8.0, np.float32)
    for t, ch in enumerate("MAT"):
        frames[t, IDX[ch]] = 0.0
    frames[3, IDX["<pad>"]] = 0.0  # blank so a second T can emit
    # frame 4: X slightly better than T acoustically
    frames[4, IDX["X"]] = 0.0
    frames[4, IDX["T"]] = -0.4
    frames[5, IDX["E"]] = 0.0  # keep the word in progress at pruning time

    lm = OracleArpaLM(arpa_path)
    for unk_offset, winner_prefix in [(-10.0, "MATT"), (0.0, "MATX")]:
        dec = CTCBeamDecoder(
            VOCAB,
            lm_path=arpa_path,
            alpha=0.3,
            beta=0.0,
            unk_score_offset=unk_offset,
        )
        got = dec.decode_batch(
            frames[None],
            np.asarray([6], np.int32),
            beam_width=1,  # survival decided mid-search, not at the end
            beam_prune_logp=-30.0,
            token_min_logp=-6.0,
        )[0]
        want = oracle_decode(
            frames,
            VOCAB,
            lm=lm,
            beam_width=1,
            beam_prune_logp=-30.0,
            token_min_logp=-6.0,
            alpha=0.3,
            beta=0.0,
            unk_offset=unk_offset,
        )
        assert got == want
        assert got.startswith(winner_prefix), (unk_offset, got)


def test_oracle_backoff_matches_native_scores(arpa_path):
    """Word-level LM scores agree between the two ARPA scorers across
    contexts that exercise direct hits, backoff chains, and OOV."""
    lm = OracleArpaLM(arpa_path)
    dec = CTCBeamDecoder(
        VOCAB, lm_path=arpa_path, alpha=1.0, beta=0.0, score_boundary=True
    )
    rng = np.random.default_rng(5)
    # score full sentences through the decoder by constructing peaked logits
    for _ in range(5):
        words = [WORDS[rng.integers(len(WORDS))] for _ in range(4)]
        flat = []
        for ch in "|".join(words):
            if flat and flat[-1] == ch:
                flat.append("<pad>")  # blank so doubled letters emit
            flat.append(ch)
        x = np.full((len(flat), V), -12.0, np.float32)
        for t, ch in enumerate(flat):
            x[t, IDX[ch]] = 0.0
        got = dec.decode_batch(
            x[None],
            np.asarray([len(flat)], np.int32),
            beam_width=4,
            beam_prune_logp=-50.0,
            token_min_logp=-6.0,
        )[0]
        want = oracle_decode(
            x,
            VOCAB,
            lm=lm,
            beam_width=4,
            beam_prune_logp=-50.0,
            token_min_logp=-6.0,
            alpha=1.0,
            beta=0.0,
            score_boundary=True,
        )
        assert got == want == " ".join(words)
