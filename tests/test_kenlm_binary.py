"""kenlm probing-binary LM support in the native decoder.

Real LM artifacts for this benchmark ship as kenlm binaries (the reference's
pyctcdecode stack consumes them via the kenlm C++ API,
ref: src/train/evaluator.py:148-154). The reader
(decode/native/kenlm_binary.h) and the ARPA->binary converter
(tools/arpa_to_kenlm_binary.py) are independent from-spec implementations of
the documented PROBING layout; these tests establish

  1. transcript-exact decode parity between the ARPA backend and the binary
     backend over many ambiguous batches and every decode knob (any vocab
     hash, chained n-gram hash, bucket-count, or backoff-lookup error would
     change beam scores and flip transcripts),
  2. that the LM is genuinely engaged on the binary path (alpha sweep
     changes decodes),
  3. loud, precise rejection of unsupported/corrupt binaries (trie model
     types, stripped vocabulary, truncation) instead of silent mis-scoring.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)

from arpa_to_kenlm_binary import (  # noqa: E402
    bucket_count,
    chain_hash,
    murmur_hash64a,
    write_kenlm_binary,
)
from lm_fixtures import WORDS, build_random_arpa  # noqa: E402

from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.decode.lm_decode import CTCBeamDecoder

VOCAB = Wav2Vec2CTCTokenizer().get_vocab_list()
IDX = {t: i for i, t in enumerate(VOCAB)}


@pytest.fixture(scope="module")
def lm_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("kenlm_bin")
    arpa = build_random_arpa(str(d / "lm.arpa"), seed=123)
    binary = str(d / "lm.bin")
    write_kenlm_binary(arpa, binary)
    return arpa, binary


def _ambiguous_logits(rng, T):
    chars = sorted(set("".join(WORDS)))
    x = rng.normal(0.0, 1.0, size=(T, len(VOCAB))).astype(np.float32)
    word_seq = [WORDS[rng.integers(len(WORDS))] for _ in range(3)]
    flat = list("|".join(word_seq))
    t = 0
    for ch in flat:
        if t >= T:
            break
        x[t, IDX[ch]] += rng.uniform(1.0, 4.0)
        if rng.random() < 0.4 and t + 1 < T:
            t += 1
            x[t, IDX[ch]] += rng.uniform(0.5, 3.0)
        if rng.random() < 0.5 and t + 1 < T:
            t += 1
            x[t, IDX["<pad>"]] += rng.uniform(0.5, 3.0)
        t += 1
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
def test_decode_parity_arpa_vs_binary(lm_paths, setting_idx):
    arpa, binary = lm_paths
    s = SETTINGS[setting_idx]
    d_arpa = CTCBeamDecoder(VOCAB, lm_path=arpa, **s)
    d_bin = CTCBeamDecoder(VOCAB, lm_path=binary, **s)
    assert d_bin.lm_order == d_arpa.lm_order == 3
    rng = np.random.default_rng(4000 + setting_idx)
    n = 10
    lens = rng.integers(12, 40, size=n).astype(np.int32)
    T = int(lens.max())
    batch = np.stack(
        [
            np.pad(
                _ambiguous_logits(rng, int(ln)), ((0, T - int(ln)), (0, 0))
            )
            for ln in lens
        ]
    )
    kw = dict(beam_width=24, beam_prune_logp=-12.0, token_min_logp=-3.0)
    got_a = d_arpa.decode_batch(batch, lens, **kw)
    got_b = d_bin.decode_batch(batch, lens, **kw)
    assert got_a == got_b


def test_binary_lm_is_engaged(lm_paths):
    """Guard against a silently-empty LM: sweeping alpha must change at
    least one decode (the LM path re-ranks beams)."""
    _, binary = lm_paths
    d0 = CTCBeamDecoder(VOCAB, lm_path=binary, alpha=0.0, beta=0.0)
    d1 = CTCBeamDecoder(VOCAB, lm_path=binary, alpha=1.5, beta=0.0)
    rng = np.random.default_rng(99)
    batch = np.stack([_ambiguous_logits(rng, 30) for _ in range(8)])
    lens = np.full((8,), 30, np.int32)
    kw = dict(beam_width=24, beam_prune_logp=-12.0, token_min_logp=-3.0)
    assert d0.decode_batch(batch, lens, **kw) != d1.decode_batch(
        batch, lens, **kw
    )


def test_hash_helpers_self_consistent():
    # MurmurHash64A reference behavior: deterministic, 8-byte-block + tail
    # paths both exercised; chain hash is order-sensitive.
    h1 = murmur_hash64a(b"<unk>")
    h2 = murmur_hash64a(b"<UNK>")
    assert h1 != h2 and h1 != 0
    assert murmur_hash64a(b"exactly8") != murmur_hash64a(b"exactly8x")
    assert chain_hash([1, 2, 3]) != chain_hash([3, 2, 1])
    assert bucket_count(0) == 1 and bucket_count(100) == 150


def _patched_copy(binary, tmp_path, name, offset, fmt, value):
    data = bytearray(open(binary, "rb").read())
    struct.pack_into(fmt, data, offset, value)
    p = tmp_path / name
    p.write_bytes(bytes(data))
    return str(p)


def test_reject_trie_model_type(lm_paths, tmp_path):
    _, binary = lm_paths
    # FixedWidthParameters.model_type is the i32 at offset 88 + 8
    p = _patched_copy(binary, tmp_path, "trie.bin", 96, "<i", 2)
    with pytest.raises(RuntimeError, match="TRIE.*probing|probing.*TRIE"):
        CTCBeamDecoder(VOCAB, lm_path=p)


def test_reject_stripped_vocabulary(lm_paths, tmp_path):
    _, binary = lm_paths
    # has_vocabulary bool at offset 88 + 12
    p = _patched_copy(binary, tmp_path, "novocab.bin", 100, "<B", 0)
    with pytest.raises(RuntimeError, match="vocabulary"):
        CTCBeamDecoder(VOCAB, lm_path=p)


def test_reject_wrong_format_version(lm_paths, tmp_path):
    _, binary = lm_paths
    data = bytearray(open(binary, "rb").read())
    idx = data.index(b"version 5")
    data[idx : idx + 9] = b"version 4"
    p = tmp_path / "v4.bin"
    p.write_bytes(bytes(data))
    with pytest.raises(RuntimeError, match="version 4"):
        CTCBeamDecoder(VOCAB, lm_path=str(p))


def test_reject_overflowing_counts(lm_paths, tmp_path):
    """Adversarial counts[]: a value whose buckets*entry_size wraps uint64
    must be rejected at load, not mis-mapped (kenlm_binary.h overflow-safe
    section arithmetic: rows > (map_size - off) / entry_size)."""
    _, binary = lm_paths
    # counts[] = 3 u64 at offset 108 (order-3 model); poison the bigram count
    p = _patched_copy(
        binary, tmp_path, "hugecounts.bin", 116, "<Q", (1 << 62) + 12345
    )
    with pytest.raises(RuntimeError):
        CTCBeamDecoder(VOCAB, lm_path=p)


def test_reject_truncated(lm_paths, tmp_path):
    _, binary = lm_paths
    data = open(binary, "rb").read()
    p = tmp_path / "trunc.bin"
    p.write_bytes(data[: len(data) - len(data) // 4])
    with pytest.raises(RuntimeError):
        CTCBeamDecoder(VOCAB, lm_path=str(p))


def test_converter_layout_is_self_describing(lm_paths):
    """The reader re-derives every section offset from the header alone and
    validates words hash->id round-trips; a successful load (exercised by
    the parity tests) plus exact EOF arithmetic is asserted here."""
    _, binary = lm_paths
    size = os.path.getsize(binary)
    data = open(binary, "rb").read()
    order = data[88]
    assert order == 3
    counts = struct.unpack_from("<3Q", data, 108)
    assert counts[0] == 3 + len(WORDS)
    # strings section: the file ends with the exact NUL-terminated word list
    # in vocab-id order (<unk> pinned first, then ARPA 1-gram order). Checked
    # as a byte-suffix: the section has no length prefix, so the reader must
    # recover it purely from the id ordering written here.
    arpa, _ = lm_paths
    order_1g = []
    with open(arpa) as f:
        in_1g = False
        for line in f:
            line = line.strip()
            if line == "\\1-grams:":
                in_1g = True
                continue
            if in_1g:
                if line.startswith("\\") or not line:
                    break
                order_1g.append(line.split("\t")[1])
    expected = [b"<unk>"] + [
        w.encode() for w in order_1g if w != "<unk>"
    ]
    assert len(expected) == 3 + len(WORDS)  # <unk>, <s>, </s>, vocab words
    assert data.endswith(b"\x00".join(expected) + b"\x00")
    assert size == len(data)
