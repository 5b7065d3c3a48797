#!/usr/bin/env python
"""Convert an ARPA n-gram model to a kenlm PROBING-format binary.

Usage: python tools/arpa_to_kenlm_binary.py in.arpa out.bin

Why: the native decoder (wav2vec2forbrain_tpu/decode) accepts both ARPA text
and kenlm probing binaries. Binaries mmap in O(1) instead of parsing multi-GB
ARPA text per process, and match the format real LM artifacts for this
benchmark ship in (the reference decodes through pyctcdecode + kenlm,
ref: src/train/evaluator.py:148-154). The layout written here mirrors the
reader's documentation in decode/native/kenlm_binary.h: Sanity header,
fixed-width params, counts, probing vocab hash table, unigram prob/backoff
array, one probing hash table per middle order, the longest-order table, and
the NUL-separated vocabulary strings (id order, <unk> first).

Hash functions are kenlm's: MurmurHash64A(word, seed=0) for vocab;
h = w_n; h = (h * 8978948897894561157) ^ ((1+w_i) * 17894857484156487943)
folding the n-gram newest-to-oldest for the n-gram tables. Probing tables
use bucket = hash % buckets with linear probing and empty-slot key 0,
buckets = max(entries + 1, uint64(float32(multiplier) * float32(entries))).
"""

import struct
import sys

import numpy as np

MAGIC = b"mmap lm http://kheafield.com/code format version 5\n\x00"
MULTIPLIER = 1.5

_M = 0xC6A4A7935BD1E995
_MASK = (1 << 64) - 1


def murmur_hash64a(data: bytes, seed: int = 0) -> int:
    r = 47
    h = (seed ^ ((len(data) * _M) & _MASK)) & _MASK
    n8 = len(data) // 8
    for i in range(n8):
        (k,) = struct.unpack_from("<Q", data, i * 8)
        k = (k * _M) & _MASK
        k ^= k >> r
        k = (k * _M) & _MASK
        h ^= k
        h = (h * _M) & _MASK
    tail = data[n8 * 8 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        h ^= k
        h = (h * _M) & _MASK
    h ^= h >> r
    h = (h * _M) & _MASK
    h ^= h >> r
    return h


def combine_word_hash(current: int, next_word: int) -> int:
    return (
        (current * 8978948897894561157) & _MASK
    ) ^ (((1 + next_word) * 17894857484156487943) & _MASK)


def chain_hash(ids) -> int:
    """ids oldest..newest; fold newest-to-oldest like kenlm search_hashed."""
    h = ids[-1]
    for w in reversed(ids[:-1]):
        h = combine_word_hash(h, w)
    return h


def bucket_count(entries: int, multiplier: float = MULTIPLIER) -> int:
    return max(entries + 1, int(np.float32(multiplier) * np.float32(entries)))


def _align8(x: int) -> int:
    return (x + 7) // 8 * 8


class ProbingTable:
    """numpy-backed probing hash table builder (structured rows)."""

    def __init__(self, entries: int, value_fmt: str):
        self.buckets = bucket_count(entries)
        self.entry_size = 8 + struct.calcsize("<" + value_fmt)
        self.value_fmt = value_fmt
        self.buf = bytearray(self.buckets * self.entry_size)

    def insert(self, key: int, *values):
        assert key != 0, "key 0 is the empty-slot sentinel"
        i = key % self.buckets
        while True:
            off = i * self.entry_size
            (existing,) = struct.unpack_from("<Q", self.buf, off)
            if existing == 0:
                struct.pack_into("<Q" + self.value_fmt, self.buf, off, key, *values)
                return
            if existing == key:  # duplicate n-gram: keep first, like a hash set
                return
            i += 1
            if i == self.buckets:
                i = 0


def parse_arpa(path: str):
    """-> (counts, [ [ (logp, words_tuple, backoff) ] per order ])."""
    counts = []
    grams = []
    with open(path, encoding="utf-8", errors="replace") as f:
        line = ""
        for line in f:
            if line.startswith("\\data\\"):
                break
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("\\"):
                break
            if line.startswith("ngram"):
                counts.append(int(line.split("=")[1]))
        grams = [[] for _ in counts]
        current = None
        while True:
            s = line.strip()
            if s.startswith("\\"):
                if s.startswith("\\end\\"):
                    break
                if "-" in s and s[1].isdigit():
                    current = int(s[1 : s.index("-")])
            elif s and current is not None:
                parts = s.split()
                n = current
                logp = float(parts[0])
                words = tuple(parts[1 : 1 + n])
                backoff = float(parts[1 + n]) if len(parts) > 1 + n else 0.0
                grams[n - 1].append((logp, words, backoff))
            line = f.readline()
            if not line:
                break
    return counts, grams


def write_kenlm_binary(arpa_path: str, out_path: str) -> None:
    counts, grams = parse_arpa(arpa_path)
    order = len(counts)
    unk_hashes = {murmur_hash64a(b"<unk>"), murmur_hash64a(b"<UNK>")}

    # vocab ids: ARPA 1-gram order, <unk> pinned to 0 (kenlm ProbingVocabulary)
    word_ids = {}
    words = [b"<unk>"]
    unigram_vals = {}
    for logp, (w,), backoff in grams[0]:
        wb = w.encode()
        h = murmur_hash64a(wb)
        if h in unk_hashes:
            word_ids[w] = 0
            words[0] = wb
            unigram_vals[0] = (logp, backoff)
        else:
            wid = len(words)
            word_ids[w] = wid
            words.append(wb)
            unigram_vals[wid] = (logp, backoff)
    bound = len(words)

    vocab = ProbingTable(counts[0], "I")
    for w, wid in word_ids.items():
        if wid == 0:
            continue
        vocab.insert(murmur_hash64a(w.encode()), wid)

    unigram = bytearray((counts[0] + 1) * 8)
    for wid, (logp, backoff) in unigram_vals.items():
        struct.pack_into("<ff", unigram, wid * 8, logp, backoff)

    def ids_of(ws):
        return [word_ids.get(w, 0) for w in ws]

    middles = []
    for n in range(2, order):
        t = ProbingTable(counts[n - 1], "ff")
        for logp, ws, backoff in grams[n - 1]:
            t.insert(chain_hash(ids_of(ws)), logp, backoff)
        middles.append(t)
    longest = None
    if order >= 2:
        longest = ProbingTable(counts[order - 1], "f")
        for logp, ws, _ in grams[order - 1]:
            longest.insert(chain_hash(ids_of(ws)), logp)

    with open(out_path, "wb") as f:
        # Sanity (88 bytes)
        sanity = bytearray(88)
        sanity[: len(MAGIC)] = MAGIC
        struct.pack_into("<fff", sanity, 56, 0.0, 1.0, -0.5)
        struct.pack_into("<II", sanity, 68, 1, 0xFFFFFFFF)
        struct.pack_into("<Q", sanity, 80, 1)
        f.write(sanity)
        # FixedWidthParameters (20 bytes): order, multiplier, PROBING,
        # has_vocabulary, search_version
        params = bytearray(20)
        params[0] = order
        struct.pack_into("<f", params, 4, MULTIPLIER)
        struct.pack_into("<i", params, 8, 0)
        params[12] = 1
        struct.pack_into("<I", params, 16, 0)
        f.write(params)
        for c in counts:
            f.write(struct.pack("<Q", c))
        f.write(b"\x00" * (_align8(f.tell()) - f.tell()))
        # vocab section: header {version, bound} + table
        f.write(struct.pack("<II", 0, bound))
        f.write(vocab.buf)
        # search: unigram, middles, longest (straight sum, no padding)
        f.write(unigram)
        for t in middles:
            f.write(t.buf)
        if longest is not None:
            f.write(longest.buf)
        # vocabulary strings, id order, NUL-separated
        f.write(b"\x00".join(words) + b"\x00")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    write_kenlm_binary(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]}")
