"""Independent pure-Python oracle of the pyctcdecode 0.5.0 beam search.

pyctcdecode/kenlm are not installable here (zero egress), so decode parity
for the native C++ decoder (decode/native/ctc_beam_decoder.cc) is validated
against this second, structurally different implementation of the same
published algorithm: string/tuple beams, a recursive Katz-backoff ARPA
scorer, dict caches — nothing shared with the arena/ID-based C++ design.

Spec implemented (matching the reference's pinned pyctcdecode==0.5.0 via
HF Wav2Vec2ProcessorWithLM, ref: src/train/evaluator.py:189-210):
- per-frame expansion over {tokens >= token_min_logp} ∪ {argmax}
- blank/repeat extend without emitting; blank resets last_char
- word completion scores alpha*ln(10)*(log10 P(w|ctx) [+ unk_offset if OOV])
  + beta, cached per TEXT string (never recomputed once cached)
- ranking adds score_partial_token: unk_offset * [partial not a prefix of
  any LM unigram], scaled by len/6 beyond 6 chars
- prune below max + beam_prune_logp, then trim to beam_width
- EOS completes trailing partials (with </s> raw score when score_boundary)
"""

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

LN10 = math.log(10.0)
AVG_TOKEN_LEN = 6


class OracleArpaLM:
    def __init__(self, path: str):
        self.tables: List[Dict[Tuple[str, ...], Tuple[float, float]]] = []
        order = 0
        with open(path) as f:
            section = 0
            for line in f:
                line = line.strip()
                if line.startswith("\\") and "-grams:" in line:
                    section = int(line[1 : line.index("-")])
                    while len(self.tables) < section:
                        self.tables.append({})
                    order = max(order, section)
                    continue
                if line.startswith("\\") or not line or line.startswith("ngram"):
                    continue
                if section >= 1:
                    parts = line.split()
                    logp = float(parts[0])
                    words = tuple(parts[1 : 1 + section])
                    if len(words) != section:
                        continue
                    backoff = (
                        float(parts[1 + section])
                        if len(parts) > 1 + section
                        else 0.0
                    )
                    self.tables[section - 1][words] = (logp, backoff)
        self.order = order
        self.unigrams = sorted(
            w
            for (w,) in self.tables[0]
            if w not in ("<s>", "</s>", "<unk>", "<UNK>")
        )

    def _vocab_word(self, w: str) -> str:
        return w if (w,) in self.tables[0] else "<unk>"

    def is_unigram(self, w: str) -> bool:
        import bisect

        i = bisect.bisect_left(self.unigrams, w)
        return i < len(self.unigrams) and self.unigrams[i] == w

    def has_prefix(self, p: str) -> bool:
        import bisect

        i = bisect.bisect_left(self.unigrams, p)
        return i < len(self.unigrams) and self.unigrams[i].startswith(p)

    def score_word(self, ctx: Tuple[str, ...], w: str) -> float:
        """Recursive Katz backoff, log10. ctx/w as raw strings; OOV words map
        to <unk> (or the hard floor if the LM has no <unk>)."""
        w = self._vocab_word(w)
        ctx = tuple(self._vocab_word(c) for c in ctx)[-(self.order - 1) :] if self.order > 1 else ()

        def rec(context: Tuple[str, ...]) -> float:
            key = context + (w,)
            n = len(key)
            if n <= len(self.tables) and key in self.tables[n - 1]:
                return self.tables[n - 1][key][0]
            if not context:
                return -7.0  # same no-<unk> floor as the native decoder
            bo = 0.0
            cn = len(context)
            if cn <= len(self.tables) and context in self.tables[cn - 1]:
                bo = self.tables[cn - 1][context][1]
            return bo + rec(context[1:])

        return rec(ctx)


def oracle_decode(
    logits: np.ndarray,
    vocab: List[str],
    blank_id: int = 0,
    word_delim: str = "|",
    lm: Optional[OracleArpaLM] = None,
    beam_width: int = 100,
    beam_prune_logp: float = -10.0,
    token_min_logp: float = -5.0,
    alpha: float = 0.5,
    beta: float = 0.5,
    unk_offset: float = -10.0,
    score_boundary: bool = False,
) -> str:
    """Decode one (T, V) array of log-domain scores to a transcript."""
    delim_id = vocab.index(word_delim) if word_delim in vocab else -1
    special = [
        len(t) >= 2 and t[0] == "<" and t[-1] == ">" and i != blank_id
        for i, t in enumerate(vocab)
    ]

    start_ctx: Tuple[str, ...] = ("<s>",) if (lm and score_boundary) else ()
    # text -> (cumulative weighted lm score, context words)
    text_cache: Dict[str, Tuple[float, Tuple[str, ...]]] = {
        "": (0.0, start_ctx)
    }
    partial_cache: Dict[str, float] = {}

    def partial_score(partial: str) -> float:
        if not partial or lm is None:
            return 0.0
        if partial not in partial_cache:
            unk = unk_offset * (0.0 if lm.has_prefix(partial) else 1.0)
            if len(partial) > AVG_TOKEN_LEN:
                unk = unk * len(partial) / AVG_TOKEN_LEN
            partial_cache[partial] = unk
        return partial_cache[partial]

    def complete(text: str, partial: str, is_eos: bool) -> str:
        if not partial:
            return text
        new_text = (text + " " + partial) if text else partial
        if lm is not None and new_text not in text_cache:
            prev_score, ctx = text_cache[text]
            raw = lm.score_word(ctx, partial)
            if not lm.is_unigram(partial):
                raw += unk_offset
            new_ctx = (ctx + (partial,))[-max(lm.order - 1, 1) :]
            if is_eos and score_boundary:
                raw += lm.score_word(new_ctx, "</s>")
            text_cache[new_text] = (
                prev_score + alpha * LN10 * raw + beta,
                new_ctx,
            )
        return new_text

    def rank(beam) -> float:
        text, partial, _, p_ac = beam
        lm_score = text_cache.get(text, (0.0, ()))[0]
        return p_ac + lm_score + partial_score(partial)

    def merge(beams):
        agg = {}
        for text, partial, last, p_ac in beams:
            k = (text, partial, last)
            if k in agg:
                agg[k] = np.logaddexp(agg[k], p_ac)
            else:
                agg[k] = p_ac
        return [(t, p, l, s) for (t, p, l), s in agg.items()]

    def prune_and_trim(beams):
        if not beams:
            return beams
        ranked = [(rank(b), b) for b in beams]
        best = max(r for r, _ in ranked)
        kept = [(r, b) for r, b in ranked if r >= best + beam_prune_logp]
        kept.sort(key=lambda rb: -rb[0])
        return [b for _, b in kept[:beam_width]]

    beams = [("", "", None, 0.0)]
    for row in logits:
        max_idx = int(np.argmax(row))
        cand = [
            v
            for v in range(len(vocab))
            if v == max_idx or row[v] >= token_min_logp
        ]
        nxt = []
        for v in cand:
            p = float(row[v])
            for text, partial, last, p_ac in beams:
                if v == blank_id:
                    nxt.append((text, partial, None, p_ac + p))
                elif v == last:
                    nxt.append((text, partial, last, p_ac + p))
                elif special[v]:
                    nxt.append((text, partial, v, p_ac + p))
                elif v == delim_id:
                    nxt.append((complete(text, partial, False), "", v, p_ac + p))
                else:
                    nxt.append((text, partial + vocab[v], v, p_ac + p))
        beams = prune_and_trim(merge(nxt))
        if not beams:
            return ""
    final = [
        (complete(text, partial, True), "", None, p_ac)
        for text, partial, _, p_ac in beams
    ]
    final = prune_and_trim(merge(final))
    return final[0][0] if final else ""
