"""Host-side text metrics (pure Python, no torcheval/edit_distance deps).

- word_error_rate: torcheval WordErrorRate semantics
  (ref usage: src/train/evaluator.py:84-89): sum of word-level Levenshtein
  edit distances over the batch / total reference words.
- char_error_rate: edit_distance.SequenceMatcher semantics
  (ref: src/train/evaluator.py:231-242): sum of char-level Levenshtein
  distances / total reference chars; nan when no reference chars.
"""

from math import nan
from typing import List, Sequence


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Classic O(len(a)*len(b)) edit distance with two rows."""
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            curr[j] = min(
                prev[j] + 1,  # deletion
                curr[j - 1] + 1,  # insertion
                prev[j - 1] + (ca != cb),  # substitution
            )
        prev = curr
    return prev[-1]


def word_error_rate(predictions: List[str], targets: List[str]) -> float:
    """total word edit distance / total target words (torcheval parity)."""
    total_dist = 0
    total_words = 0
    for pred, tgt in zip(predictions, targets):
        pw = pred.split()
        tw = tgt.split()
        total_dist += levenshtein(pw, tw)
        total_words += len(tw)
    if total_words == 0:
        return nan
    return total_dist / total_words


def char_error_rate(predictions: List[str], targets: List[str]) -> float:
    """total char edit distance / total target chars (SequenceMatcher parity)."""
    total_dist = 0
    total_chars = 0
    for pred, tgt in zip(predictions, targets):
        total_dist += levenshtein(tgt, pred)
        total_chars += len(tgt)
    if total_chars == 0:
        return nan
    return total_dist / total_chars
