"""Sequence-length helpers (host side)."""

import numpy as np


def calc_seq_len(index_seq) -> int:
    """Length of a token sequence = index of last id > 0, plus one.

    Token id 0 (the pad/blank token) counts as padding, exactly as the
    reference's trailing-scan (ref: src/util/nn_helper.py:52-57).
    """
    arr = np.asarray(index_seq)
    nz = np.nonzero(arr > 0)[0]
    return int(nz[-1]) + 1 if nz.size else 0


def round_up(n: int, multiple: int) -> int:
    if multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple
