"""Shared LM fixture builder: a randomized-but-fixed 3-gram ARPA over a
small word list, with partial bigram/trigram coverage so Katz backoff paths
are exercised (same construction as test_decode_parity's fixture)."""

import numpy as np

WORDS = [
    "THE", "CAT", "CAR", "CART", "CARTS", "A", "AT", "HAT", "THAT",
    "SAT", "ON", "MAT", "MATTER", "MATTERS", "SO", "SOON", "NO", "NOON",
]


def build_random_arpa(path: str, seed: int = 123) -> str:
    rng = np.random.default_rng(seed)
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
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path
