"""Pure-Python Wav2Vec2 CTC character tokenizer.

The reference loads HF `AutoTokenizer.from_pretrained(tokenizer_checkpoint)`
(ref: src/experiments/b2t_experiment.py:37-48). All supported checkpoints
(facebook/wav2vec2-base-960h / -base-100h / -large-960h /
wav2vec2-conformer-rope-large-960h-ft) share the same 32-symbol character
vocabulary, so no Rust tokenizer is needed: this reproduces HF
Wav2Vec2CTCTokenizer's encode / batch_decode(group_tokens=...) semantics in
plain Python, including CTC collapse and word-delimiter handling.
"""

import json
import os
from itertools import groupby
from typing import Iterable, List, Optional, Sequence

import numpy as np

# Standard wav2vec2 English CTC vocab (identical across the checkpoints the
# reference supports; see PRETRAINED_LATENT_SIZES ref: src/args/base_args.py:5-11).
W2V_CTC_VOCAB = {
    "<pad>": 0,
    "<s>": 1,
    "</s>": 2,
    "<unk>": 3,
    "|": 4,
    "E": 5,
    "T": 6,
    "A": 7,
    "O": 8,
    "N": 9,
    "I": 10,
    "H": 11,
    "S": 12,
    "R": 13,
    "D": 14,
    "L": 15,
    "U": 16,
    "M": 17,
    "W": 18,
    "C": 19,
    "F": 20,
    "G": 21,
    "Y": 22,
    "P": 23,
    "B": 24,
    "V": 25,
    "K": 26,
    "'": 27,
    "X": 28,
    "J": 29,
    "Q": 30,
    "Z": 31,
}

KNOWN_CHECKPOINT_VOCABS = {
    "facebook/wav2vec2-base-960h": W2V_CTC_VOCAB,
    "facebook/wav2vec2-base-100h": W2V_CTC_VOCAB,
    "facebook/wav2vec2-large-960h": W2V_CTC_VOCAB,
    "facebook/wav2vec2-conformer-rope-large-960h-ft": W2V_CTC_VOCAB,
}


class Wav2Vec2CTCTokenizer:
    """Character-level CTC tokenizer with HF-compatible decode semantics."""

    def __init__(
        self,
        vocab: Optional[dict] = None,
        pad_token: str = "<pad>",
        unk_token: str = "<unk>",
        bos_token: str = "<s>",
        eos_token: str = "</s>",
        word_delimiter_token: str = "|",
    ):
        self.vocab = dict(vocab if vocab is not None else W2V_CTC_VOCAB)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.pad_token = pad_token
        self.unk_token = unk_token
        self.bos_token = bos_token
        self.eos_token = eos_token
        self.word_delimiter_token = word_delimiter_token
        self.pad_token_id = self.vocab[pad_token]
        self.unk_token_id = self.vocab[unk_token]
        self.eos_token_id = self.vocab[eos_token]

    # --- construction -----------------------------------------------------
    @classmethod
    def from_pretrained(cls, checkpoint: str) -> "Wav2Vec2CTCTokenizer":
        """Resolve a checkpoint name or local dir to a tokenizer.

        Known facebook wav2vec2 checkpoints resolve offline to the builtin
        vocab; a local directory containing vocab.json is also accepted.
        """
        if os.path.isdir(checkpoint):
            vocab_path = os.path.join(checkpoint, "vocab.json")
            if os.path.exists(vocab_path):
                with open(vocab_path) as f:
                    return cls(vocab=json.load(f))
        if checkpoint in KNOWN_CHECKPOINT_VOCABS:
            return cls(vocab=KNOWN_CHECKPOINT_VOCABS[checkpoint])
        # Unknown checkpoint: every supported w2v CTC checkpoint shares this
        # vocab; warn but proceed.
        print(
            f"Warning: tokenizer checkpoint {checkpoint!r} not known offline; "
            "using the standard wav2vec2 English CTC vocab."
        )
        return cls()

    # --- properties ---------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def convert_ids_to_tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.ids_to_tokens.get(int(i), self.unk_token) for i in ids]

    def get_vocab_list(self) -> List[str]:
        return [self.ids_to_tokens[i] for i in range(self.vocab_size)]

    # --- encode -------------------------------------------------------------
    def _tokenize(self, text: str) -> List[str]:
        # HF Wav2Vec2CTCTokenizer: spaces become the word delimiter token,
        # every other char is its own token.
        text = text.replace(" ", self.word_delimiter_token)
        return list(text)

    def encode(self, text: str) -> List[int]:
        return [self.vocab.get(tok, self.unk_token_id) for tok in self._tokenize(text)]

    def __call__(self, texts: Sequence[str], padding: str = "longest"):
        """Tokenize + pad a batch; returns an object with `.input_ids` (np.int32).

        Matches the reference collate call
        tokenizer([...], padding="longest", return_tensors="pt").input_ids
        (ref: src/datasets/brain2text.py:199-203), with numpy output.
        """
        encoded = [self.encode(t) for t in texts]
        max_len = max((len(e) for e in encoded), default=0)
        ids = np.full((len(encoded), max_len), self.pad_token_id, dtype=np.int32)
        for i, e in enumerate(encoded):
            ids[i, : len(e)] = e

        class _Batch:
            input_ids = ids

        return _Batch()

    # --- decode -------------------------------------------------------------
    def _convert_tokens_to_string(self, tokens: List[str], group_tokens: bool) -> str:
        if group_tokens:
            tokens = [tok for tok, _ in groupby(tokens)]
        filtered = [tok for tok in tokens if tok != self.pad_token]
        out = "".join(
            " " if tok == self.word_delimiter_token else tok for tok in filtered
        )
        return out.strip()

    def decode(self, ids: Iterable[int], group_tokens: bool = True) -> str:
        tokens = self.convert_ids_to_tokens(ids)
        return self._convert_tokens_to_string(tokens, group_tokens)

    def batch_decode(self, batch_ids, group_tokens: bool = True) -> List[str]:
        return [self.decode(ids, group_tokens=group_tokens) for ids in batch_ids]
