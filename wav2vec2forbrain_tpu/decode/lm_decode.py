"""Host-side CTC beam search + n-gram LM decode (native C++ via ctypes).

LM models may be ARPA text or kenlm probing binaries (auto-detected by
magic); see decode/native/kenlm_binary.h for the binary reader.

Replaces the reference's pyctcdecode + kenlm path
(ref: src/train/evaluator.py:148-154,189-210): device log-probs are fetched
once per test batch and decoded on CPU threads, overlapped with TPU eval.

The C++ core (native/ctc_beam_decoder.cc) is compiled on first use with g++
into a per-user cache; set WAV2VEC2FORBRAIN_TPU_SO to point at a prebuilt
library instead.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Callable, List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "ctc_beam_decoder.cc")


def _build_library() -> str:
    env_so = os.environ.get("WAV2VEC2FORBRAIN_TPU_SO")
    if env_so and os.path.exists(env_so):
        return env_so
    h = hashlib.sha256()
    native_dir = os.path.dirname(_SRC)
    for name in sorted(os.listdir(native_dir)):
        if name.endswith((".cc", ".h", ".hpp")):
            with open(os.path.join(native_dir, name), "rb") as f:
                h.update(name.encode() + b"\0" + f.read())
    digest = h.hexdigest()[:16]
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"w2b_tpu_native_{os.getuid()}"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"ctc_beam_decoder_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp"
        subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                _SRC, "-o", tmp,
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_library())
        lib.ctc_decoder_create.restype = ctypes.c_void_p
        lib.ctc_decoder_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.ctc_decoder_destroy.argtypes = [ctypes.c_void_p]
        lib.ctc_decoder_lm_order.restype = ctypes.c_int
        lib.ctc_decoder_lm_order.argtypes = [ctypes.c_void_p]
        lib.ctc_decoder_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        lib.ctc_decoder_free_strings.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        _lib = lib
    return _lib


class CTCBeamDecoder:
    """pyctcdecode-flavoured prefix beam search with an optional n-gram LM
    (ARPA text or kenlm probing binary, auto-detected)."""

    def __init__(
        self,
        vocab: List[str],
        blank_id: int = 0,
        word_delimiter_token: str = "|",
        lm_path: Optional[str] = None,
        alpha: float = 0.5,
        beta: float = 0.5,
        unk_score_offset: float = -10.0,
        score_boundary: bool = False,
    ):
        self._lib = _get_lib()
        c_vocab = (ctypes.c_char_p * len(vocab))(
            *[v.encode() for v in vocab]
        )
        err = ctypes.create_string_buffer(512)
        self._handle = self._lib.ctc_decoder_create(
            c_vocab,
            len(vocab),
            blank_id,
            word_delimiter_token.encode(),
            (lm_path or "").encode(),
            alpha,
            beta,
            unk_score_offset,
            1 if score_boundary else 0,
            err,
            len(err),
        )
        if not self._handle:
            raise RuntimeError(f"decoder init failed: {err.value.decode()}")

    @property
    def lm_order(self) -> int:
        return self._lib.ctc_decoder_lm_order(self._handle)

    def decode_batch(
        self,
        log_probs: np.ndarray,
        lens: Optional[np.ndarray] = None,
        beam_width: int = 100,
        beam_prune_logp: float = -10.0,
        token_min_logp: float = -5.0,
        n_threads: int = 0,
    ) -> List[str]:
        """log_probs: (B, T, V) float32 natural-log probabilities."""
        lp = np.ascontiguousarray(log_probs, dtype=np.float32)
        b, t, v = lp.shape
        c_lens = None
        if lens is not None:
            lens_arr = np.ascontiguousarray(lens, dtype=np.int32)
            c_lens = lens_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        out = (ctypes.c_char_p * b)()
        self._lib.ctc_decoder_decode_batch(
            self._handle,
            lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, t, v,
            c_lens,
            beam_width,
            beam_prune_logp,
            token_min_logp,
            out,
            n_threads,
        )
        results = [s.decode() if s is not None else "" for s in out]
        self._lib.ctc_decoder_free_strings(out, b)
        return results

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.ctc_decoder_destroy(self._handle)
            self._handle = None


def log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    s = logits - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def make_lm_decoder(
    vocab: List[str],
    lm_path: Optional[str],
    beam_width: int = 100,
    beam_prune_logp: float = -10.0,
    token_min_logp: float = -5.0,
    alpha: float = 0.5,
    beta: float = 0.5,
    score_boundary: bool = False,
) -> Callable:
    """Evaluator hook: (logits (B,T,V), logit_lens) -> list[str].

    Matches the 6 pyctcdecode knobs surfaced by the reference CLI
    (ref: b2t_gru_w2v_experiment.py:66-71).

    RAW logits are fed to the beam search, exactly as the reference does
    (ref: evaluator.py:191 passes model logits straight into
    Wav2Vec2ProcessorWithLM.batch_decode, and pyctcdecode treats any input
    whose rows don't sum to 1 as log-probs). The per-frame log-softmax shift
    is constant across beams so rankings match; token_min_logp compares
    against raw logit values, like the reference's effective behavior.
    Unlike the reference we DO crop each sample at logit_lens instead of
    decoding padded frames (our buckets pad further than the reference's
    per-batch max; decoding pad garbage would diverge more, not less).
    """
    if lm_path is not None and not os.path.exists(lm_path):
        print(
            f"WARNING: LM path {lm_path!r} does not exist; decoding without LM"
        )
        lm_path = None
    decoder = CTCBeamDecoder(
        vocab,
        lm_path=lm_path,
        alpha=alpha,
        beta=beta,
        score_boundary=score_boundary,
    )

    def decode(logits: np.ndarray, logit_lens: np.ndarray) -> List[str]:
        return decoder.decode_batch(
            logits,
            logit_lens,
            beam_width=beam_width,
            beam_prune_logp=beam_prune_logp,
            token_min_logp=token_min_logp,
        )

    return decode
