"""Gated validations against REAL artifacts (docs/REAL_ARTIFACT_VALIDATION.md).

The build environment has zero egress and no private T12 data, so the
pretrained-checkpoint converter, the native LM decoder vs the real
pyctcdecode/kenlm stack, and the reference WERs cannot be validated here.
Each test below skips unless its artifact is supplied (pytest options in
conftest.py / an installable pyctcdecode), so the day the artifacts are
reachable the validation is one command, not a design task:

  pytest tests/test_real_artifacts.py -q \
      --real-checkpoint=facebook/wav2vec2-conformer-rope-large-960h-ft \
      --real-arpa=data/lm/3gram.arpa --real-binary=/tmp/kenlm.bin

Ref surfaces under validation: the default conformer checkpoint
(src/experiments/b2t_gru_w2v_conformer_experiment.py:48) and the
Wav2Vec2ProcessorWithLM decode stack (src/train/evaluator.py:189-210).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer

VOCAB = Wav2Vec2CTCTokenizer().get_vocab_list()


def _require(request, opt):
    val = request.config.getoption(opt)
    if not val:
        pytest.skip(f"requires {opt} (real artifact unavailable here)")
    return val


def _ambiguous_batch(rng, n=8, tmin=12, tmax=40):
    from test_decode_parity import _ambiguous_logits

    lens = rng.integers(tmin, tmax, size=n).astype(np.int32)
    t = int(lens.max())
    batch = np.stack(
        [
            np.pad(_ambiguous_logits(rng, int(ln)), ((0, t - int(ln)), (0, 0)))
            for ln in lens
        ]
    )
    return batch, lens


def test_real_checkpoint_golden(request, tmp_path):
    """Full-size golden forward: our converted encoder vs the HF torch
    original, fp32, eval mode — the tiny-fixture comparison of
    test_golden_conformer.py minus the size patch."""
    ckpt = _require(request, "--real-checkpoint")
    import torch

    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.conformer import apply_conformer_encoder
    from wav2vec2forbrain_tpu.models.pretrained import (
        encoder_config_for_checkpoint,
        load_pretrained_encoder,
    )

    family, cfg = encoder_config_for_checkpoint(ckpt)
    assert family == "conformer", f"runbook covers the conformer default, got {family}"
    enc_params, _head, state = load_pretrained_encoder(ckpt, str(tmp_path))

    from transformers import Wav2Vec2ConformerForCTC

    torch_model = Wav2Vec2ConformerForCTC.from_pretrained(ckpt).eval()
    torch.manual_seed(0)
    x = torch.randn(2, 13, cfg.hidden_size)
    with torch.no_grad():
        ref = torch_model.wav2vec2_conformer.encoder(x, return_dict=True)[0].numpy()
    ours, _ = apply_conformer_encoder(
        enc_params, state, jnp.asarray(x.numpy()), cfg, train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_real_kenlm_binary_decode_parity(request):
    """Our probing-binary reader on a binary built by REAL kenlm
    build_binary must decode identically to the ARPA text backend."""
    arpa = _require(request, "--real-arpa")
    binary = _require(request, "--real-binary")
    from wav2vec2forbrain_tpu.decode.lm_decode import CTCBeamDecoder

    dec_arpa = CTCBeamDecoder(VOCAB, lm_path=arpa, alpha=0.6, beta=0.4)
    dec_bin = CTCBeamDecoder(VOCAB, lm_path=binary, alpha=0.6, beta=0.4)
    rng = np.random.default_rng(0)
    for _ in range(16):
        batch, lens = _ambiguous_batch(rng)
        got_a = dec_arpa.decode_batch(batch, lens, beam_width=50)
        got_b = dec_bin.decode_batch(batch, lens, beam_width=50)
        assert got_a == got_b


def test_real_pyctcdecode_parity(request):
    """Native decoder vs the REAL pyctcdecode library on a real ARPA.

    Tie-breaks between equal-score beams differ legitimately between
    implementations; the pass bar is ≤1% transcript mismatches over 256
    deliberately ambiguous samples (the in-repo oracle parity is exact)."""
    arpa = _require(request, "--real-arpa")
    pyctcdecode = pytest.importorskip("pyctcdecode")
    from wav2vec2forbrain_tpu.decode.lm_decode import CTCBeamDecoder

    alpha, beta = 0.6, 0.4
    # build_ctcdecoder understands the HF wav2vec2 vocab style directly
    # ("<pad>" blank, "|" word delimiter) — the same path the reference's
    # Wav2Vec2ProcessorWithLM takes
    ref_dec = pyctcdecode.build_ctcdecoder(
        VOCAB, kenlm_model_path=arpa, alpha=alpha, beta=beta
    )
    ours = CTCBeamDecoder(VOCAB, lm_path=arpa, alpha=alpha, beta=beta)
    rng = np.random.default_rng(1)
    mismatches, total = 0, 0
    for _ in range(32):
        batch, lens = _ambiguous_batch(rng)
        got = ours.decode_batch(batch, lens, beam_width=100)
        for i, ln in enumerate(lens):
            # pyctcdecode consumes per-sample log-probs
            want = ref_dec.decode(batch[i, : int(ln)], beam_width=100)
            total += 1
            mismatches += got[i] != want
    assert mismatches / total <= 0.01, f"{mismatches}/{total} transcripts differ"
