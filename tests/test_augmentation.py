"""White-noise / constant-offset augmentation actually works.

The reference's augmentation is a no-op (`batch._replace(...)` discarded,
ref: src/train/train_loop.py:51,62). Here the flags must change the training
computation — and leave eval untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.models.assembly import (
    ModelSpec,
    init_model_params,
    param_labels,
)
from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig
from wav2vec2forbrain_tpu.train.optim import make_optimizer
from wav2vec2forbrain_tpu.train.steps import (
    StepConfig,
    build_steps,
    partition_params,
    prune_labels,
)


def make_setup(white_noise=0.0, offset=0.0):
    cfg = Wav2Vec2EncoderConfig.tiny_test(
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        final_dropout=0.0,
    )
    spec = ModelSpec(
        gru_hidden_size=8, gru_num_layers=1, latent_size=cfg.hidden_size,
        encoder_family="wav2vec2", w2v_cfg=cfg,
    )
    params, state = init_model_params(jax.random.PRNGKey(0), spec)
    labels = param_labels(params, "brain_encoder")
    trainable, frozen = partition_params(params, labels)
    tlabels = prune_labels(labels, trainable)
    tx = make_optimizer(tlabels)
    opt_state = tx.init(trainable)
    train_step, eval_step = build_steps(
        spec, tlabels, tx, StepConfig(None, white_noise, offset)
    )
    batch = B2tBatch(
        input=np.random.default_rng(0).standard_normal((2, 64, 256)).astype(np.float32),
        target=np.asarray([[5, 6, 7, 0], [8, 9, 0, 0]], np.int32),
        day_idxs=np.zeros((2,), np.int32),
        input_lens=np.asarray([64, 60], np.int32),
        target_lens=np.asarray([3, 2], np.int32),
        sample_mask=np.ones((2,), np.float32),
    )
    return trainable, frozen, opt_state, state, batch, train_step, eval_step


def test_white_noise_changes_train_loss():
    base = make_setup(0.0, 0.0)
    noisy = make_setup(0.5, 0.0)
    rng = jax.random.PRNGKey(7)
    out_a = base[5](*base[:5], rng, 1e-3, 0.0)
    out_b = noisy[5](*noisy[:5], rng, 1e-3, 0.0)
    assert abs(float(out_a.loss) - float(out_b.loss)) > 1e-6


def test_constant_offset_changes_train_loss():
    base = make_setup(0.0, 0.0)
    off = make_setup(0.0, 1.0)
    rng = jax.random.PRNGKey(7)
    out_a = base[5](*base[:5], rng, 1e-3, 0.0)
    out_b = off[5](*off[:5], rng, 1e-3, 0.0)
    assert abs(float(out_a.loss) - float(out_b.loss)) > 1e-6


def test_eval_unaffected_by_augmentation_flags():
    base = make_setup(0.0, 0.0)
    noisy = make_setup(0.5, 1.0)
    la = noisy[6](base[0], base[1], base[3], base[4])[0]
    lb = base[6](base[0], base[1], base[3], base[4])[0]
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
