"""Golden numerics tests: preprocessing chain, GRU, FC, CTC vs PyTorch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wav2vec2forbrain_tpu.models import convert
from wav2vec2forbrain_tpu.models.fc import apply_fc, init_fc
from wav2vec2forbrain_tpu.models.gru import apply_gru, init_gru_params
from wav2vec2forbrain_tpu.models.preprocessing import (
    day_affine_softsign,
    gaussian_kernel,
    gaussian_smooth,
    init_preproc_params,
    preproc_out_lens,
    unfold_time,
)
from wav2vec2forbrain_tpu.ops.ctc import ctc_loss

jax.config.update("jax_enable_x64", False)


def _torch_gaussian_kernel(kernel_size, sigma):
    import math

    grid = torch.arange(kernel_size, dtype=torch.float32)
    mean = (kernel_size - 1) / 2
    k = (1 / (sigma * math.sqrt(2 * math.pi))) * torch.exp(
        -(((grid - mean) / sigma) ** 2) / 2
    )
    return k / k.sum()


def test_gaussian_smooth_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 37, 8)).astype(np.float32)
    sigma = 0.8
    k = 20
    ours = gaussian_smooth(jnp.asarray(x), gaussian_kernel(k, sigma))
    kt = _torch_gaussian_kernel(k, sigma)
    w = kt.view(1, 1, k).repeat(8, 1, 1)
    xt = torch.tensor(x).permute(0, 2, 1)
    theirs = F.conv1d(xt, w, groups=8, padding="same").permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_day_affine_softsign_matches_torch():
    rng = np.random.default_rng(1)
    b, t, c = 3, 11, 256
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    day_idxs = np.array([0, 5, 23], dtype=np.int32)
    params = init_preproc_params(jax.random.PRNGKey(0), None)
    dw = rng.normal(size=(24, c, c)).astype(np.float32) * 0.1
    db = rng.normal(size=(24, 1, c)).astype(np.float32) * 0.1
    params["day_weights"] = jnp.asarray(dw)
    params["day_bias"] = jnp.asarray(db)

    ours = day_affine_softsign(jnp.asarray(x), params, jnp.asarray(day_idxs))

    xt = torch.tensor(x)
    w = torch.index_select(torch.tensor(dw), 0, torch.tensor(day_idxs, dtype=torch.long))
    bb = torch.index_select(torch.tensor(db), 0, torch.tensor(day_idxs, dtype=torch.long))
    theirs = torch.nn.Softsign()(torch.einsum("btd,bdk->btk", xt, w) + bb).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_unfold_matches_torch():
    rng = np.random.default_rng(2)
    b, t, c = 2, 50, 6
    kernel, stride = 32, 4
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    ours = unfold_time(jnp.asarray(x), kernel, stride)

    unfolder = torch.nn.Unfold((kernel, 1), dilation=1, padding=0, stride=stride)
    xt = torch.tensor(x)
    theirs = (
        unfolder(xt.permute(0, 2, 1).unsqueeze(3)).permute(0, 2, 1).numpy()
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_out_lens_formula():
    lens = jnp.array([32, 33, 36, 100, 50])
    out = preproc_out_lens(lens, 32, 4)
    # reference: ((L - 32) / 4).to(int32) — truncation
    expected = ((np.array([32, 33, 36, 100, 50]) - 32) / 4).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), expected)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_gru_matches_torch(bidirectional, num_layers):
    torch.manual_seed(0)
    b, t, in_size, h = 3, 17, 12, 8
    tg = torch.nn.GRU(
        in_size,
        h,
        num_layers,
        bias=True,
        bidirectional=bidirectional,
        batch_first=True,
    )
    x = torch.randn(b, t, in_size)
    with torch.no_grad():
        ref, _ = tg(x)

    sd = convert.state_dict_to_numpy(tg)
    params = convert.gru_from_torch(sd, "", num_layers, bidirectional)
    # strip the leading "." from keys produced with empty prefix
    ours = apply_gru(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x.numpy()),
        hidden_size=h,
        num_layers=num_layers,
        bidirectional=bidirectional,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_gru_learnable_initial_state_matches_torch():
    torch.manual_seed(1)
    b, t, in_size, h, L = 2, 9, 6, 5, 2
    tg = torch.nn.GRU(in_size, h, L, bias=True, bidirectional=True, batch_first=True)
    hidden_start = torch.randn(2 * L, h)
    x = torch.randn(b, t, in_size)
    with torch.no_grad():
        ref, _ = tg(x, hidden_start.unsqueeze(1).repeat(1, b, 1))

    sd = convert.state_dict_to_numpy(tg)
    params = convert.gru_from_torch(
        sd, "", L, True, hidden_start=hidden_start.numpy()
    )
    ours = apply_gru(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x.numpy()),
        hidden_size=h,
        num_layers=L,
        bidirectional=True,
        use_learnable_initial_state=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_fc_matches_torch():
    torch.manual_seed(2)
    layers = [torch.nn.Linear(10, 7), torch.nn.GELU(), torch.nn.Linear(7, 4)]
    seq = torch.nn.Sequential(*layers)
    x = torch.randn(5, 10)
    with torch.no_grad():
        ref = seq(x)
    sd = convert.state_dict_to_numpy(seq)
    params = convert.fc_from_torch(sd, "", 2)
    # fc_from_torch with empty prefix produces keys like ".0.weight"; rebuild
    params = {
        "layers": [
            convert.linear_from_torch(sd, "0"),
            convert.linear_from_torch(sd, "2"),
        ]
    }
    ours = apply_fc(jax.tree.map(jnp.asarray, params), jnp.asarray(x.numpy()), "gelu")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_ctc_matches_torch():
    rng = np.random.default_rng(3)
    b, t, k, u = 4, 30, 32, 10
    logits = rng.normal(size=(b, t, k)).astype(np.float32)
    targets = rng.integers(1, k, size=(b, u)).astype(np.int32)
    target_lens = np.array([10, 7, 4, 9], dtype=np.int32)
    logit_lens = np.array([30, 25, 20, 28], dtype=np.int32)
    for i in range(b):
        targets[i, target_lens[i] :] = 0

    loss_t = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)
    ref = loss_t(
        torch.log_softmax(torch.tensor(logits), -1).transpose(0, 1),
        torch.tensor(targets),
        torch.tensor(logit_lens),
        torch.tensor(target_lens),
    ).item()

    ours = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(targets),
            jnp.asarray(target_lens),
        )
    )
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_ctc_zero_infinity():
    """Sample with target longer than logits must contribute 0, not inf."""
    rng = np.random.default_rng(4)
    b, t, k = 2, 5, 32
    logits = rng.normal(size=(b, t, k)).astype(np.float32)
    targets = np.stack(
        [np.arange(1, 4, dtype=np.int32).repeat(1), np.arange(1, 4, dtype=np.int32)]
    )
    # sample 0: logit_len 1 < target_len 3 -> infeasible
    logit_lens = np.array([1, 5], dtype=np.int32)
    target_lens = np.array([3, 3], dtype=np.int32)

    ref = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)(
        torch.log_softmax(torch.tensor(logits), -1).transpose(0, 1),
        torch.tensor(targets),
        torch.tensor(logit_lens),
        torch.tensor(target_lens),
    ).item()
    ours = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(targets),
            jnp.asarray(target_lens),
        )
    )
    assert np.isfinite(ours)
    assert abs(ours - ref) < 1e-4, (ours, ref)
