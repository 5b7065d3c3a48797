"""Optimizer + LR-schedule parity vs torch.

The reference optimizes with torch.optim.Adam/SGD (L2-coupled weight decay)
and epoch-stepped schedulers (StepLR / the 2-module warmup LambdaLR). These
tests run several epochs of updates with identical grads on both sides and
compare parameters bit-close.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from wav2vec2forbrain_tpu.train.optim import (
    LRSchedules,
    make_optimizer,
    scale_updates_by_lr,
    step_lr,
    two_module_warmup_schedules,
)


def run_ours(params0, grads_seq, labels, lrs_per_step, optimizer="adam",
             weight_decay=0.0, eps=1e-8):
    tx = make_optimizer(labels, optimizer, weight_decay, eps)
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    state = tx.init(params)
    for grads, (lr_b, lr_w) in zip(grads_seq, lrs_per_step):
        g = jax.tree_util.tree_map(jnp.asarray, grads)
        updates, state = tx.update(g, state, params)
        updates = scale_updates_by_lr(updates, labels, lr_b, lr_w)
        params = optax.apply_updates(params, updates)
    return jax.tree_util.tree_map(np.asarray, params)


def test_adam_weight_decay_matches_torch():
    rng = np.random.default_rng(0)
    p0 = {"brain": {"w": rng.standard_normal((4, 3)).astype(np.float32)},
          "w2v": {"w": rng.standard_normal((2, 5)).astype(np.float32)}}
    labels = {"brain": {"w": "brain"}, "w2v": {"w": "w2v"}}
    grads_seq = [
        {"brain": {"w": rng.standard_normal((4, 3)).astype(np.float32)},
         "w2v": {"w": rng.standard_normal((2, 5)).astype(np.float32)}}
        for _ in range(5)
    ]
    lr_b, lr_w = 1e-3, 1e-4
    wd, eps = 0.01, 1e-8

    t_b = torch.nn.Parameter(torch.tensor(p0["brain"]["w"]))
    t_w = torch.nn.Parameter(torch.tensor(p0["w2v"]["w"]))
    opt = torch.optim.Adam(
        [{"params": [t_b]}, {"params": [t_w], "lr": lr_w}],
        lr=lr_b, weight_decay=wd, eps=eps,
    )
    for g in grads_seq:
        opt.zero_grad()
        t_b.grad = torch.tensor(g["brain"]["w"])
        t_w.grad = torch.tensor(g["w2v"]["w"])
        opt.step()

    ours = run_ours(p0, grads_seq, labels, [(lr_b, lr_w)] * 5,
                    weight_decay=wd, eps=eps)
    np.testing.assert_allclose(ours["brain"]["w"], t_b.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(ours["w2v"]["w"], t_w.detach().numpy(), atol=1e-6)


def test_sgd_matches_torch():
    rng = np.random.default_rng(1)
    p0 = {"w": rng.standard_normal((3, 3)).astype(np.float32)}
    labels = {"w": "brain"}
    grads_seq = [{"w": rng.standard_normal((3, 3)).astype(np.float32)}
                 for _ in range(4)]
    t = torch.nn.Parameter(torch.tensor(p0["w"]))
    opt = torch.optim.SGD([t], lr=0.1, weight_decay=0.05)
    for g in grads_seq:
        opt.zero_grad()
        t.grad = torch.tensor(g["w"])
        opt.step()
    ours = run_ours(p0, grads_seq, labels, [(0.1, 0.0)] * 4,
                    optimizer="sgd", weight_decay=0.05)
    np.testing.assert_allclose(ours["w"], t.detach().numpy(), atol=1e-6)


def test_step_lr_matches_torch():
    t = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([t], lr=0.5)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.1)
    ours = step_lr(0.5, 3, 0.1)
    for epoch in range(10):
        assert ours(epoch) == pytest.approx(opt.param_groups[0]["lr"])
        sched.step()


def test_two_module_warmup_matches_torch_lambdalr():
    """Exact port of get_2module_warmup_scheduler (ref: warmup_scheduler.py)."""
    base_lr, w2v_lr = 1e-4, 1e-5
    start, steps = 7, 3

    def module2_lr(step):
        if step < start:
            return 0.0
        return min(1.0, (step - start) / steps if steps > 0 else 1.0)

    def module1_lr(step):
        if step < start:
            return 1.0
        target = w2v_lr / base_lr
        if step >= start + steps:
            return target
        return 1.0 + (target - 1.0) * (step - start) / steps

    t1 = torch.nn.Parameter(torch.zeros(1))
    t2 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam(
        [{"params": [t1]}, {"params": [t2], "lr": w2v_lr}], lr=base_lr
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, [module1_lr, module2_lr])

    ours = two_module_warmup_schedules(base_lr, start, steps, w2v_lr, True)
    for epoch in range(14):
        assert ours.brain(epoch) == pytest.approx(opt.param_groups[0]["lr"])
        assert ours.w2v(epoch) == pytest.approx(opt.param_groups[1]["lr"])
        sched.step()

    # adjust flag off: brain lr constant
    ours_flat = two_module_warmup_schedules(base_lr, start, steps, w2v_lr, False)
    assert all(ours_flat.brain(e) == base_lr for e in range(14))


def test_adam_mu_dtype_bfloat16():
    """--adam_mu_dtype=bfloat16 stores the first moment in bf16 and tracks
    the f32 optimizer's updates to bf16 rounding tolerance."""
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.train.optim import make_optimizer

    labels = {"a": "brain", "b": "w2v"}
    params = {
        "a": jnp.linspace(-1.0, 1.0, 32).reshape(4, 8),
        "b": jnp.linspace(0.5, 2.0, 16).reshape(2, 8),
    }
    grads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, params)

    tx32 = make_optimizer(labels)
    txbf = make_optimizer(labels, mu_dtype=jnp.bfloat16)
    s32, sbf = tx32.init(params), txbf.init(params)
    assert any(
        getattr(leaf, "dtype", None) == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(sbf)
    ), "no bf16 moment found in the optimizer state"
    assert not any(
        getattr(leaf, "dtype", None) == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(s32)
    )
    for _ in range(3):
        u32, s32 = tx32.update(grads, s32, params)
        ubf, sbf = txbf.update(grads, sbf, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(u32), jax.tree_util.tree_leaves(ubf)
    ):
        assert jnp.max(jnp.abs(a - b)) < 2e-2


def test_adam_nu_dtype_bfloat16():
    """--adam_nu_dtype=bfloat16 stores the second moment in bf16 (computed
    in f32 each step) and tracks the f32 optimizer's updates to bf16
    quantization tolerance; the f32 default goes through stock
    optax.scale_by_adam (exact-parity path)."""
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.train.optim import make_optimizer

    labels = {"a": "brain", "b": "w2v"}
    params = {
        "a": jnp.linspace(-1.0, 1.0, 32).reshape(4, 8),
        "b": jnp.linspace(0.5, 2.0, 16).reshape(2, 8),
    }
    grads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, params)

    tx32 = make_optimizer(labels)
    txbf = make_optimizer(labels, nu_dtype=jnp.bfloat16)
    s32, sbf = tx32.init(params), txbf.init(params)
    n_bf16 = sum(
        getattr(leaf, "dtype", None) == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(sbf)
    )
    assert n_bf16 == 2, "expected exactly the two groups' nu trees in bf16"
    for _ in range(5):
        u32, s32 = tx32.update(grads, s32, params)
        ubf, sbf = txbf.update(grads, sbf, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(u32), jax.tree_util.tree_leaves(ubf)
    ):
        # nu quantization perturbs the denominator by <=2^-9 relative
        assert jnp.max(jnp.abs(a - b) / (jnp.abs(a) + 1e-8)) < 6e-3


def test_adam_nu_dtype_f32_is_stock_optax():
    """nu_dtype=None must produce BITWISE-identical updates to stock
    optax.scale_by_adam (the torch-parity golden path is untouched)."""
    import jax
    import jax.numpy as jnp
    import optax

    from wav2vec2forbrain_tpu.train.optim import scale_by_adam_nu_dtype

    params = {"w": jnp.linspace(-2.0, 2.0, 64)}
    grads = {"w": jnp.sin(jnp.linspace(0.0, 3.0, 64))}
    ours = scale_by_adam_nu_dtype(eps=1e-8)
    stock = optax.scale_by_adam(eps=1e-8)
    so, ss = ours.init(params), stock.init(params)
    for _ in range(3):
        uo, so = ours.update(grads, so, params)
        us, ss = stock.update(grads, ss, params)
    assert jnp.array_equal(uo["w"], us["w"])
