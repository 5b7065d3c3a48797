"""Optimizer + epoch-stepped LR schedules with torch-parity semantics.

Reproduces the reference's optimization contract:
- torch.optim.Adam (NOT AdamW): weight decay is added to the gradient before
  the moment update (ref: src/experiments/experiment.py:25-28,243-259)
- two param groups (brain lr vs w2v lr) under unfreeze_strategy
  "brain_encoder+w2v" (ref: src/experiments/b2t_gru_w2v_experiment.py:109-145)
- schedulers are stepped per EPOCH (ref: src/train/train_loop.py:158), so the
  LR is a host-computed scalar fed into the jitted step each epoch:
  * StepLR(step_size, gamma) for the default path
    (ref: src/experiments/experiment.py:356-364)
  * the 2-module warmup LambdaLR for brain_encoder+w2v
    (ref: src/util/warmup_scheduler.py:5-57)
- global-norm gradient clipping over ALL model parameters before the step
  (ref: src/train/train_loop.py:72-75)

Design: `optax.multi_transform` over labels {"brain","w2v","frozen"} does the
direction/moment work WITHOUT the lr; per-group lr scalars are applied
afterwards by `scale_updates_by_lr`. This keeps the opt_state static across
epochs while the host drives the exact per-epoch LR schedule.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LRSchedules(NamedTuple):
    """Host-side per-epoch LR functions: epoch -> absolute lr."""

    brain: Callable[[int], float]
    w2v: Callable[[int], float]


def step_lr(base_lr: float, step_size: int, gamma: float) -> Callable[[int], float]:
    """torch StepLR: lr = base * gamma ** (epoch // step_size)."""

    def lr(epoch: int) -> float:
        return base_lr * (gamma ** (epoch // step_size))

    return lr


def two_module_warmup_schedules(
    module1_baselr: float,
    module2_warmup_start_step: int,
    module2_warmup_steps: int,
    module2_target_lr: float,
    adjust_module1_lr_to_module2_postwarmup_lr: bool,
) -> LRSchedules:
    """Exact port of get_2module_warmup_scheduler's two lambdas
    (ref: src/util/warmup_scheduler.py:5-57), returned as absolute-lr fns."""

    def module2_lr(step: int) -> float:
        if step < module2_warmup_start_step:
            return 0.0
        if module2_warmup_steps > 0:
            factor = (step - module2_warmup_start_step) / module2_warmup_steps
        else:
            factor = 1.0
        return module2_target_lr * min(1.0, factor)

    def module1_lr(step: int) -> float:
        if (
            not adjust_module1_lr_to_module2_postwarmup_lr
            or module2_target_lr is None
            or module2_target_lr == 0.0
        ):
            return module1_baselr
        if step < module2_warmup_start_step:
            return module1_baselr
        target_factor = module2_target_lr / module1_baselr
        if step >= module2_warmup_start_step + module2_warmup_steps:
            return module1_baselr * target_factor
        return module1_baselr * (
            1.0
            + (target_factor - 1.0)
            * (step - module2_warmup_start_step)
            / module2_warmup_steps
        )

    return LRSchedules(brain=module1_lr, w2v=module2_lr)


def scale_by_adam_nu_dtype(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with a storage dtype for the SECOND moment too.

    The Adam update is HBM-bandwidth-bound on TPU (read p, g, mu, nu; write
    p, mu, nu — ~7.6 GB/step f32 for the headline conformer,
    tools/profile_step.py attribution); storing nu in bfloat16 cuts another
    2 x params bytes off that traffic. Moments are COMPUTED in f32 every
    step (only storage is cast), so the EMA itself doesn't stall at bf16
    resolution; the residual effect is round-to-nearest quantization noise
    on nu, i.e. <=2^-9 relative on the denominator — far below Adam's eps
    regime for trained nets, but opt-in (--adam_nu_dtype, default f32
    keeps bitwise torch-parity via stock optax.scale_by_adam).
    """
    if nu_dtype is None:
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(updates, state, params=None):
        del params
        count = state.count + jnp.array(1, jnp.int32)
        mu32 = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
            updates,
            state.mu,
        )
        nu32 = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g),
            updates,
            state.nu,
        )
        # same bias-corrected form as optax.scale_by_adam (eps_root=0)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32
        )
        mu = jax.tree_util.tree_map(
            lambda m, old: m.astype(old.dtype), mu32, state.mu
        )
        nu = jax.tree_util.tree_map(
            lambda v: v.astype(nu_dtype), nu32
        )
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _group_core(
    optimizer: str,
    weight_decay: float,
    eps: float,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """Direction/moment transformation WITHOUT the lr scale.

    torch Adam: g <- g + wd * p, then Adam moments on g.
    torch SGD (momentum 0): g <- g + wd * p.
    mu_dtype/nu_dtype: storage dtypes of Adam's moments (--adam_mu_dtype /
    --adam_nu_dtype); None keeps the param dtype (f32 = torch parity).
    """
    parts = []
    if weight_decay != 0.0:
        parts.append(optax.add_decayed_weights(weight_decay))
    if optimizer == "adam":
        parts.append(
            scale_by_adam_nu_dtype(
                eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype
            )
        )
    elif optimizer == "sgd":
        pass
    else:
        raise ValueError(f"Optimizer {optimizer} not implemented")
    return optax.chain(*parts) if parts else optax.identity()


def make_optimizer(
    labels: dict,
    optimizer: str = "adam",
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """multi_transform over the label pytree; frozen params get zero updates."""
    core = _group_core(optimizer, weight_decay, eps, mu_dtype, nu_dtype)
    return optax.multi_transform(
        {"brain": core, "w2v": core, "frozen": optax.set_to_zero()},
        labels,
    )


def scale_updates_by_lr(
    updates: dict, labels: dict, brain_lr, w2v_lr
) -> dict:
    """Apply per-group -lr to the raw (unscaled) updates inside the step."""
    lr_of = {"brain": brain_lr, "w2v": w2v_lr, "frozen": 0.0}
    return jax.tree_util.tree_map(
        lambda u, l: u * (-lr_of[l]), updates, labels
    )


def clip_by_global_norm(grads: dict, max_norm: float) -> dict:
    """torch clip_grad_norm_ over the whole tree: coef = max_norm/(norm+1e-6),
    clamped to 1.0."""
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)
