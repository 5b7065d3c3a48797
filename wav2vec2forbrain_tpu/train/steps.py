"""Jitted, mesh-sharded train/eval steps.

Everything between the host batch and the loss/logits is ONE compiled XLA
program (SURVEY.md §7.1 design stance). The step functions are built once per
experiment and closed over the static ModelSpec; LRs arrive as traced scalars
so the host can drive the reference's per-EPOCH scheduler semantics
(ref: src/train/train_loop.py:158) without recompiling.

Differences vs the reference, by design:
- the white-noise / constant-offset augmentation actually works here (the
  reference discards `batch._replace(...)` at src/train/train_loop.py:51,62,
  making the swept flags no-ops; BASELINE names them as features, so they are
  implemented properly under jax.random and documented as a divergence)
- frozen parameters (w2v subtree under unfreeze_strategy "brain_encoder",
  dead inpLayer parity weights) are partitioned OUT of the differentiated
  tree, so XLA dead-code-eliminates their weight-gradient matmuls (~1/3 of
  backward FLOPs in the frozen setup). When gradient_clipping is on, grads
  are taken over the full tree instead so the clip norm matches torch
  clip_grad_norm_ over model.parameters() (ref: train_loop.py:72-75) exactly.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from wav2vec2forbrain_tpu.models.assembly import ModelSpec, forward_with_loss
from wav2vec2forbrain_tpu.train.optim import scale_updates_by_lr

# --- pytree partition helpers (dict/list trees) -------------------------------


def partition_params(params, labels):
    """Split params into (trainable, frozen) trees with None holes."""

    def go(p, l):
        if isinstance(p, dict):
            t = {}
            f = {}
            for k in p:
                t[k], f[k] = go(p[k], l[k])
            return t, f
        if isinstance(p, (list, tuple)):
            pairs = [go(a, b) for a, b in zip(p, l)]
            return [x for x, _ in pairs], [y for _, y in pairs]
        if l == "frozen":
            return None, p
        return p, None

    return go(params, labels)


def merge_params(trainable, frozen):
    def go(t, f):
        if isinstance(t, dict) or isinstance(f, dict):
            keys = (t or f).keys()
            return {k: go(None if t is None else t[k], None if f is None else f[k]) for k in keys}
        if isinstance(t, (list, tuple)) or isinstance(f, (list, tuple)):
            n = len(t if t is not None else f)
            return [
                go(None if t is None else t[i], None if f is None else f[i])
                for i in range(n)
            ]
        return t if t is not None else f

    return go(trainable, frozen)


def prune_labels(labels, trainable):
    """labels restricted to the trainable tree's structure (drop frozen)."""

    def go(l, t):
        if isinstance(t, dict):
            return {k: go(l[k], t[k]) for k in t}
        if isinstance(t, (list, tuple)):
            return [go(a, b) for a, b in zip(l, t)]
        return l if t is not None else None

    return go(labels, trainable)


class StepConfig(NamedTuple):
    gradient_clipping: Optional[float]
    white_noise_sd: float
    constant_offset_sd: float


class TrainStepOut(NamedTuple):
    params: Any
    opt_state: Any
    model_state: Any
    loss: jnp.ndarray
    pred_ids: jnp.ndarray  # greedy argmax on device — tiny D2H transfer
    logit_lens: jnp.ndarray
    rng: jax.Array
    # per-batch scalar metrics (ctc/intermediate/combined losses when the
    # aux head is configured; {} otherwise — empty dicts add no jit outputs)
    metrics: Any = {}


def build_step_fns(
    spec: ModelSpec,
    trainable_labels,
    tx: optax.GradientTransformation,
    step_cfg: StepConfig,
    state_constraints=None,
):
    """Returns (train_step, eval_step) as RAW (unjitted) functions.

    build_steps jits these for the per-batch path; the multi-step epoch
    program (build_multi_step) embeds the train fn as a lax.scan body so one
    dispatch covers K optimizer steps — on remote-attached TPUs each
    dispatch + blocking fetch costs an RTT (~70-85 ms measured through the
    axon tunnel, tools/profile_e2e.py), which a per-batch loop pays every
    step.

    train_step(trainable, frozen, opt_state, model_state, batch, rng,
               brain_lr, w2v_lr) -> TrainStepOut
    eval_step(trainable, frozen, model_state, batch) ->
               (loss, logits, logit_lens)
    batch is the B2tBatch NamedTuple (arrays). Sharding is carried by the
    arguments themselves (device_put with NamedShardings); jit propagates it.

    state_constraints: optional (trainable_shardings, opt_state_shardings)
    pytrees of NamedShardings pinned onto the step's OUTPUT params/opt-state
    (ZeRO-1, parallel/zero.py). Without the pin, XLA's propagation would let
    the data-sharded Adam updates leak into the returned params, so step 2
    would see differently-sharded inputs than step 1 and recompile; the
    constraint makes the sharded-state layout a fixpoint of the train loop
    (params all-gather back to their replicated-over-data layout, moments
    stay scattered).
    """

    def _loss(
        params, model_state, x, day_idxs, input_lens, targets, target_lens, rng, mask
    ):
        out = forward_with_loss(
            params,
            model_state,
            spec,
            x,
            day_idxs,
            input_lens,
            targets,
            target_lens,
            rng,
            train=True,
            sample_mask=mask,
        )
        return out["loss"], out

    clip = step_cfg.gradient_clipping

    def train_step(
        trainable, frozen, opt_state, model_state, batch, rng, brain_lr, w2v_lr
    ) -> TrainStepOut:
        x = batch.input
        rng, k_noise, k_off, k_model = jax.random.split(rng, 4)
        if step_cfg.white_noise_sd > 0:
            x = x + jax.random.normal(k_noise, x.shape, x.dtype) * step_cfg.white_noise_sd
        if step_cfg.constant_offset_sd > 0:
            x = x + (
                jax.random.normal(
                    k_off, (x.shape[0], 1, x.shape[2]), x.dtype
                )
                * step_cfg.constant_offset_sd
            )

        if clip is not None:
            # full-tree grads so the clip norm includes frozen params' grads,
            # matching torch clip_grad_norm_(model.parameters()).
            def loss_full(t, f):
                return _loss(
                    merge_params(t, f), model_state, x, batch.day_idxs,
                    batch.input_lens, batch.target, batch.target_lens, k_model,
                    batch.sample_mask,
                )

            (loss, out), (g_t, g_f) = jax.value_and_grad(
                loss_full, argnums=(0, 1), has_aux=True
            )(trainable, frozen)
            g_t, _ = clip_by_global_norm_pair(g_t, g_f, clip)
        else:

            def loss_trainable(t):
                return _loss(
                    merge_params(t, frozen), model_state, x, batch.day_idxs,
                    batch.input_lens, batch.target, batch.target_lens, k_model,
                    batch.sample_mask,
                )

            (loss, out), g_t = jax.value_and_grad(loss_trainable, has_aux=True)(
                trainable
            )

        updates, new_opt_state = tx.update(g_t, opt_state, trainable)
        updates = scale_updates_by_lr(updates, trainable_labels, brain_lr, w2v_lr)
        new_trainable = optax.apply_updates(trainable, updates)
        if state_constraints is not None:
            t_sh, o_sh = state_constraints
            new_trainable = jax.lax.with_sharding_constraint(new_trainable, t_sh)
            new_opt_state = jax.lax.with_sharding_constraint(new_opt_state, o_sh)
        return TrainStepOut(
            new_trainable,
            new_opt_state,
            out["state"],
            loss,
            jnp.argmax(out["logits"], axis=-1).astype(jnp.int32),
            out["logit_lens"],
            rng,
            out["metrics"],
        )

    def eval_step(trainable, frozen, model_state, batch):
        out = forward_with_loss(
            merge_params(trainable, frozen),
            model_state,
            spec,
            batch.input,
            batch.day_idxs,
            batch.input_lens,
            batch.target,
            batch.target_lens,
            rng=None,
            train=False,
            sample_mask=batch.sample_mask,
        )
        loss = out["loss"]
        if loss is None:
            loss = jnp.float32(0.0)
        pred_ids = jnp.argmax(out["logits"], axis=-1).astype(jnp.int32)
        return loss, out["logits"], out["logit_lens"], pred_ids, out["metrics"]

    return train_step, eval_step


def build_steps(
    spec: ModelSpec,
    trainable_labels,
    tx: optax.GradientTransformation,
    step_cfg: StepConfig,
    state_constraints=None,
):
    """(train_step, eval_step), jitted — the per-batch step API."""
    train_step, eval_step = build_step_fns(
        spec, trainable_labels, tx, step_cfg, state_constraints
    )
    return (
        jax.jit(train_step, donate_argnums=(0, 2, 3)),
        jax.jit(eval_step),
    )


class MultiStepOut(NamedTuple):
    """Stacked per-step outputs of a K-step scan chunk (leading axis K)."""

    params: Any
    opt_state: Any
    model_state: Any
    rng: jax.Array
    loss: jnp.ndarray  # (K,)
    pred_ids: jnp.ndarray  # (K, B, T')
    logit_lens: jnp.ndarray  # (K, B)
    metrics: Any  # dict of (K,) scalars (or {})


def build_multi_step(
    spec: ModelSpec,
    trainable_labels,
    tx: optax.GradientTransformation,
    step_cfg: StepConfig,
    state_constraints=None,
    time_axis: int = 0,
):
    """K-step epoch chunk: lax.scan over device-cache gathers + train steps.

    multi_step(trainable, frozen, opt_state, model_state, cache_arrays,
               idx_mat (K, B) int32, mask_mat (K, B) f32, valid (K,) bool,
               rng, brain_lr, w2v_lr, t_width) -> MultiStepOut

    cache_arrays is the DeviceDatasetCache device tuple (feats, targets,
    day_idxs, input_lens, target_lens); each scan iteration assembles its
    batch ON DEVICE from the resident dataset, so the host's only per-chunk
    work is one dispatch (tiny index matrices H2D) and one stacked-output
    fetch — K optimizer steps per RTT instead of one. Numerics are identical
    to K sequential single steps (same RNG chain, same gather contract).
    Slots with valid=False are SKIPPED via lax.cond (the carry — params,
    optimizer state, RNG — passes through untouched and ~no compute runs),
    so ragged epoch tails are padded with duplicate rows + valid=False and
    still ride the one compiled (K, width) program instead of falling back
    to per-step dispatches. t_width (static) is the chunk's length-bucket
    width — features are sliced to it before the step.
    """
    from wav2vec2forbrain_tpu.data.batch import B2tBatch

    train_step, _ = build_step_fns(
        spec, trainable_labels, tx, step_cfg, state_constraints
    )
    t_axis = 1 + time_axis

    def multi_step(
        trainable,
        frozen,
        opt_state,
        model_state,
        cache_arrays,
        idx_mat,
        mask_mat,
        valid,
        rng,
        brain_lr,
        w2v_lr,
        t_width,
    ) -> MultiStepOut:
        feats, targets, day_idxs, input_lens, target_lens = cache_arrays

        def run_step(carry, idx, mask):
            t, o, s, r = carry
            batch = B2tBatch(
                input=jax.lax.slice_in_dim(
                    feats[idx], 0, t_width, axis=t_axis
                ),
                target=targets[idx],
                day_idxs=day_idxs[idx],
                input_lens=input_lens[idx],
                target_lens=target_lens[idx],
                sample_mask=mask,
            )
            out = train_step(t, frozen, o, s, batch, r, brain_lr, w2v_lr)
            return (
                (out.params, out.opt_state, out.model_state, out.rng),
                (out.loss, out.pred_ids, out.logit_lens, out.metrics),
            )

        # padded-slot outputs: zeros with the real ys structure (abstract
        # eval only — nothing is computed here)
        ys_shape = jax.eval_shape(
            lambda c: run_step(c, idx_mat[0], mask_mat[0])[1],
            (trainable, opt_state, model_state, rng),
        )
        zeros_ys = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype), ys_shape
        )

        def body(carry, xs):
            idx, mask, v = xs
            return jax.lax.cond(
                v,
                lambda c: run_step(c, idx, mask),
                lambda c: (c, zeros_ys),
                carry,
            )

        (t, o, s, r), (loss, pred_ids, logit_lens, metrics) = jax.lax.scan(
            body,
            (trainable, opt_state, model_state, rng),
            (idx_mat, mask_mat, valid),
        )
        return MultiStepOut(t, o, s, r, loss, pred_ids, logit_lens, metrics)

    return jax.jit(multi_step, donate_argnums=(0, 2, 3), static_argnums=(11,))


def build_multi_eval(
    spec: ModelSpec,
    trainable_labels,
    tx: optax.GradientTransformation,
    step_cfg: StepConfig,
    state_constraints=None,
    time_axis: int = 0,
):
    """K-batch eval chunk: scan over device-cache gathers + eval steps.

    multi_eval(trainable, frozen, model_state, cache_arrays, idx_mat,
               mask_mat, valid (K,) bool, t_width) -> (loss (K,), logit_lens
               (K, B), pred_ids (K, B, T'), metrics dict of (K,))

    Slots with valid=False (tail padding) are lax.cond-skipped — zero
    outputs, ~no compute. Logits are NOT returned (a (K, B, T', V) stack
    would defeat the tiny-fetch design); epochs that need full logits
    (LM decode, prediction dumps) use the single-step eval path.
    """
    from wav2vec2forbrain_tpu.data.batch import B2tBatch

    _, eval_step = build_step_fns(
        spec, trainable_labels, tx, step_cfg, state_constraints
    )
    t_axis = 1 + time_axis

    def multi_eval(
        trainable,
        frozen,
        model_state,
        cache_arrays,
        idx_mat,
        mask_mat,
        valid,
        t_width,
    ):
        feats, targets, day_idxs, input_lens, target_lens = cache_arrays

        def run_eval(idx, mask):
            batch = B2tBatch(
                input=jax.lax.slice_in_dim(
                    feats[idx], 0, t_width, axis=t_axis
                ),
                target=targets[idx],
                day_idxs=day_idxs[idx],
                input_lens=input_lens[idx],
                target_lens=target_lens[idx],
                sample_mask=mask,
            )
            loss, _logits, logit_lens, pred_ids, metrics = eval_step(
                trainable, frozen, model_state, batch
            )
            return loss, logit_lens, pred_ids, metrics

        ys_shape = jax.eval_shape(run_eval, idx_mat[0], mask_mat[0])
        zeros_ys = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, a.dtype), ys_shape
        )

        def body(carry, xs):
            idx, mask, v = xs
            ys = jax.lax.cond(
                v, lambda: run_eval(idx, mask), lambda: zeros_ys
            )
            return carry, ys

        _, ys = jax.lax.scan(body, (), (idx_mat, mask_mat, valid))
        return ys

    return jax.jit(multi_eval, static_argnums=(7,))


def clip_by_global_norm_pair(g_t, g_f, max_norm: float):
    """Clip both subtrees by their JOINT global norm (torch semantics)."""
    norm = jnp.sqrt(
        optax.global_norm(g_t) ** 2 + optax.global_norm(g_f) ** 2
    )
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return (
        jax.tree_util.tree_map(lambda g: g * scale, g_t),
        jax.tree_util.tree_map(lambda g: g * scale, g_f),
    )
