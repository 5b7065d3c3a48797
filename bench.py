"""Benchmark: conformer fine-tune training-step throughput (samples/sec/chip).

Measures the paper-headline config's hot path — the full jitted training step
of b2p2t_gru+w2v_conformer (preprocessing chain + biGRU + 24-layer
Conformer-RoPE-large + CTC + Adam update, unfreeze_strategy=brain_encoder+w2v)
— on whatever accelerator is visible (the driver runs this on one real TPU
chip; falls back to CPU with a tiny config for smoke).

vs_baseline: the A100 reference throughput is estimated from the archived
fft sweep (BASELINE.md): median run 3016 s for ~30 epochs x ~8800 train
sentences on wav2vec2-base at batch 64 => ~87 samples/s on A100 for the BASE
model incl. eval overhead. Conformer-rope-large is ~3.6x the encoder FLOPs of
base => ~24 samples/s/A100 estimated for the headline config. The
BASELINE.json target is >=3x that, i.e. ~72 samples/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

A100_CONFORMER_SAMPLES_PER_SEC_EST = 24.0


def main():
    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from wav2vec2forbrain_tpu.models.assembly import (
        ModelSpec,
        init_model_params,
        param_labels,
    )
    from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
    from wav2vec2forbrain_tpu.train.optim import make_optimizer
    from wav2vec2forbrain_tpu.train.steps import (
        StepConfig,
        build_steps,
        partition_params,
        prune_labels,
    )

    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "gpu")
    # pay the tunnel's one-time D2H setup cost before any timing
    float(jax.jit(jnp.sum)(jnp.ones((8, 8))))

    if on_accel:
        cfg = ConformerEncoderConfig.rope_large_960h()
        batch_size, t, u = 32, 384, 32
        steps, warmup = 20, 3
        spec = ModelSpec(
            latent_size=1024,
            encoder_family="conformer",
            conformer_cfg=cfg,
            compute_dtype=jnp.bfloat16,
            use_pallas=True,
        )
    else:  # CPU smoke mode
        cfg = ConformerEncoderConfig.tiny_test()
        batch_size, t, u = 4, 128, 12
        steps, warmup = 3, 1
        spec = ModelSpec(
            gru_hidden_size=32,
            gru_num_layers=1,
            latent_size=cfg.hidden_size,
            encoder_family="conformer",
            conformer_cfg=cfg,
            compute_dtype=jnp.float32,
        )

    params, state = init_model_params(jax.random.PRNGKey(0), spec)
    labels = param_labels(params, "brain_encoder+w2v")
    trainable, frozen = partition_params(params, labels)
    tlabels = prune_labels(labels, trainable)
    tx = make_optimizer(tlabels)
    opt_state = jax.jit(tx.init)(trainable)
    train_step, _ = build_steps(spec, tlabels, tx, StepConfig(None, 0.0, 0.0))

    batch = _make_batch(np.random.default_rng(0), batch_size, t, u)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(1)

    def run_step(trainable, opt_state, state, rng):
        return train_step(
            trainable, frozen, opt_state, state, batch, rng, 1e-4, 1e-5
        )

    for _ in range(warmup):
        out = run_step(trainable, opt_state, state, rng)
        trainable, opt_state, state, rng = (
            out.params,
            out.opt_state,
            out.model_state,
            out.rng,
        )
    # NB: sync via scalar D2H — through the axon tunnel block_until_ready
    # returns before execution finishes; a host fetch is the only real fence.
    float(out.loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        out = run_step(trainable, opt_state, state, rng)
        trainable, opt_state, state, rng = (
            out.params,
            out.opt_state,
            out.model_state,
            out.rng,
        )
    float(out.loss)
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * steps / dt
    print(
        json.dumps(
            {
                "metric": (
                    "conformer_finetune_train_step_samples_per_sec_per_chip"
                    if on_accel
                    else "conformer_finetune_train_step_samples_per_sec_per_chip"
                    "_CPU_SMOKE"
                ),
                "value": round(samples_per_sec, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(
                    samples_per_sec / A100_CONFORMER_SAMPLES_PER_SEC_EST, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
