"""Benchmark: conformer fine-tune throughput (samples/sec/chip).

Two measurements of the paper-headline config b2p2t_gru+w2v_conformer
(preprocessing chain + biGRU + 24-layer Conformer-RoPE-large + CTC + Adam,
unfreeze_strategy=brain_encoder+w2v):

1. isolated train step — the jitted step alone on fixed shapes (peak device
   number; unrolled layers, bf16, Pallas kernels)
2. end-to-end Trainer — the real `Trainer` epoch loop on synthetic T12-shaped
   data: host dataloader + collation, bucketed ragged batches, greedy-WER
   evaluator pipeline, per-epoch val eval, scan_layers=auto. Reported value
   is the MEDIAN warm-epoch train samples/sec/chip from the standard
   StepTimer metrics (epoch 1 excluded; single-epoch readings swing ±20%
   with tunnel/host conditions). Best-model checkpointing is disabled here because the
   benchmark tunnel's D2H is not representative of local checkpoints' cost.

vs_baseline: the A100 reference throughput is estimated from the archived
fft sweep (BASELINE.md): median run 3016 s for ~30 epochs x ~8800 train
sentences on wav2vec2-base at batch 64 => ~87 samples/s on A100 for the BASE
model incl. eval overhead. Conformer-rope-large is ~3.6x the encoder FLOPs of
base => ~24 samples/s/A100 estimated for the headline config. The
BASELINE.json target is >=3x that, i.e. ~72 samples/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline value is the honest end-to-end Trainer number; the isolated
step number rides along in "extra".
"""

import json
import os
import shutil
import tempfile
import time

import numpy as np

A100_CONFORMER_SAMPLES_PER_SEC_EST = 24.0


def bench_isolated_step(on_accel, family="conformer"):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from wav2vec2forbrain_tpu.models.assembly import (
        ModelSpec,
        init_model_params,
        param_labels,
    )
    from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
    from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig
    from wav2vec2forbrain_tpu.train.optim import make_optimizer
    from wav2vec2forbrain_tpu.train.steps import (
        StepConfig,
        build_steps,
        partition_params,
        prune_labels,
    )

    if on_accel and family == "conformer":
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
    elif on_accel:  # the fft sweep's wav2vec2-base full-fine-tune shape
        cfg = Wav2Vec2EncoderConfig.base_960h()
        batch_size, t, u = 64, 384, 32
        steps, warmup = 20, 3
        spec = ModelSpec(
            latent_size=768,
            encoder_family="wav2vec2",
            w2v_cfg=cfg,
            compute_dtype=jnp.bfloat16,
            use_pallas=True,
            # measured 943 samples/s/chip on v5e; this phase is best-effort
            # (its compile trips the remote compile helper's transient 500s
            # more often than the conformer programs — retried, and a
            # failure only nulls this extra, never the headline)
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

    # best of 3 timed chunks: this is the PEAK device number by contract,
    # and single timed windows through the remote tunnel dip 10-20% with
    # transient conditions
    best = 0.0
    for _ in range(3):
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
        best = max(best, batch_size * steps / dt)
    return best


def bench_e2e_trainer(on_accel):
    """Real Trainer run on synthetic T12-schema data; returns (samples/s/chip
    of the final warm train epoch, run wall seconds)."""
    import wav2vec2forbrain_tpu.experiments.impl as impl
    from wav2vec2forbrain_tpu.args.yaml_config import YamlConfigModel
    from wav2vec2forbrain_tpu.data.dataset import sessionNames
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        if on_accel:
            gen = dict(
                # Real T12 sessions carry ~375 train sentences each, so a
                # day's batches are nearly all full (~97% batch efficiency
                # under the never-mix-days sampler). 4 x 240 train trials
                # reproduces that regime (94%); few sessions with many
                # trials, not many sessions with pathological 16-row tails.
                session_names=sessionNames[:4],
                n_trials=300,  # 5 blocks: 60 go to the test split per session
                n_blocks=5,
                test_dir_n_trials=8,
                min_frames=280,
                max_frames=380,
            )
            run_cfg = dict(
                batch_size=32,
                epochs=4,
                compute_dtype="bfloat16",
                use_pallas=True,
                # one (T, U) bucket: bounds the bench to a single train +
                # eval compile (the 280-380-frame data all pads to 384,
                # i.e. 88 encoder frames — the headline-step shape; 512
                # frames OOMs HBM at bs 32 on v5e)
                pad_to_multiple=384,
                target_pad_to_multiple=64,
                # wire the 13 MB/step feature transfer as f16: H2D
                # serializes with compute through the remote tunnel
                # (tools/profile_pipeline.py: +95 ms/step at f32)
                h2d_dtype="float16",
                # NB: remat_policy=dots_nowide is faster on the isolated
                # step (185 vs 216 ms) but SLOWER end-to-end here (55 vs
                # 77 samples/s): its extra residual memory next to the
                # resident eval executable pushes HBM into allocator
                # churn. The default 'min' wins at trainer level.
            )
        else:  # CPU smoke: tiny encoders, tiny data
            from wav2vec2forbrain_tpu.args.base_args import (
                PRETRAINED_LATENT_SIZES,
            )
            from wav2vec2forbrain_tpu.models.conformer import (
                ConformerEncoderConfig,
            )

            impl.encoder_config_for_checkpoint = lambda ckpt: (
                "conformer",
                ConformerEncoderConfig.tiny_test(),
            )
            PRETRAINED_LATENT_SIZES[
                "facebook/wav2vec2-conformer-rope-large-960h-ft"
            ] = 96
            gen = dict(
                session_names=sessionNames[:2],
                n_trials=8,
                n_blocks=2,
                test_dir_n_trials=4,
            )
            run_cfg = dict(
                batch_size=4,
                epochs=2,
                compute_dtype="float32",
                pad_to_multiple=256,
                target_pad_to_multiple=32,
            )

        splits = make_synthetic_splits_dir(
            os.path.join(tmp, "data"), seed=0, **gen
        )
        yaml_cfg = YamlConfigModel(
            cache_dir=os.path.join(tmp, "cache"),
            fig_dir=os.path.join(tmp, "figs"),
            n3gram_lm_model_path=os.path.join(tmp, "missing_3gram.arpa"),
            n5gram_lm_model_path=os.path.join(tmp, "missing_5gram.arpa"),
            dataset_splits_dir=splits,
            wandb_api_key="offline",
        )
        config = dict(
            experiment_type="b2p2t_gru+w2v_conformer",
            wav2vec_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            tokenizer_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            learning_rate=1e-3,
            unfreeze_strategy="brain_encoder+w2v",
            w2v_learning_rate=1e-4,
            w2v_warmup_start_step=0,
            w2v_warmup_steps=3,
            w2v_skip_loading_weights=True,  # random init: no HF download
            scan_layers="auto",
            return_best_model=False,  # keep tunnel D2H out of the timing
            use_wandb=False,
            seed=0,
            **run_cfg,
        )
        t0 = time.perf_counter()
        exp = impl.B2TGruAndW2VConformerExperiment(config, yaml_cfg)
        exp.run()
        wall = time.perf_counter() - t0

        with open(os.path.join(exp.results_dir, "metrics.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        tput = [
            row["train_samples_per_sec_per_chip"]
            for row in rows
            if row.get("_type") == "metrics"
            and "train_samples_per_sec_per_chip" in row
        ]
        # median over the warm epochs: single-epoch readings swing ±20% with
        # transient tunnel/host conditions on remote-attached TPUs
        warm = tput[1:] or tput
        return float(np.median(warm)), wall
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "gpu")
    # pay the tunnel's one-time D2H setup cost before any timing
    float(jax.jit(jnp.sum)(jnp.ones((8, 8))))

    def retry(fn, attempts=3, wait=20.0):
        # the remote compile service throws transient HTTP 500s; a one-shot
        # bench must not die to one
        last = None
        for i in range(attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 - deliberate catch-all
                last = e
                if i + 1 < attempts:
                    time.sleep(wait)
        raise last

    isolated = retry(lambda: bench_isolated_step(on_accel))
    try:  # optional extra: never let it kill the headline measurement
        w2v_base = (
            retry(lambda: bench_isolated_step(on_accel, "w2v_base"), 2)
            if on_accel
            else None
        )
    except Exception:
        w2v_base = None
    e2e, e2e_wall = retry(lambda: bench_e2e_trainer(on_accel))

    suffix = "" if on_accel else "_CPU_SMOKE"
    print(
        json.dumps(
            {
                "metric": "conformer_finetune_e2e_trainer_samples_per_sec_per_chip"
                + suffix,
                "value": round(e2e, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(
                    e2e / A100_CONFORMER_SAMPLES_PER_SEC_EST, 3
                ),
                "extra": {
                    "isolated_train_step_samples_per_sec_per_chip": round(
                        isolated, 2
                    ),
                    "isolated_vs_baseline": round(
                        isolated / A100_CONFORMER_SAMPLES_PER_SEC_EST, 3
                    ),
                    # second model family: fft-sweep wav2vec2-base shape,
                    # bs 64 (A100 measured ≈ 87 samples/s incl. eval)
                    "w2v_base_fft_isolated_samples_per_sec_per_chip": (
                        round(w2v_base, 2) if w2v_base else None
                    ),
                    "e2e_run_wall_s": round(e2e_wall, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
