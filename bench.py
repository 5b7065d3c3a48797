"""Benchmark: conformer fine-tune throughput (samples/sec/chip).

Two measurements of the paper-headline config b2p2t_gru+w2v_conformer
(preprocessing chain + biGRU + 24-layer Conformer-RoPE-large + CTC + Adam,
unfreeze_strategy=brain_encoder+w2v):

1. isolated train step — the experiment's OWN jitted train step (unrolled
   layers, bf16, Pallas kernels) timed on a fixed device-resident batch.
   Because it is built through the same experiment machinery as phase 2
   (same shapes, shardings, donation), compiling it also warms the
   persistent compile cache with the exact program the Trainer will run —
   so phase 2's scan_layers=auto detects the hit and picks the unrolled
   encoder even for a short run (experiments/impl.py::_probe_unrolled_cached).
2. end-to-end Trainer — the real `Trainer` epoch loop on synthetic
   T12-shaped data: day-bucketed batches, greedy-WER evaluator pipeline,
   per-epoch val eval, device-resident dataset cache (auto), scan auto.
   Reported value is the MEDIAN warm-epoch train samples/sec/chip (epoch 1
   excluded: it contains the compiles); per-epoch readings + best epoch +
   inter-epoch spread ride along in "extra" so a bad-weather tunnel run is
   visibly bad weather.

A third best-effort phase repeats both for the fft-sweep wav2vec2-base
shape (bs 64 — the config BASELINE.md's A100 ≈87 samples/s estimate comes
from); its failures never kill the headline.

vs_baseline: the A100 reference throughput is estimated from the archived
fft sweep (BASELINE.md): median run 3016 s for ~30 epochs x ~8800 train
sentences on wav2vec2-base at batch 64 => ~87 samples/s on A100 for the
BASE model incl. eval overhead. Conformer-rope-large is ~3.6x the encoder
FLOPs of base => ~24 samples/s/A100 estimated for the headline config. The
BASELINE.json target is >=3x that, i.e. ~72 samples/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import shutil
import tempfile
import time

import numpy as np

A100_CONFORMER_SAMPLES_PER_SEC_EST = 24.0
A100_W2V_BASE_SAMPLES_PER_SEC_MEASURED = 87.0


def _bench_configs(on_accel, family):
    """(generator kwargs, run config overrides, batch/steps) per family."""
    from wav2vec2forbrain_tpu.data.dataset import sessionNames

    if on_accel and family == "conformer":
        gen = dict(
            # Real T12 sessions carry ~375 train sentences each, so a day's
            # batches are nearly all full (~97% batch efficiency under the
            # never-mix-days sampler). 4 x 240 train trials reproduces that
            # regime (94%).
            session_names=sessionNames[:4],
            n_trials=300,  # 5 blocks: 60 go to the test split per session
            n_blocks=5,
            test_dir_n_trials=8,
            min_frames=280,
            max_frames=380,
        )
        run_cfg = dict(
            experiment_type="b2p2t_gru+w2v_conformer",
            wav2vec_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            tokenizer_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            unfreeze_strategy="brain_encoder+w2v",
            w2v_learning_rate=1e-4,
            w2v_warmup_start_step=0,
            w2v_warmup_steps=3,
            batch_size=32,
            epochs=4,
            compute_dtype="bfloat16",
            activation_dtype="bfloat16",
            use_pallas=True,
            # one (T, U) bucket: the 280-380-frame data all pads to 384,
            # i.e. 88 encoder frames — the headline-step shape (512 frames
            # OOMs HBM at bs 32 on v5e)
            pad_to_multiple=384,
            target_pad_to_multiple=64,
            # features live in HBM at f16 (device_data_cache): the wire
            # dtype is also the cache storage dtype
            h2d_dtype="float16",
            # bf16 moments: mu -2 ms/step (112.0 vs 113.9), nu -4.9 ms/step
            # (136.3 vs 141.2, tools/profile_step.py --mu/--nu-dtype A/B);
            # documented TPU-native options, f32 stays the parity default
            adam_mu_dtype="bfloat16",
            adam_nu_dtype="bfloat16",
        )
        steps, warmup = 20, 3
    elif on_accel and family == "conformer_long":
        # paper-regime long sequences: the real T12 corpus runs ~100-700
        # frames with a right-skewed distribution (SURVEY §2.4; ref
        # src/model/b2p2t_model.py:169-173 pads per batch max). Length
        # buckets keep short batches off the 704-frame shape; the scanned
        # (+remat) encoder keeps the 704-frame bucket inside HBM at bs 32
        # (unrolled OOMs there).
        gen = dict(
            session_names=sessionNames[:4],
            n_trials=300,
            n_blocks=5,
            test_dir_n_trials=8,
            min_frames=100,
            max_frames=700,
            length_distribution="t12",
        )
        run_cfg = dict(
            experiment_type="b2p2t_gru+w2v_conformer",
            wav2vec_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            tokenizer_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            unfreeze_strategy="brain_encoder+w2v",
            w2v_learning_rate=1e-4,
            w2v_warmup_start_step=0,
            w2v_warmup_steps=3,
            batch_size=32,
            epochs=4,
            compute_dtype="bfloat16",
            activation_dtype="bfloat16",
            use_pallas=True,
            pad_to_multiple=64,
            target_pad_to_multiple=64,
            length_buckets=4,
            length_bucket_order="grouped",
            # sorted batch composition: each batch pays its own covering
            # bucket width instead of the max of 32 uniform draws (A/B on
            # v5e: 227.6 vs 128.0 samples/s/chip median warm epoch).
            # Standard bucketed batching; numerics differ from uniform
            # composition (documented, off by default in the CLI).
            length_sorted_batches=True,
            scan_layers=True,
            h2d_dtype="float16",
            adam_mu_dtype="bfloat16",
            adam_nu_dtype="bfloat16",
        )
        steps, warmup = 20, 3
    elif on_accel:  # fft-sweep wav2vec2-base full-fine-tune shape
        gen = dict(
            session_names=sessionNames[:4],
            # 600 trials/session -> 1920 train sentences -> 30 batches of 64
            # per epoch: the real fft sweep runs ~8800 sentences (137
            # batches), so a 15-batch epoch would overweight the fixed
            # per-epoch dispatch+fetch cost ~9x vs reality
            n_trials=600,
            n_blocks=5,
            test_dir_n_trials=8,
            min_frames=280,
            max_frames=380,
        )
        run_cfg = dict(
            experiment_type="b2p2t_gru+w2v",
            wav2vec_checkpoint="facebook/wav2vec2-base-960h",
            tokenizer_checkpoint="facebook/wav2vec2-base-960h",
            unfreeze_strategy="brain_encoder+w2v",
            w2v_learning_rate=1e-4,
            w2v_warmup_start_step=0,
            w2v_warmup_steps=3,
            batch_size=64,
            # 4 epochs x 15 steps = 60 planned steps: above the scan-auto
            # probe threshold, and 3 warm epochs for the median
            epochs=4,
            compute_dtype="bfloat16",
            activation_dtype="bfloat16",
            use_pallas=True,
            pad_to_multiple=384,
            target_pad_to_multiple=64,
            h2d_dtype="float16",
            # bf16 moments: mu -2 ms/step (112.0 vs 113.9), nu -4.9 ms/step
            # (136.3 vs 141.2, tools/profile_step.py --mu/--nu-dtype A/B);
            # documented TPU-native options, f32 stays the parity default
            adam_mu_dtype="bfloat16",
            adam_nu_dtype="bfloat16",
        )
        steps, warmup = 20, 3
    else:  # CPU smoke mode
        gen = dict(
            session_names=sessionNames[:2],
            n_trials=8,
            n_blocks=2,
            test_dir_n_trials=4,
        )
        run_cfg = dict(
            experiment_type="b2p2t_gru+w2v_conformer",
            wav2vec_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            tokenizer_checkpoint="facebook/wav2vec2-conformer-rope-large-960h-ft",
            unfreeze_strategy="brain_encoder+w2v",
            w2v_learning_rate=1e-4,
            w2v_warmup_start_step=0,
            w2v_warmup_steps=3,
            batch_size=4,
            epochs=2,
            compute_dtype="float32",
            pad_to_multiple=256,
            target_pad_to_multiple=32,
        )
        steps, warmup = 3, 1
    return gen, run_cfg, steps, warmup


def _make_experiment(tmp, on_accel, family, **overrides):
    import wav2vec2forbrain_tpu.experiments.impl as impl
    from wav2vec2forbrain_tpu.args.yaml_config import YamlConfigModel
    from wav2vec2forbrain_tpu.data.synthetic import make_synthetic_splits_dir

    gen, run_cfg, steps, warmup = _bench_configs(on_accel, family)
    if not on_accel:
        from wav2vec2forbrain_tpu.args.base_args import PRETRAINED_LATENT_SIZES
        from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig

        impl.encoder_config_for_checkpoint = lambda ckpt: (
            "conformer",
            ConformerEncoderConfig.tiny_test(),
        )
        PRETRAINED_LATENT_SIZES[
            "facebook/wav2vec2-conformer-rope-large-960h-ft"
        ] = 96

    splits_dir = os.path.join(tmp, f"data_{family}")
    if not os.path.isdir(splits_dir):
        make_synthetic_splits_dir(splits_dir, seed=0, **gen)
    yaml_cfg = YamlConfigModel(
        cache_dir=os.path.join(tmp, f"cache_{family}"),
        fig_dir=os.path.join(tmp, "figs"),
        n3gram_lm_model_path=os.path.join(tmp, "missing_3gram.arpa"),
        n5gram_lm_model_path=os.path.join(tmp, "missing_5gram.arpa"),
        dataset_splits_dir=splits_dir,
        wandb_api_key="offline",
    )
    config = dict(
        learning_rate=1e-3,
        w2v_skip_loading_weights=True,  # random init: no HF download
        scan_layers="auto",
        return_best_model=False,  # keep tunnel D2H out of the timing
        # skip the post-train model.msgpack fetch: ~1.2 GB D2H through the
        # tunnel costs minutes of bench wall and is not part of the metric
        store_final_model=False,
        use_wandb=False,
        seed=0,
    )
    # update (not **splat): run_cfg may legitimately override the defaults
    # above (e.g. conformer_long pins scan_layers=True)
    config.update(run_cfg)
    config.update(overrides)
    exp_cls = (
        impl.B2TGruAndW2VConformerExperiment
        if config["experiment_type"] == "b2p2t_gru+w2v_conformer"
        else impl.B2TGruAndW2VExperiment
    )
    return exp_cls(config, yaml_cfg), steps, warmup


def bench_isolated_step(exp, steps, warmup):
    """Time the experiment's own train step on one resident batch.

    Runs on the experiment that the e2e phase will ALSO run, so the compile
    here IS the e2e phase's warmup: same jit objects, zero extra compile,
    one set of executables/params/caches in HBM. (A separate experiment
    instance would NOT reuse the compile even in-process: Mosaic kernel
    payloads embed trace-order-dependent bytes, so a re-traced identical
    program lowers to a different compile-cache key.)"""
    from wav2vec2forbrain_tpu.train.train_loop import Trainer

    tr = Trainer(exp)
    # _put (not _stream_for): the prefetcher thread of an abandoned stream
    # would keep device batches pinned; shape/dtype/sharding of the batch are
    # identical either way, so the compiled program is the e2e program
    batch, _true_b = tr._put(next(iter(exp.dataloader_train)))
    trainable, frozen = tr.trainable, tr.frozen
    opt_state, state, rng = tr.opt_state, tr.model_state, tr.rng

    def run_step(trainable, opt_state, state, rng):
        return tr.train_step(
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
    # warm the eval-step program too (the e2e phase runs it every epoch)
    ev = tr.eval_step(trainable, frozen, state, batch)
    float(ev[0])

    batch_size = batch.input.shape[0]
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
    # inference/serving figure: the already-compiled eval-mode forward
    # (no dropout, no backward, no optimizer) on the same resident batch
    best_eval = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            ev = tr.eval_step(trainable, frozen, state, batch)
        float(ev[0])
        dt = time.perf_counter() - t0
        best_eval = max(best_eval, batch_size * steps / dt)
    # the isolated stepping DONATED the experiment's param/opt/state buffers
    # into its step chain; drop our refs so _reset_device_state can rebuild
    del out, ev, trainable, frozen, opt_state, state, batch, tr
    return best, best_eval


def _reset_device_state(exp):
    """Fresh params/opt-state/rng on the SAME experiment after the isolated
    phase consumed (donated) its device buffers — the jitted steps and their
    compiled executables are kept (shapes unchanged), as are the device
    dataset caches."""
    import gc

    import jax

    gc.collect()
    exp._init_rng = jax.random.PRNGKey(exp.base_config.seed)
    exp._build_model()
    exp.opt_state = exp.shard_params(jax.jit(exp.tx.init)(exp.trainable))
    exp.step_rng = exp.canonical_rng(
        jax.random.PRNGKey(exp.base_config.seed + 1)
    )


def bench_long(tmp, on_accel):
    """Long-sequence (paper-regime) e2e row: Trainer throughput on the t12
    length distribution with length buckets + width-grouped chunking.
    No isolated phase — the multi-bucket epoch runs several step shapes, so
    a single fixed-shape step number would not be comparable; epoch 1
    carries the per-bucket compiles and is excluded by the warm median."""
    exp, _steps, _warmup = _make_experiment(tmp, on_accel, "conformer_long")
    t0 = time.perf_counter()
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
    warm = tput[1:] or tput
    buckets = exp.get_device_caches()["train"]._buckets
    return float(np.median(warm)), tput, wall, buckets


def bench_family(tmp, on_accel, family="conformer", **overrides):
    """One experiment, two measurements: isolated step timing (which doubles
    as the full warmup), then the real Trainer run on the same jit programs.
    Returns (isolated_train, isolated_eval, e2e_median, per-epoch list,
    wall seconds).

    On accelerators the encoder is explicitly UNROLLED (scan_layers=false):
    this benchmark measures steady state at a known single-bucket shape, and
    the unrolled step is the fast one (128 vs 216 ms). scan_layers=auto's
    compile-cache probe serves warm RE-runs of a config across processes."""
    cfg = dict(scan_layers=False) if on_accel else {}
    cfg.update(overrides)
    exp, steps, warmup = _make_experiment(tmp, on_accel, family, **cfg)
    isolated, isolated_eval = bench_isolated_step(exp, steps, warmup)
    _reset_device_state(exp)
    t0 = time.perf_counter()
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
    # median over the warm epochs (epoch 1 still carries residual host-side
    # start-up; single-epoch readings swing ±20% with tunnel/host conditions)
    warm = tput[1:] or tput
    return isolated, isolated_eval, float(np.median(warm)), tput, wall


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
        import gc

        last = None
        for i in range(attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 - deliberate catch-all
                print(f"bench phase attempt {i + 1} failed: {e!r}", flush=True)
                # drop the traceback BEFORE retrying: its frames pin the
                # failed attempt's device arrays (params/opt state), which
                # would turn one transient failure into real HBM pressure
                # for every following attempt
                last = e.with_traceback(None)
                del e
                gc.collect()
                if i + 1 < attempts:
                    time.sleep(wait)
        raise last

    def run_family_with_fallbacks(tmp, family):
        """Config ladder: peak config first, then degrade on hard failures
        (e.g. HBM pressure from a coexisting executable set) — a benchmark
        should record the best configuration that actually runs, visibly."""
        import gc

        ladder = [
            {},  # unrolled + device-resident dataset cache
            {"device_data_cache": "off"},  # unrolled + streaming
            {"scan_layers": "auto", "device_data_cache": "off"},  # scanned
        ]
        last = None
        for i, ov in enumerate(ladder):
            try:
                out = retry(
                    lambda: bench_family(tmp, on_accel, family, **ov), 2
                )
                return out + (ov,)
            except Exception as e:  # noqa: BLE001
                print(
                    f"bench config {ov or 'default'} failed: {e!r}; "
                    "degrading", flush=True,
                )
                last = e.with_traceback(None)
                del e
                gc.collect()
        raise last

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    extra = {}
    try:
        isolated, isolated_eval, e2e, epochs_tput, e2e_wall, e2e_cfg = (
            run_family_with_fallbacks(tmp, "conformer")
        )

        warm = epochs_tput[1:] or epochs_tput
        spread = (max(warm) / min(warm) - 1.0) if len(warm) > 1 else 0.0
        extra = {
            "isolated_train_step_samples_per_sec_per_chip": round(isolated, 2),
            "isolated_vs_baseline": round(
                isolated / A100_CONFORMER_SAMPLES_PER_SEC_EST, 3
            ),
            # serving figure: eval-mode forward (no dropout/backward/
            # optimizer) on the same compiled experiment
            "isolated_inference_samples_per_sec_per_chip": round(
                isolated_eval, 2
            ),
            "per_epoch_samples_per_sec_per_chip": [
                round(t, 2) for t in epochs_tput
            ],
            "best_epoch_samples_per_sec_per_chip": round(max(warm), 2),
            "warm_epoch_spread": round(spread, 3),
            # >25% spread between warm epochs = transient tunnel/host
            # weather; the median headline is then a weather report, not a
            # capability number — flag it loudly
            "spread_warning": spread > 0.25,
            "e2e_run_wall_s": round(e2e_wall, 1),
            # {} = the peak config (unrolled + device cache) ran first try
            "e2e_config_overrides": e2e_cfg,
        }

        if on_accel:
            # second model family (fft-sweep wav2vec2-base, bs 64; A100
            # measured ≈87 samples/s incl. eval): best-effort — its remote
            # compiles trip transient 500s more often, and a failure only
            # nulls these extras, never the headline
            import gc

            gc.collect()  # free the conformer family's device state first
            try:
                w2v_iso, w2v_ieval, w2v_e2e, w2v_epochs, _wall, _cfg = (
                    run_family_with_fallbacks(tmp, "w2v_base")
                )
                extra["w2v_base_fft_isolated_samples_per_sec_per_chip"] = round(
                    w2v_iso, 2
                )
                extra["w2v_base_fft_e2e_samples_per_sec_per_chip"] = round(
                    w2v_e2e, 2
                )
                extra["w2v_base_fft_e2e_vs_a100"] = round(
                    w2v_e2e / A100_W2V_BASE_SAMPLES_PER_SEC_MEASURED, 3
                )
                extra["w2v_base_inference_samples_per_sec_per_chip"] = round(
                    w2v_ieval, 2
                )
                extra["w2v_base_per_epoch"] = [
                    round(t, 2) for t in w2v_epochs
                ]
            except Exception:
                extra["w2v_base_fft_isolated_samples_per_sec_per_chip"] = None
                extra["w2v_base_fft_e2e_samples_per_sec_per_chip"] = None

            # third phase: paper-regime long sequences (t12 length
            # distribution to 700 frames, length buckets) — best-effort
            gc.collect()
            try:
                long_e2e, long_epochs, long_wall, long_buckets = retry(
                    lambda: bench_long(tmp, on_accel), 2
                )
                extra["long_seq_e2e_samples_per_sec_per_chip"] = round(
                    long_e2e, 2
                )
                extra["long_seq_e2e_vs_baseline"] = round(
                    long_e2e / A100_CONFORMER_SAMPLES_PER_SEC_EST, 3
                )
                extra["long_seq_per_epoch"] = [
                    round(t, 2) for t in long_epochs
                ]
                long_warm = long_epochs[1:] or long_epochs
                long_spread = (
                    (max(long_warm) / min(long_warm) - 1.0)
                    if len(long_warm) > 1
                    else 0.0
                )
                # same contract as the headline family: a >25% spread
                # between warm epochs means the median hides an outlier
                # (late recompile / host stall) — never ship it silently
                # (round 4 shipped a hidden 8x epoch-4 collapse)
                extra["long_seq_warm_epoch_spread"] = round(long_spread, 3)
                extra["long_seq_spread_warning"] = long_spread > 0.25
                extra["long_seq_bucket_widths_frames"] = long_buckets
                extra["long_seq_run_wall_s"] = round(long_wall, 1)
            except Exception as e:
                print(f"long-seq phase failed: {e!r}", flush=True)
                extra["long_seq_e2e_samples_per_sec_per_chip"] = None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

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
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
