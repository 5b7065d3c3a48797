"""Decompose the headline conformer fine-tune step's device time.

Times (with the axon-safe scalar-fetch fence) a set of progressively smaller
jitted programs at the bench shape so the step's cost can be attributed:

  full        train step (fwd+bwd+adam, brain_encoder+w2v)
  fwd         forward_with_loss only
  enc_step    encoder+head+CTC fwd+bwd from fixed latents
  bfe_step    preproc+GRU+FC fwd+bwd (latents L2 head)
  opt         optimizer update from precomputed grads

Run on the TPU: python tools/profile_step.py [--scan] [--no-pallas]
Optionally dumps a jax.profiler trace with --trace <dir>.
"""

import argparse
import time

import numpy as np


def fence(x):
    """Scalar D2H is the only reliable fence through the axon tunnel."""
    import jax.numpy as jnp

    return float(jnp.sum(x)) if hasattr(x, "dtype") else float(x)


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000.0




def consume_grads(l, g):
    """Force EVERY weight-grad to be computed: XLA dead-code-eliminates the
    dW matmuls of any leaf whose gradient the jit output does not use (a
    +0.0*sum trick gets constant-folded; a 1e-30-scaled quadratic survives).
    Consuming only one leaf under-reports fwd+bwd by the dropped matmuls —
    measured 34 ms vs the honest 80+ ms for the 24-layer encoder."""
    import jax
    import jax.numpy as jnp

    return l + 1e-30 * sum(
        jnp.sum(x.astype(jnp.float32) ** 2)
        for x in jax.tree_util.tree_leaves(g)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--trace", default=None)
    ap.add_argument(
        "--remat",
        default="min",
        choices=["min", "dots", "dots_nowide", "blocks", "all_but_wide", "none"],
    )
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat the full-step 10-iter timing window")
    ap.add_argument("--act-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="encoder activation-stream dtype")
    ap.add_argument("--only", default=None, choices=[None, "full"],
                    help="'full': stop after the full-step timing")
    ap.add_argument("--mu-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="Adam first-moment storage dtype (--adam_mu_dtype)")
    ap.add_argument("--nu-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="Adam second-moment storage dtype (--adam_nu_dtype)")
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    global jax
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from wav2vec2forbrain_tpu.models.assembly import (
        ModelSpec,
        forward_with_loss,
        init_model_params,
        param_labels,
    )
    from wav2vec2forbrain_tpu.models.conformer import ConformerEncoderConfig
    from wav2vec2forbrain_tpu.ops.ctc import ctc_loss
    from wav2vec2forbrain_tpu.train.optim import make_optimizer
    from wav2vec2forbrain_tpu.train.steps import (
        StepConfig,
        build_steps,
        partition_params,
        prune_labels,
    )

    cfg = ConformerEncoderConfig.rope_large_960h()
    spec = ModelSpec(
        latent_size=1024,
        encoder_family="conformer",
        conformer_cfg=cfg,
        compute_dtype=jnp.bfloat16,
        use_pallas=not args.no_pallas,
        scan_layers=args.scan,
        remat_policy=args.remat,
        activation_dtype=(
            jnp.bfloat16 if args.act_dtype == "bfloat16" else jnp.float32
        ),
    )
    b, t, u = args.batch, args.frames, 32
    params, state = init_model_params(jax.random.PRNGKey(0), spec)
    labels = param_labels(params, "brain_encoder+w2v")
    trainable, frozen = partition_params(params, labels)
    tlabels = prune_labels(labels, trainable)
    tx = make_optimizer(
        tlabels,
        mu_dtype=jnp.bfloat16 if args.mu_dtype == "bfloat16" else None,
        nu_dtype=jnp.bfloat16 if args.nu_dtype == "bfloat16" else None,
    )
    opt_state = jax.jit(tx.init)(trainable)
    train_step, _ = build_steps(spec, tlabels, tx, StepConfig(None, 0.0, 0.0))

    batch = _make_batch(np.random.default_rng(0), b, t, u)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(1)

    # full step: buffers are donated, so carry the state like the Trainer does
    def run_full(n, tr, osd, st, key):
        out = None
        for _ in range(n):
            out = train_step(tr, frozen, osd, st, batch, key, 1e-4, 1e-5)
            tr, osd, st, key = (
                out.params, out.opt_state, out.model_state, out.rng
            )
        fence(out.loss)
        return tr, osd, st, key

    carry = run_full(3, trainable, opt_state, state, rng)
    for _ in range(args.reps):
        t0 = time.perf_counter()
        carry = run_full(10, *carry)
        print(
            "full_step_ms", round((time.perf_counter() - t0) / 10 * 1000.0, 2)
        )
    if args.trace:
        with jax.profiler.trace(args.trace):
            carry = run_full(3, *carry)
        print("trace written to", args.trace)
    # XLA-counted cost of the full-step executable (the MFU numerator the
    # README quotes): lower with abstract args so the donated live buffers
    # are untouched; same shapes/fn -> the executable cache is reused.
    try:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (carry[0], frozen, carry[1], carry[2], batch, carry[3]),
        )
        tr_a, fr_a, o_a, s_a, b_a, r_a = abstract
        ca = (
            train_step.lower(tr_a, fr_a, o_a, s_a, b_a, r_a, 1e-4, 1e-5)
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print("full_step_xla_tflops", round(ca["flops"] / 1e12, 3))
        if "bytes accessed" in ca:
            print(
                "full_step_xla_hbm_gb", round(ca["bytes accessed"] / 1e9, 2)
            )
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
        print(f"cost_analysis unavailable: {e!r}")
    if args.only == "full":
        return
    # free the full-step carry + executable before the (remat-free,
    # non-donating) sub-benchmarks: together they do not fit v5e HBM
    del carry
    import gc

    del train_step, run_full
    gc.collect()
    # re-init donated buffers for the sub-benchmarks below
    params, state = init_model_params(jax.random.PRNGKey(0), spec)
    trainable, frozen = partition_params(params, labels)
    opt_state = jax.jit(tx.init)(trainable)

    @jax.jit
    def fwd(params, rng):
        out = forward_with_loss(
            params, state, spec, batch.input, batch.day_idxs,
            batch.input_lens, batch.target, batch.target_lens, rng,
            train=True, sample_mask=batch.sample_mask,
        )
        return out["loss"]

    print("fwd_only_ms", round(timeit(fwd, params, rng), 2))

    # encoder+head+CTC fwd+bwd from fixed latents
    t_lat = (t - 32) // 4 + 1
    latents = jax.random.normal(
        jax.random.PRNGKey(2), (b, t_lat, 1024), jnp.float32
    ).astype(spec.activation_dtype)
    lat_lens = jnp.full((b,), t_lat, jnp.int32)
    from wav2vec2forbrain_tpu.models.conformer import (
        apply_conformer_encoder,
        apply_conformer_encoder_scanned,
    )
    from wav2vec2forbrain_tpu.models.fc import apply_linear

    enc_fn = (
        apply_conformer_encoder_scanned
        if args.scan
        else apply_conformer_encoder
    )

    @jax.jit
    def enc_step(w2v, rng):
        def loss_fn(w2v):
            hidden, _ = enc_fn(
                w2v["encoder"], state["encoder"], latents, cfg, rng, True,
                jnp.bfloat16, use_pallas=not args.no_pallas,
            )
            logits = apply_linear(w2v["lm_head"], hidden, jnp.bfloat16)
            return ctc_loss(
                logits.astype(jnp.float32), lat_lens, batch.target,
                batch.target_lens,
            )

        l, g = jax.value_and_grad(loss_fn)(w2v)
        return consume_grads(l, g)

    print("enc_fwd_bwd_ms", round(timeit(enc_step, params["w2v"], rng), 2))

    # brain feature extractor fwd+bwd
    from wav2vec2forbrain_tpu.models.fc import apply_fc  # noqa: F811
    from wav2vec2forbrain_tpu.models.gru import apply_gru
    from wav2vec2forbrain_tpu.models.preprocessing import (
        GAUSS_KERNEL_SIZE,
        apply_preproc,
        gaussian_kernel,
    )
    from wav2vec2forbrain_tpu.ops.pallas_preproc import apply_preproc_pallas

    @jax.jit
    def bfe_step(brain, rng):
        def loss_fn(brain):
            if not args.no_pallas:
                feats, _ = apply_preproc_pallas(
                    brain["preproc"], batch.input, batch.day_idxs,
                    batch.input_lens, spec.gaussian_smooth_width,
                    spec.unfolder_kernel_len, spec.unfolder_stride_len,
                )
            else:
                sk = gaussian_kernel(
                    GAUSS_KERNEL_SIZE, spec.gaussian_smooth_width
                )
                feats, _ = apply_preproc(
                    brain["preproc"], batch.input, batch.day_idxs,
                    batch.input_lens, sk, spec.unfolder_kernel_len,
                    spec.unfolder_stride_len,
                )
            h = apply_gru(
                brain["gru"], feats, spec.gru_hidden_size,
                spec.gru_num_layers, spec.gru_bidirectional, 0.0, True, rng,
                False, compute_dtype=jnp.bfloat16,
                use_pallas=not args.no_pallas,
            )
            lat = apply_fc(brain["fc"], h, spec.fc_activation, jnp.bfloat16)
            return jnp.sum(lat * lat) * 1e-6

        l, g = jax.value_and_grad(loss_fn)(brain)
        return consume_grads(l, g)

    print("bfe_fwd_bwd_ms", round(timeit(bfe_step, params["brain"], rng), 2))

    # per-block fwd+bwd at the encoder shape, x24 layers (conformer only):
    # where does encoder time go?
    from wav2vec2forbrain_tpu.models.conformer import (
        conformer_conv_module,
        conformer_feed_forward,
        conformer_self_attention,
        init_conformer_layer_params,
        init_conformer_state,
        rotary_cos_sin,
    )

    lp = init_conformer_layer_params(jax.random.PRNGKey(3), cfg)
    ls = init_conformer_state(cfg)["layers"][0]
    xblk = latents  # stream dtype: blocks emit what they receive
    head = cfg.hidden_size // cfg.num_attention_heads
    cos, sin = rotary_cos_sin(t_lat, head, cfg.rotary_embedding_base)
    n_layers = cfg.num_hidden_layers

    def reps(fn):
        @jax.jit
        def run(p, x, key):
            def loss(p):
                h = x
                for i in range(n_layers):
                    h = fn(p, h, key)
                return jnp.sum(h * h)

            l, g = jax.value_and_grad(loss)(p)
            return consume_grads(l, g)

        return run

    blocks = {
        # one macaron HALF; the layer runs two of these (ffn1 + ffn2), so
        # the per-step FFN share is 2x this number
        "ffn_half_x24": lambda p, h, key: conformer_feed_forward(
            p["ffn1"], h, cfg, key, True, jnp.bfloat16
        )[0],
        "attn_x24": lambda p, h, key: conformer_self_attention(
            p["self_attn"], h, cfg, cos, sin, key, True, jnp.bfloat16,
            use_pallas=not args.no_pallas,
        )[0],
        "conv_x24": lambda p, h, key: conformer_conv_module(
            p["conv_module"], ls, h, cfg, key, True, jnp.bfloat16,
            use_pallas=not args.no_pallas,
        )[0],
    }
    for name, fn in blocks.items():
        print(
            name + "_fwd_bwd_ms",
            round(timeit(reps(fn), lp, xblk, rng), 2),
        )

    # optimizer alone (grads built in-jit; free the big executables first)
    import gc

    del enc_step, bfe_step, fwd
    gc.collect()

    @jax.jit
    def opt(opt_state, trainable):
        grads = jax.tree_util.tree_map(jnp.ones_like, trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        return jax.tree_util.tree_leaves(updates)[0]

    print("opt_ms", round(timeit(opt, opt_state, trainable), 2))

if __name__ == "__main__":
    main()
