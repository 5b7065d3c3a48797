"""Serving throughput: eval-mode forward of the flagship models vs batch.

Inference has no backward pass and no optimizer state, so much larger
batches fit HBM than in training — and the short-sequence conformer only
reaches MXU-efficient shapes with a big B. This sweeps batch sizes at the
headline input shape (384 frames -> 88 encoder frames) and prints
samples/sec/chip per (family, batch).

Run on the TPU:  python tools/infer_bench.py [--family conformer|w2v_base]
                 [--batches 32,64,128,256]

The measured step is the same `forward(..., train=False)` program that
`eval_step` / `--only_test` prediction runs (train/steps.py), minus the CTC
loss term — the serving path emits logits for the host-side decoder.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="conformer",
                    choices=["conformer", "w2v_base"])
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--frames", type=int, default=384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp

    from wav2vec2forbrain_tpu.models.assembly import (
        ModelSpec, forward, init_model_params,
    )

    if args.family == "conformer":
        from wav2vec2forbrain_tpu.models.conformer import (
            ConformerEncoderConfig,
        )

        spec = ModelSpec(
            latent_size=1024,
            encoder_family="conformer",
            conformer_cfg=ConformerEncoderConfig.rope_large_960h(),
            compute_dtype=jnp.bfloat16,
            activation_dtype=jnp.bfloat16,
            scan_layers=False,
            use_pallas=True,
        )
    else:
        from wav2vec2forbrain_tpu.models.wav2vec2 import Wav2Vec2EncoderConfig

        spec = ModelSpec(
            latent_size=768,
            encoder_family="wav2vec2",
            w2v_cfg=Wav2Vec2EncoderConfig.base_960h(),
            compute_dtype=jnp.bfloat16,
            activation_dtype=jnp.bfloat16,
            scan_layers=False,
            use_pallas=True,
        )

    rng = jax.random.PRNGKey(0)
    params, state = init_model_params(rng, spec)

    @jax.jit
    def infer(params, state, x, day_idxs, input_lens):
        logits, logit_lens, _ = forward(
            params, state, spec, x, day_idxs, input_lens, rng=None,
            train=False,
        )
        return logits, logit_lens

    gen = np.random.default_rng(0)
    t = args.frames
    for bs in [int(b) for b in args.batches.split(",")]:
        x = jnp.asarray(gen.normal(size=(bs, t, 256)), jnp.float32)
        day_idxs = jnp.zeros((bs,), jnp.int32)
        input_lens = jnp.full((bs,), t, jnp.int32)
        try:
            logits, _ = infer(params, state, x, day_idxs, input_lens)
            float(jnp.sum(logits.astype(jnp.float32)))  # fence (axon tunnel)
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    logits, _ = infer(params, state, x, day_idxs, input_lens)
                float(jnp.sum(logits.astype(jnp.float32)))
                dt = time.perf_counter() - t0
                best = max(best, bs * args.iters / dt)
            print(f"{args.family} bs={bs}: {best:.1f} samples/sec/chip",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - OOM at large batches
            print(f"{args.family} bs={bs}: failed ({type(e).__name__})",
                  flush=True)
            break


if __name__ == "__main__":
    main()
