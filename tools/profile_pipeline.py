"""Isolate the e2e Trainer's per-step host costs on the real device.

Runs the scanned headline train step in four loop variants:

  A resident   one device-resident batch, no per-step host work (device bound)
  B h2d        fresh device_put of a 13 MB numpy batch every step
  C h2d+fetch  B plus the Trainer's lag-1 fetch (async-copied loss+pred_ids)
  D trainer    C with the batch device_put on a prefetch thread (the real loop)

A..D converging means the host pipeline is free; gaps name the culprit.
Run: PYTHONPATH=/root/repo python tools/profile_pipeline.py [--steps N]
"""

import argparse
import queue
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--remat", default="min")
    args = ap.parse_args()

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

    cfg = ConformerEncoderConfig.rope_large_960h()
    spec = ModelSpec(
        latent_size=1024,
        encoder_family="conformer",
        conformer_cfg=cfg,
        compute_dtype=jnp.bfloat16,
        use_pallas=True,
        scan_layers=True,
        remat_policy=args.remat,
    )
    b, t, u = 32, 384, 32
    params, state0 = init_model_params(jax.random.PRNGKey(0), spec)
    labels = param_labels(params, "brain_encoder+w2v")
    trainable0, frozen = partition_params(params, labels)
    tlabels = prune_labels(labels, trainable0)
    tx = make_optimizer(tlabels)
    train_step, _ = build_steps(spec, tlabels, tx, StepConfig(None, 0.0, 0.0))

    host_batches = [
        _make_batch(np.random.default_rng(i), b, t, u) for i in range(8)
    ]

    def put(i):
        return jax.tree_util.tree_map(
            jnp.asarray, host_batches[i % len(host_batches)]
        )

    def run(variant, n, carry):
        # buffers are donated by the step: thread one live copy through all
        # variants (weights drift during timing, which is irrelevant here)
        trainable, opt_state, state, rng = carry
        dev_batch = put(0)
        pending = None
        stream = None
        if variant == "D":
            q = queue.Queue(maxsize=2)

            def worker():
                for i in range(n):
                    q.put(put(i))

            threading.Thread(target=worker, daemon=True).start()
            stream = q
        # warmup one step (compile already cached from earlier runs)
        out = train_step(
            trainable, frozen, opt_state, state, dev_batch, rng, 1e-4, 1e-5
        )
        trainable, opt_state, state, rng = (
            out.params, out.opt_state, out.model_state, out.rng
        )
        float(out.loss)
        t0 = time.perf_counter()
        for i in range(n):
            if variant == "A":
                batch = dev_batch
            elif variant in ("B", "C"):
                batch = put(i)
            else:
                batch = stream.get()
            out = train_step(
                trainable, frozen, opt_state, state, batch, rng, 1e-4, 1e-5
            )
            trainable, opt_state, state, rng = (
                out.params, out.opt_state, out.model_state, out.rng
            )
            if variant in ("C", "D"):
                for a in (out.loss, out.pred_ids):
                    copy = getattr(a, "copy_to_host_async", None)
                    if copy is not None:
                        copy()
                if pending is not None:
                    float(pending[0])
                    np.asarray(pending[1])
                pending = (out.loss, out.pred_ids)
        if pending is not None:
            float(pending[0])
            np.asarray(pending[1])
        float(out.loss)
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"{variant}_step_ms {dt:.1f}", flush=True)
        return trainable, opt_state, state, rng

    carry = (
        trainable0,
        jax.jit(tx.init)(trainable0),
        state0,
        jax.random.PRNGKey(1),
    )
    for variant in ("A", "B", "C", "D"):
        carry = run(variant, args.steps, carry)


if __name__ == "__main__":
    main()
