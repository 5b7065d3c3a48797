"""A/B the K-step scan chunk vs the per-batch single step at the bench shape.

Measures, on the real device at the exact bench config:
  single  N steps of the experiment's jitted per-batch step, one fence
  multi   N steps dispatched as N/K chunks of build_multi_step, fetching the
          stacked per-step outputs (the Trainer's evaluator payload) per chunk

Run: PYTHONPATH=/root/repo python tools/proto_multistep.py [--k 8] [--steps 24]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax

    import bench

    on_accel = jax.devices()[0].platform in ("tpu", "gpu")
    tmp = tempfile.mkdtemp(prefix="proto_multistep_")
    exp, _s, _w = bench._make_experiment(
        tmp, on_accel, "conformer", scan_layers=False
    )

    from wav2vec2forbrain_tpu.train.steps import StepConfig, build_multi_step
    from wav2vec2forbrain_tpu.train.train_loop import Trainer

    tr = Trainer(exp)
    cache = exp.get_device_caches()["train"]
    cfg = exp.base_config
    b = cfg.batch_size
    n_samples = len(exp.dataloader_train.dataset)
    rng_np = np.random.default_rng(0)

    def chunk_inputs(k):
        idx = rng_np.integers(0, n_samples, size=(k, b)).astype(np.int32)
        mask = np.ones((k, b), np.float32)
        return idx, mask

    # --- single-step loop (the current Trainer inner loop, no evaluator) ----
    batch, _tb = tr._put(next(iter(exp.dataloader_train)))
    t_, f_, o_, s_, r_ = tr.trainable, tr.frozen, tr.opt_state, tr.model_state, tr.rng
    out = None
    for _ in range(2):  # warm/compile
        out = tr.train_step(t_, f_, o_, s_, batch, r_, 1e-4, 1e-5)
        t_, o_, s_, r_ = out.params, out.opt_state, out.model_state, out.rng
    float(out.loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = tr.train_step(t_, f_, o_, s_, batch, r_, 1e-4, 1e-5)
        t_, o_, s_, r_ = out.params, out.opt_state, out.model_state, out.rng
    float(out.loss)
    dt = time.perf_counter() - t0
    print(
        f"single: {dt / args.steps * 1000:.1f} ms/step "
        f"({b * args.steps / dt:.1f} samples/s)",
        flush=True,
    )
    # per-step fetch variant (what the e2e Trainer pays for the evaluator)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = tr.train_step(t_, f_, o_, s_, batch, r_, 1e-4, 1e-5)
        t_, o_, s_, r_ = out.params, out.opt_state, out.model_state, out.rng
        float(out.loss)
        np.asarray(out.pred_ids)
        np.asarray(out.logit_lens)
    dt = time.perf_counter() - t0
    print(
        f"single+fetch: {dt / args.steps * 1000:.1f} ms/step "
        f"({b * args.steps / dt:.1f} samples/s)",
        flush=True,
    )

    # --- multi-step scan chunks ---------------------------------------------
    multi = build_multi_step(
        exp.spec,
        exp.trainable_labels,
        exp.tx,
        StepConfig(
            cfg.gradient_clipping, cfg.whiteNoiseSD, cfg.constantOffsetSD
        ),
        state_constraints=None,
    )
    k = args.k
    n_chunks = max(1, args.steps // k)
    idx, mask = chunk_inputs(k)
    print(f"compiling multi_step k={k} ...", flush=True)
    t0 = time.perf_counter()
    mo = multi(t_, f_, o_, s_, cache._dev, idx, mask, np.ones((k,), bool), r_, 1e-4, 1e-5, cache._t_full)
    t_, o_, s_, r_ = mo.params, mo.opt_state, mo.model_state, mo.rng
    float(mo.loss[-1])
    print(f"multi compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        idx, mask = chunk_inputs(k)
        mo = multi(t_, f_, o_, s_, cache._dev, idx, mask, np.ones((k,), bool), r_, 1e-4, 1e-5, cache._t_full)
        t_, o_, s_, r_ = mo.params, mo.opt_state, mo.model_state, mo.rng
        # the evaluator payload: stacked loss/pred_ids/logit_lens, one fetch
        np.asarray(mo.loss)
        np.asarray(mo.pred_ids)
        np.asarray(mo.logit_lens)
    dt = time.perf_counter() - t0
    n = n_chunks * k
    print(
        f"multi k={k} (+fetch): {dt / n * 1000:.1f} ms/step "
        f"({b * n / dt:.1f} samples/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
