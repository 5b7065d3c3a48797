"""Attribute the e2e Trainer's per-step host costs at the EXACT bench config.

bench.py r3 recorded e2e 214.85 vs isolated 295.33 samples/s/chip (-27%):
~40 ms/step of systematic host-side cost under driver conditions. This tool
builds the same experiment bench.py builds (conformer headline, device cache,
unrolled) and runs one instrumented epoch, timing every host phase of the
Trainer's lag-1 loop:

  gather     device-cache gather dispatch (jitted gather + host_batch view)
  dispatch   train_step jit call (arg flattening + RPC enqueue)
  async      copy_to_host_async kickoff
  f_loss     blocking float(out.loss) of the LAG-1 step
  f_pred     np.asarray(out.pred_ids)
  f_lens     np.asarray(out.logit_lens)   <- NOT async-prefetched in r3
  decode     evaluator.track_batch (tokenizer decode + WER)

Run: PYTHONPATH=/root/repo python tools/profile_e2e.py [--steps N]
"""

import argparse
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax

    import bench

    on_accel = jax.devices()[0].platform in ("tpu", "gpu")
    tmp = tempfile.mkdtemp(prefix="profile_e2e_")
    exp, _steps, _warmup = bench._make_experiment(
        tmp, on_accel, "conformer", scan_layers=False
    )

    from wav2vec2forbrain_tpu.train.train_loop import Trainer, _copy_to_host_async

    tr = Trainer(exp)
    evaluator = exp.create_evaluator("train")
    loader = tr.dataloader_train
    stream = tr._stream_for(loader)

    t = defaultdict(float)
    counts = defaultdict(int)

    def clock(key, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        dt = time.perf_counter() - t0
        t[key] += dt
        counts[key] += 1
        return out

    pending = None
    n_timed = 0
    i = 0
    t_wall = None
    it = iter(stream)
    while True:
        try:
            tup = clock("gather", lambda: next(it))
        except StopIteration:
            break
        batch, true_b, host_batch = tup
        out = clock(
            "dispatch",
            tr.train_step,
            tr.trainable, tr.frozen, tr.opt_state, tr.model_state,
            batch, tr.rng, 1e-4, 1e-5,
        )
        tr.trainable, tr.opt_state, tr.model_state, tr.rng = (
            out.params, out.opt_state, out.model_state, out.rng
        )
        clock(
            "async", _copy_to_host_async, out.loss, out.pred_ids, out.logit_lens
        )
        if pending is not None:
            p_out, p_host, p_true = pending
            loss = clock("f_loss", float, p_out.loss)
            pred_ids = clock(
                "f_pred", lambda: np.asarray(p_out.pred_ids)[:p_true]
            )
            lens = clock(
                "f_lens", lambda: np.asarray(p_out.logit_lens)[:p_true]
            )
            preds = {"loss": loss, "pred_ids": pred_ids, "logit_lens": lens}
            clock("decode", evaluator.track_batch, preds, p_host)
        pending = (out, host_batch, true_b)
        i += 1
        if i == 3:
            # drop compile/first-steps: restart the timers
            for k in list(t):
                t[k] = 0.0
                counts[k] = 0
            t_wall = time.perf_counter()
            n_timed = 0
        if i >= 3:
            n_timed += 1
        if i >= args.steps + 3:
            break
    # final pending fetch outside the timed window
    if pending is not None:
        float(pending[0].loss)
    wall = time.perf_counter() - t_wall if t_wall else 0.0
    if hasattr(stream, "close"):
        stream.close()

    bsz = exp.base_config.batch_size
    print(f"\nsteps timed: {n_timed}  batch={bsz}")
    print(f"wall/step: {wall / max(1, n_timed) * 1000:.1f} ms "
          f"({bsz * n_timed / wall:.1f} samples/s)")
    total_host = 0.0
    for k in ("gather", "dispatch", "async", "f_loss", "f_pred", "f_lens",
              "decode"):
        if counts[k]:
            ms = t[k] / counts[k] * 1000
            total_host += t[k]
            print(f"  {k:9s} {ms:7.2f} ms/step  (n={counts[k]})")
    print(f"  host total {total_host / max(1, n_timed) * 1000:7.2f} ms/step")


if __name__ == "__main__":
    main()
