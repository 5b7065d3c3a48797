"""Predict-pass wall: lag-1 pipelined (shipped) vs synchronous fetch.

The `--only_test` / `--predict_on_train` pass fetches FULL logits per batch
(the largest D2H the framework does — an RTT per batch through remote
tunnels). `_predict` (experiments/impl.py) overlaps that fetch with the
next batch's eval compute, lag-1, exactly like the Trainer epochs; round 3
fetched synchronously per batch.

This tool times predict-on-train over the synthetic set both ways on the
REAL experiment machinery and prints one JSON line — the round-4 item-8
artifact. The synchronous variant is the shipped `_predict` with its
pipeline collapsed (process immediately after dispatch), i.e. identical
work, no overlap.

  python tools/predict_bench.py            # w2v-base shape on the TPU
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax
    import numpy as np

    import bench
    from wav2vec2forbrain_tpu.train.train_loop import Trainer

    on_accel = jax.devices()[0].platform in ("tpu", "gpu")
    tmp = tempfile.mkdtemp(prefix="predict_bench_")
    exp, _steps, _warmup = bench._make_experiment(
        tmp,
        on_accel,
        "w2v_base" if on_accel else "conformer",
        scan_layers=False if on_accel else "auto",
        visualize_predictions_n_batches=0,
    )
    tr = Trainer(exp)
    n_samples = len(exp.dataloader_train.dataset)

    def synchronous_predict():
        """The shipped loop with the pipeline collapsed: fetch + decode each
        batch before dispatching the next (round-3 behavior)."""
        evaluator = exp.create_evaluator("train", True)
        for host_batch in exp.dataloader_train:
            batch, true_b = tr._put(host_batch)
            loss, logits, logit_lens, pred_ids, _m = tr.eval_step(
                tr.trainable, tr.frozen, tr.model_state, batch
            )
            evaluator.track_batch(
                {
                    "loss": float(loss),
                    "pred_ids": np.asarray(pred_ids)[:true_b],
                    "logits": np.asarray(logits)[:true_b],
                    "logit_lens": np.asarray(logit_lens)[:true_b],
                },
                host_batch,
            )
        out = evaluator.evaluate()
        evaluator.clean_up()
        return out

    results = {}
    exp._predict(tr, "train")  # warmup: eval-program compile + caches
    for mode, fn in (
        ("pipelined", lambda: exp._predict(tr, "train")),
        ("synchronous", synchronous_predict),
    ):
        t0 = time.perf_counter()
        hist = fn()
        wall = time.perf_counter() - t0
        results[mode] = {
            "wall_s": round(wall, 2),
            "samples_per_sec": round(n_samples / wall, 2),
            "wer": round(
                float(hist.get_average().metrics["word_error_rate"]), 4
            ),
        }
    results["speedup"] = round(
        results["synchronous"]["wall_s"] / results["pipelined"]["wall_s"], 2
    )
    results["n_samples"] = n_samples
    print(json.dumps({"metric": "predict_on_train_pipeline", **results}))


if __name__ == "__main__":
    main()
