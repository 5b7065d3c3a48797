"""Test-epoch wall with LM decode: pooled (async worker pool) vs serialized.

The reference serializes one 2-3 s beam-search decode per batch on the
tracking thread (ref: src/train/evaluator.py:189-210) while the accelerator
idles. EvaluatorWithLMDecoder instead submits decodes to a bounded worker
pool (train/evaluator.py::_submit_lm_decode) so batch b decodes while batch
b+1 runs its eval step; evaluate() drains in order, so metrics/predictions
are identical either way.

This tool measures the same test epoch twice on the REAL Trainer +
experiment machinery (synthetic T12 data, random-init encoder, crude but
valid word-3gram ARPA estimated from the train split):

  serialized  — each decode resolved inline on the tracking thread
                (the reference's cost placement)
  pooled      — the shipped worker-pool path

and prints one JSON line with both walls, the
verdict round-4 item-7 artifact. Run on the TPU (any accelerator works;
CPU also runs, just slower eval steps).

  python tools/lm_overlap_bench.py --batch-size 64 --beam-width 100
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--beam-width", type=int, default=100)
    args = ap.parse_args()

    from wav2vec2forbrain_tpu.util.tpu_setup import configure_jax

    configure_jax()
    import jax

    import bench
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_workflow_demo import build_arpa_from_sentences
    from wav2vec2forbrain_tpu.train import evaluator as evaluator_mod
    from wav2vec2forbrain_tpu.train.train_loop import Trainer

    on_accel = jax.devices()[0].platform in ("tpu", "gpu")
    tmp = tempfile.mkdtemp(prefix="lm_overlap_")
    exp, _steps, _warmup = bench._make_experiment(
        tmp,
        on_accel,
        "w2v_base" if on_accel else "conformer",
        scan_layers=False if on_accel else "auto",
        batch_size=args.batch_size,
        lm_decode_test_predictions=True,
        lm_decode_beam_width=args.beam_width,
    )
    # crude word-3gram over the train transcriptions (same recipe as the
    # workflow demo) so the native decoder has a real Katz-backoff table
    sentences = [s.target for s in exp.dataloader_train.dataset.samples]
    arpa = os.path.join(tmp, "3gram.arpa")
    build_arpa_from_sentences(sentences, arpa)
    exp.yaml_config = exp.yaml_config.model_copy(
        update={"n3gram_lm_model_path": arpa}
    )

    tr = Trainer(exp)
    results = {}
    for mode in ("warmup", "pooled", "serialized"):
        if mode == "serialized":
            # resolve each decode inline on the tracking thread — the
            # reference's serialization, with identical decode work
            orig_submit = evaluator_mod.EvaluatorWithLMDecoder._submit_lm_decode

            def serial_submit(self, logits, logit_lens):
                fut = orig_submit(self, logits, logit_lens)
                fut.result()  # block: decode completes before tracking returns
                return fut

            evaluator_mod.EvaluatorWithLMDecoder._submit_lm_decode = serial_submit
        t0 = time.perf_counter()
        hist = tr._evaluate_epoch("test")
        wall = time.perf_counter() - t0
        if mode == "serialized":
            evaluator_mod.EvaluatorWithLMDecoder._submit_lm_decode = orig_submit
        avg = hist.get_average()
        results[mode] = {
            "wall_s": round(wall, 2),
            "wer_lm_decode": round(
                float(avg.metrics.get("word_error_rate_lm_decode", -1)), 4
            ),
        }
    del results["warmup"]  # first pass holds the eval-program compile
    results["speedup"] = round(
        results["serialized"]["wall_s"] / results["pooled"]["wall_s"], 2
    )
    results["batches"] = len(tr.dataloader_test)
    results["batch_size"] = args.batch_size
    results["beam_width"] = args.beam_width
    print(json.dumps({"metric": "lm_decode_test_epoch_overlap", **results}))


if __name__ == "__main__":
    main()
