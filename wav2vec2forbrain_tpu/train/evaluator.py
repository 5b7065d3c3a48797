"""Evaluators: greedy decode + WER/CER tracking, optional LM decode hook.

Mirrors the reference evaluator stack (ref: src/train/evaluator.py:20-242)
with the same metric names — word_error_rate, char_error_rate,
word_error_rate_lm_decode, char_error_rate_lm_decode — because the sweep
YAMLs and analysis notebooks key on them.

TPU-first deviation: evaluators consume already-argmaxed token ids (the
argmax runs on device inside the jitted step; only (B, T') int32 ids cross
device->host instead of full logit tensors). Full log-probs are transferred
only for the test-time LM decode path, matching where the reference pays its
D2H cost (ref: evaluator.py:189-210).
"""

from abc import ABC, abstractmethod
from math import isnan, nan
from typing import Callable, List, Literal, Optional

import numpy as np

from wav2vec2forbrain_tpu.train.history import (
    DecodedPredictionBatch,
    MetricEntry,
    SingleEpochHistory,
)
from wav2vec2forbrain_tpu.train.metrics import char_error_rate, word_error_rate


def cut_after_eos_token(string: str, eos_token: str = "</s>") -> str:
    """Truncate after the first EOS (ref: evaluator.py:70-79)."""
    idx = string.find(eos_token)
    if idx != -1:
        return string[: idx + len(eos_token)]
    return string


class Evaluator(ABC):
    """Running/latest loss tracking (ref: evaluator.py:20-54)."""

    def __init__(
        self,
        mode: Literal["train", "val", "test"],
        track_non_test_predictions: bool = False,
    ):
        self.mode = mode
        self.track_non_test_predictions = track_non_test_predictions
        self._latest_loss = nan
        self._running_loss = 0.0
        self._running_count = 0

    def track_batch(self, predictions, batch):
        self._latest_loss = float(predictions["loss"])
        self._running_loss += self._latest_loss
        self._running_count += 1
        self._track_batch(predictions, batch)

    def get_latest_loss(self) -> float:
        return self._latest_loss

    def get_running_loss(self) -> float:
        if self._running_count == 0:
            return nan
        return self._running_loss / self._running_count

    @abstractmethod
    def _track_batch(self, predictions, batch):
        ...

    @abstractmethod
    def evaluate(self) -> SingleEpochHistory:
        ...

    def clean_up(self):
        pass


class DefaultEvaluator(Evaluator):
    """Greedy decode + WER (ref: evaluator.py:57-120).

    `predictions` dict keys: loss (float), pred_ids (B, T') int32 argmax ids,
    metrics (dict, optional).
    """

    def __init__(
        self,
        tokenizer,
        mode: Literal["train", "val", "test"],
        track_non_test_predictions: bool = False,
        crop_lens: bool = False,
    ):
        super().__init__(mode, track_non_test_predictions)
        self.tokenizer = tokenizer
        self.crop_lens = crop_lens
        self.history = SingleEpochHistory()

    def decode_predictions(self, predictions, batch):
        pred_ids = np.asarray(predictions["pred_ids"])
        # Reproduce the reference's EFFECTIVE greedy-decode width. The
        # reference pads each batch only to its own max length, so
        # tokenizer.batch_decode sees frames up to max(logit_lens) — per-
        # sample frames between a sample's length and the batch max ARE
        # decoded there (ref: evaluator.py:57-120 decodes the full padded
        # tensor). Our --pad_to_multiple buckets pad FURTHER, to a shape the
        # reference never materializes; decoding that bucket tail would leak
        # the TPU shape strategy into the WER metric (trained models emit
        # argmax garbage on all-pad frames, measured +0.2 WER at loss ~0).
        # Truncating at the batch max restores the reference's width exactly.
        if "logit_lens" in predictions:
            lens = np.asarray(predictions["logit_lens"])
            if lens.size:
                pred_ids = pred_ids[:, : max(1, int(lens.max()))]
                if self.crop_lens:
                    # --greedy_decode_crop_lens: ALSO blank each sample's
                    # frames past its own length. NOT reference behaviour
                    # (the reference decodes every sample at the batch-max
                    # width, so its greedy WER absorbs argmax garbage from
                    # shorter samples' pad frames); opt-in for an honest
                    # per-sample greedy metric. Pad id 0 is dropped by
                    # group_tokens decoding.
                    pred_ids = np.where(
                        np.arange(pred_ids.shape[1])[None, :] < lens[:, None],
                        pred_ids,
                        0,
                    )
        predicted_strings = self.tokenizer.batch_decode(
            pred_ids, group_tokens=True
        )
        label_strings = (
            self.tokenizer.batch_decode(np.asarray(batch.target), group_tokens=False)
            if batch.target is not None
            else None
        )
        return predicted_strings, label_strings

    def _track_batch(self, predictions, batch):
        predicted_strings, label_strings = self.decode_predictions(predictions, batch)
        predicted_strings = [cut_after_eos_token(s) for s in predicted_strings]

        metrics = dict(predictions.get("metrics") or {})
        if label_strings is not None:
            metrics["word_error_rate"] = word_error_rate(
                predicted_strings, label_strings
            )
        self.history.add_batch_metric(
            MetricEntry(metrics, float(predictions["loss"])),
            (
                DecodedPredictionBatch(predicted_strings, label_strings)
                if self.mode == "test" or self.track_non_test_predictions
                else None
            ),
        )

    def evaluate(self) -> SingleEpochHistory:
        return self.history


class EvaluatorWithLMDecoder(DefaultEvaluator):
    """Adds CER always and beam-search+LM decode on the test split
    (ref: evaluator.py:127-242).

    `lm_decoder`: callable(log_probs (B, T', V) np.float32, logit_lens) ->
    list[str]; runs host-side (native beam search / n-gram LM). Only invoked
    when mode == "test" and lm_decode_test_predictions is set, matching the
    reference's cost placement.

    Decodes are submitted to a bounded worker pool and resolved in
    evaluate(): on multi-core hosts, batch b's beam search runs while
    batch b+1 is being fetched and greedy-decoded, instead of serializing
    one 2-3 s decode per batch on the tracking thread (the reference
    serializes this, ref evaluator.py:189-210; the native decoder releases
    the GIL, so the pool gives real CPU parallelism). Metrics and stored
    predictions are identical — they are patched into the same history
    entries before aggregation.
    """

    def __init__(
        self,
        tokenizer,
        mode: Literal["train", "val", "test"],
        lm_decoder: Optional[Callable] = None,
        track_non_test_predictions: bool = False,
        lm_decode_test_predictions: bool = False,
        crop_lens: bool = False,
        lm_decode_workers: int = 0,
    ):
        super().__init__(tokenizer, mode, track_non_test_predictions, crop_lens)
        self.lm_decoder = (
            lm_decoder if (lm_decode_test_predictions and mode == "test") else None
        )
        self.lm_decoded_batches: List[List[str]] = []
        self._lm_workers = lm_decode_workers
        self._lm_pool = None
        # (future, MetricEntry, stored-dict-or-None, label_strings)
        self._lm_pending: List[tuple] = []

    def _submit_lm_decode(self, logits, logit_lens):
        if self._lm_pool is None:
            import os
            from concurrent.futures import ThreadPoolExecutor

            w = self._lm_workers or min(4, os.cpu_count() or 1)
            self._lm_pool = ThreadPoolExecutor(
                max_workers=w, thread_name_prefix="lm-decode"
            )
        # backpressure: bound held logits to ~2 batches per worker
        while len(self._lm_pending) >= 2 * self._lm_pool._max_workers:
            self._resolve_lm(self._lm_pending.pop(0))
        return self._lm_pool.submit(
            self.lm_decoder, np.asarray(logits), np.asarray(logit_lens)
        )

    def _resolve_lm(self, pending):
        fut, entry, stored, label_strings = pending
        lm_decoded = fut.result()
        lm_metrics = {
            "word_error_rate_lm_decode": word_error_rate(
                lm_decoded, label_strings
            ),
            "char_error_rate_lm_decode": char_error_rate(
                lm_decoded, label_strings
            ),
        }
        entry.metrics.update(lm_metrics)
        # the history's running total accumulated this entry at add time,
        # BEFORE the decode finished — fold the late metrics in with the
        # same +=/assign semantics MetricEntry.__iadd__ uses
        total = self.history._total.metrics
        for k, v in lm_metrics.items():
            if k in total and total[k] is not None:
                total[k] += v
            else:
                total[k] = v
        if stored is not None:
            # the reference's EnhancedDecodedBatch.predictions_lm_decoded
            # (evaluator.py:210) — serialized into the predictions JSON
            stored["predictions_lm_decoded"] = lm_decoded
        self.lm_decoded_batches.append(lm_decoded)

    def _track_batch(self, predictions, batch):
        predicted_strings, label_strings = self.decode_predictions(predictions, batch)
        predicted_strings = [cut_after_eos_token(s) for s in predicted_strings]

        metrics = dict(predictions.get("metrics") or {})
        decoded = DecodedPredictionBatch(predicted_strings, label_strings)
        lm_future = None

        if label_strings is not None:
            metrics["word_error_rate"] = word_error_rate(
                predicted_strings, label_strings
            )
            if self.lm_decoder is not None and self.mode == "test":
                assert "logits" in predictions, (
                    "LM decode requires logits in the predictions dict"
                )
                lm_future = self._submit_lm_decode(
                    predictions["logits"], predictions["logit_lens"]
                )
            cer = char_error_rate(predicted_strings, label_strings)
            if not isnan(cer):
                metrics["char_error_rate"] = cer

        stored = None
        if self.mode == "test" or self.track_non_test_predictions:
            stored = decoded._asdict()
        entry = MetricEntry(metrics, float(predictions["loss"]))
        self.history.add_batch_metric(entry, stored)
        if lm_future is not None:
            self._lm_pending.append((lm_future, entry, stored, label_strings))

    def evaluate(self) -> SingleEpochHistory:
        # drain outstanding decodes IN ORDER before aggregation: the lm
        # metrics land in the exact entries their batches created
        for pending in self._lm_pending:
            self._resolve_lm(pending)
        self._lm_pending = []
        return self.history

    def clean_up(self):
        if self._lm_pool is not None:
            self._lm_pool.shutdown(wait=False)
            self._lm_pool = None
        super().clean_up()


class B2PEvaluator(Evaluator):
    """Phoneme-error-rate evaluator (ref: evaluator.py:245-313).

    Consumes argmax ids over the phoneme vocab (blank=0); PER = total
    phoneme-level edit distance / total reference phonemes, aggregated over
    the whole batch like the reference.
    """

    def __init__(
        self,
        mode: Literal["train", "val", "test"],
        track_non_test_predictions: bool = False,
    ):
        super().__init__(mode, track_non_test_predictions)
        self.history = SingleEpochHistory()

    def _track_batch(self, predictions, batch):
        from wav2vec2forbrain_tpu.train.metrics import levenshtein
        from wav2vec2forbrain_tpu.util.phoneme_helper import PHONE_DEF_SIL

        pred_ids = np.asarray(predictions["pred_ids"])
        total_dist = 0
        total_len = 0
        labels = []
        predicted = []
        for i in range(pred_ids.shape[0]):
            if batch.target is None:
                continue
            # collapse repeats then drop blanks (greedy CTC decode)
            seq = pred_ids[i]
            collapsed = [
                int(x) for j, x in enumerate(seq) if j == 0 or x != seq[j - 1]
            ]
            decoded = [x for x in collapsed if x != 0]
            u = int(batch.target_lens[i]) if batch.target_lens is not None else None
            true_seq = [int(x) for x in np.asarray(batch.target[i])[:u] if x > 0]
            labels.append([PHONE_DEF_SIL[x - 1] for x in true_seq])
            predicted.append([PHONE_DEF_SIL[x - 1] for x in decoded])
            total_dist += levenshtein(true_seq, decoded)
            total_len += len(true_seq)

        per = total_dist / total_len if total_len else nan
        metrics = dict(predictions.get("metrics") or {})
        metrics["phoneme_error_rate"] = per
        self.history.add_batch_metric(
            MetricEntry(metrics, float(predictions["loss"])),
            (
                DecodedPredictionBatch(
                    [" ".join(p) for p in predicted],
                    [" ".join(l) for l in labels],
                )
                if self.mode == "test" or self.track_non_test_predictions
                else None
            ),
        )

    def evaluate(self) -> SingleEpochHistory:
        return self.history
