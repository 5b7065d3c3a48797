"""Trainer: epoch loop with reference-parity semantics on a jitted TPU step.

Reproduces the reference training contract (ref: src/train/train_loop.py):
- epoch loop with per-EPOCH scheduler stepping (:158) — LRs are host scalars
  computed from the schedules and fed into the compiled step
- best-model-by-val-metric checkpointing to
  cache_dir/model_checkpoints/<uuid>/best_model.msgpack (:135-151,168-179)
- early stopping: stop when index 0 of the last-N val metrics (with delta
  slack on entry 0) is still the best (:181-203)
- reload best + delete temp files (:205-209), optional train_on_val_once
  (:211-213), final test eval (:215-219)
- wandb metric naming: {split}_{loss_function}_loss + per-metric prefixes
  (:111-127)

TPU-first differences:
- model/optimizer state live on device between steps (donated buffers);
  the host only sees the per-batch loss scalar + argmax ids for the evaluator
- batches are device_put with a data-parallel NamedSharding when a mesh is
  configured; ragged last batches are padded up to the data axis with
  masked-out rows (exact loss, exact metrics)
"""

import json
import os
import time
import uuid
from typing import Literal, Optional

import jax
import numpy as np


def jnp_asarray_rng(a):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(a, dtype=np.uint32))

from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.parallel.distributed import (
    barrier,
    host_fetchable,
    is_coordinator,
)
from wav2vec2forbrain_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from wav2vec2forbrain_tpu.train.history import (
    EpochLosses,
    SingleEpochHistory,
    TrainHistory,
)
from wav2vec2forbrain_tpu.train.steps import merge_params


class _HostPrefetcher:
    """Collate + pad + device_put batches one step ahead on a worker thread.

    The H2D transfer of a (B, T, 256) f32 batch is the largest host-side
    per-step cost (≈13 MB at the headline shape — an RTT-bound synchronous
    copy on remote-attached TPUs). Staging the NEXT batch's transfer while
    the device runs the CURRENT step takes it off the critical path. Depth 2
    bounds device-memory overhead to one extra batch."""

    _DONE = object()

    def __init__(self, loader, put_fn):
        import queue
        import threading

        self._q = queue.Queue(maxsize=2)
        self._err = None
        self._stop = False

        def _put_item(item):
            # bounded put that re-checks the stop flag: an early consumer
            # exit (step error, Ctrl-C) must not leave this thread blocked
            # forever holding device batches
            while not self._stop:
                try:
                    self._q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for host_batch in loader:
                    if self._stop or not _put_item(
                        (put_fn(host_batch), host_batch)
                    ):
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                _put_item(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        """Unblock and drain the worker (idempotent)."""
        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5.0)

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is self._DONE:
                    if self._err is not None:
                        raise self._err
                    return
                (batch, true_b), host_batch = item
                yield batch, true_b, host_batch
        finally:
            self.close()


def _batch_stream(loader, put_fn, prefetch: bool):
    """Either the threaded prefetcher or a plain inline loop."""
    if prefetch:
        return _HostPrefetcher(loader, put_fn)

    def inline():
        for host_batch in loader:
            batch, true_b = put_fn(host_batch)
            yield batch, true_b, host_batch

    return inline()


def _copy_to_host_async(*arrays):
    """Kick off D2H transfers without blocking. The lag-1 pipeline fetches
    these values one step later; starting the copy at dispatch time hides the
    transfer latency (an RTT per fetch on remote-attached TPU topologies)
    behind the next step's device compute."""
    for a in arrays:
        copy = getattr(a, "copy_to_host_async", None)
        if copy is not None:
            copy()


def _pad_batch(batch: B2tBatch, multiple: int) -> B2tBatch:
    """Pad batch rows up to `multiple` with masked duplicates of row -1."""
    b = batch.input.shape[0]
    rem = b % multiple
    if rem == 0:
        return batch
    pad = multiple - rem

    def rep(a):
        if a is None:
            return None
        return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)

    mask = np.concatenate(
        [
            batch.sample_mask
            if batch.sample_mask is not None
            else np.ones((b,), np.float32),
            np.zeros((pad,), np.float32),
        ]
    )
    return B2tBatch(
        input=rep(batch.input),
        target=rep(batch.target),
        day_idxs=rep(batch.day_idxs),
        input_lens=rep(batch.input_lens),
        target_lens=rep(batch.target_lens),
        sample_mask=mask,
    )


def _chunk_work_plan(rows, k: int, cache, grouped: bool):
    """Group an epoch's index batches into (i0, K rows, width, n_real)
    chunks for the multi-step scan programs.

    Each chunk holds CONSECUTIVE batches sharing one length-bucket width
    (the scan is compiled per (K, width)); a run's ragged tail is padded
    with duplicates of its last row — the scan skips those slots via their
    valid=False flag, so padding costs ~nothing. With `grouped`, batches
    are first stably reordered by width so each width forms ONE run
    (minimum dispatches on bucketed data, where shuffled widths otherwise
    interleave into short runs); batch composition and per-batch numerics
    are unchanged, only the within-epoch step order moves — see
    --length_bucket_order."""
    widths = [cache.width_for(r[3]) for r in rows]
    order = list(range(len(rows)))
    if grouped:
        order.sort(key=lambda i: widths[i])  # stable: preserves order per width
    work = []
    i0 = 0
    while i0 < len(order):
        j = i0
        while j < len(order) and widths[order[j]] == widths[order[i0]]:
            j += 1
        run = [rows[order[t]] for t in range(i0, j)]
        for c in range(0, len(run), k):
            sub = list(run[c : c + k])
            n_real = len(sub)
            while len(sub) < k:
                sub.append(sub[-1])
            work.append((i0 + c, sub, widths[order[i0]], n_real))
        i0 = j
    return _split_last_chunk(work)


def _split_last_chunk(work, min_split=8, tail_frac=0.2):
    """Split the epoch's FINAL chunk so a small tail dispatch hides the big
    chunk's host-side cost.

    Chunks are processed lag-1: chunk m's stacked outputs are fetched and
    decoded while chunk m+1 computes on device. The final chunk has no
    successor, so its whole fetch RTT + host decode (up to K batches of
    tokenizer decode + WER) is exposed epoch wall — the dominant e2e-vs-
    isolated gap in short-step regimes (w2v-base: 55 ms steps, one 30-batch
    chunk per epoch). Re-dispatching its last ~20% of batches as a second
    chunk of the SAME padded (K, width) program (extra slots carry
    valid=False and are lax.cond-skipped on device) costs no new compile
    and ~no device time, but the head chunk's decode now hides under the
    tail's device compute and only the tail's few batches stay exposed.
    Batch composition, order, and numerics are unchanged."""
    if not work:
        return work
    i0, chunk, width, n_real = work[-1]
    if n_real < min_split:
        return work
    k = len(chunk)
    tail = max(2, int(round(n_real * tail_frac)))
    real = list(chunk[:n_real])

    def pad(sub):
        sub = list(sub)
        while len(sub) < k:
            sub.append(sub[-1])
        return sub

    n_head = n_real - tail
    return work[:-1] + [
        (i0, pad(real[:n_head]), width, n_head),
        (i0 + n_head, pad(real[n_head:]), width, tail),
    ]


class Trainer:
    def __init__(self, experiment):
        self.experiment = experiment
        self.config = experiment.base_config
        self.yaml_config = experiment.yaml_config
        self.logger = experiment.logger

        self.train_step = experiment.train_step
        self.eval_step = experiment.eval_step
        self.lr_schedules = experiment.lr_schedules
        self.mesh = experiment.mesh
        self.data_axis = experiment.mesh.shape["data"] if experiment.mesh else 1
        self.batch_sharding = experiment.batch_sharding_fn

        # device state
        self.trainable = experiment.trainable
        self.frozen = experiment.frozen
        self.opt_state = experiment.opt_state
        self.model_state = experiment.model_state
        self.rng = experiment.step_rng

        self.dataloader_train = experiment.dataloader_train
        self.dataloader_val = experiment.dataloader_val
        self.dataloader_test = experiment.dataloader_test

        # device-resident dataset caches (train/device_cache.py): when a
        # loader's split is cached, epochs gather batches on device instead
        # of streaming H2D copies
        caches = (
            experiment.get_device_caches()
            if hasattr(experiment, "get_device_caches")
            else {}
        )
        self._cache_by_loader = {
            id(loader): caches[split]
            for split, loader in (
                ("train", self.dataloader_train),
                ("val", self.dataloader_val),
                ("test", self.dataloader_test),
            )
            if split in caches and loader is not None
        }

        from wav2vec2forbrain_tpu.util.profiling import StepTimer

        # K-step scan chunks (train/steps.py::build_multi_step): active for
        # a split when its device cache is resident and K >= 2
        self._multi_step_k = (
            experiment.resolve_multi_step_chunk()
            if hasattr(experiment, "resolve_multi_step_chunk")
            else 0
        )

        self.samples_seen = 0
        self.train_step_time = 0.0
        self.step_timer = StepTimer()
        self.n_chips = (
            self.mesh.devices.size if self.mesh is not None else 1
        )
        # multi-process (multi-host) runs: evaluator payloads must be
        # resharded to replicated before the host can read them, and file
        # writes happen on the coordinator only
        self._n_proc = jax.process_count()

    def _host_payload(self, *arrays):
        """Reshard step outputs so np.asarray works on every process
        (no-op single-process — the common case, incl. the single-chip
        tunnel and the CPU test mesh)."""
        if self._n_proc == 1:
            return arrays
        return host_fetchable(self.mesh, *arrays)

    def _host_tree(self, tree):
        """device_get that first replicates non-addressable leaves (ZeRO-1
        data-scattered opt state, cross-host tp params): device_get on an
        array spanning other processes raises. Must be called by EVERY
        process (the reshard is a collective); file writes downstream are
        coordinator-guarded separately."""
        leaves, td = jax.tree_util.tree_flatten(tree)
        if self._n_proc > 1:
            leaves = list(host_fetchable(self.mesh, *leaves))
        return jax.device_get(jax.tree_util.tree_unflatten(td, leaves))

    # --- helpers ------------------------------------------------------------

    def _put(self, batch: B2tBatch) -> tuple:
        """(padded device batch, true row count).

        Rows are padded up to the full configured batch size (rounded to the
        data-axis), so ragged last batches never trigger a recompile; padded
        rows are masked out of loss and metrics (exact reference numerics)."""
        true_b = batch.input.shape[0]
        target = max(self.config.batch_size, true_b)
        full = ((target + self.data_axis - 1) // self.data_axis) * self.data_axis
        batch = _pad_batch(batch, full)
        wire = getattr(self.config, "h2d_dtype", "float32")
        if wire != "float32":
            # halve the neural-feature transfer; forward() upcasts to f32
            import ml_dtypes

            dt = np.float16 if wire == "float16" else ml_dtypes.bfloat16
            batch = batch._replace(input=batch.input.astype(dt))
        if self.batch_sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self.batch_sharding), batch
            )
        return batch, true_b

    def _stream_for(self, loader):
        """Device-cached gather stream when the loader's split is resident,
        else the collate/H2D stream (optionally prefetched)."""
        cache = self._cache_by_loader.get(id(loader))
        if cache is not None:
            return cache.stream(
                loader, self.config.batch_size, self.data_axis
            )
        return _batch_stream(
            loader, self._put, getattr(self.config, "host_prefetch", True)
        )

    def _bucket_order_grouped(self) -> bool:
        """Whether TRAIN epochs may reorder batches width-grouped (see
        --length_bucket_order). Eval epochs always group — their results
        are order-invariant."""
        return (
            getattr(self.config, "length_bucket_order", "preserve")
            == "grouped"
        )

    def _log_intermediate(self, i: int, n: int, evaluator):
        print(
            f"Batch {i + 1}/{n} loss: {evaluator.get_latest_loss():.2f} "
            f"running: {evaluator.get_running_loss():.2f}\r",
            end="",
        )

    def _train_epoch(self, data_loader, epoch: int) -> SingleEpochHistory:
        """Lag-1 pipelined epoch: step i+1 is enqueued on the device before
        step i's (tiny) outputs are fetched and decoded on the host, so the
        per-batch D2H + WER decode — the reference's biggest per-step hazard
        (SURVEY.md §3.2) — overlaps device compute instead of serializing.

        When the split's dataset is device-cache-resident and
        --multi_step_chunk resolves to K >= 2, the epoch instead dispatches
        K-step lax.scan chunks (one dispatch + one stacked fetch per K
        optimizer steps): on remote-attached TPUs every dispatch and every
        fetch is an RTT (~70-85 ms measured through the axon tunnel,
        tools/profile_e2e.py), so per-step host interaction caps throughput
        regardless of pipelining — amortizing it K ways is the fix."""
        cache = self._cache_by_loader.get(id(data_loader))
        if self._multi_step_k >= 2 and cache is not None:
            return self._train_epoch_chunked(
                data_loader, epoch, cache, self._multi_step_k
            )
        evaluator = self.experiment.create_evaluator("train")
        brain_lr = float(self.lr_schedules.brain(epoch))
        w2v_lr = float(self.lr_schedules.w2v(epoch))
        n = len(data_loader)
        pending = None  # (out, host_batch, true_b, index)
        epoch_samples = 0
        t_epoch = time.perf_counter()

        def process(out, host_batch, true_b, i):
            loss = float(out.loss)
            pred_ids = np.asarray(out.pred_ids)[:true_b]
            preds = {
                "loss": loss,
                "pred_ids": pred_ids,
                # (B,) ints: lets the evaluator truncate the decode at the
                # batch-max length (the width the reference pads to)
                "logit_lens": np.asarray(out.logit_lens)[:true_b],
            }
            if out.metrics:
                # aux-head scalars (ctc/intermediate/combined loss)
                preds["metrics"] = {
                    k: float(v) for k, v in out.metrics.items()
                }
            evaluator.track_batch(preds, host_batch)
            if i % self.config.log_every_n_batches == (
                self.config.log_every_n_batches - 1
            ):
                self._log_intermediate(i, n, evaluator)

        stream = self._stream_for(data_loader)
        for i, (batch, true_b, host_batch) in enumerate(stream):
            out = self.train_step(
                self.trainable,
                self.frozen,
                self.opt_state,
                self.model_state,
                batch,
                self.rng,
                brain_lr,
                w2v_lr,
            )
            self.trainable = out.params
            self.opt_state = out.opt_state
            self.model_state = out.model_state
            self.rng = out.rng
            self.samples_seen += true_b
            epoch_samples += true_b
            if self._n_proc > 1:
                p_, l_ = self._host_payload(out.pred_ids, out.logit_lens)
                out = out._replace(pred_ids=p_, logit_lens=l_)
            # start the D2H of this step's tiny outputs now, so the lag-1
            # fetch below never pays transfer latency serially (it matters
            # a lot on remote-attached TPUs where each fetch is an RTT).
            # EVERY host-read output must be listed: a plain np.asarray on a
            # not-yet-copied array acts as a device fence through the tunnel
            # (r3 shipped logit_lens unlisted — measured 127 ms/step,
            # tools/profile_e2e.py)
            _copy_to_host_async(
                out.loss,
                out.pred_ids,
                out.logit_lens,
                *jax.tree_util.tree_leaves(out.metrics),
            )
            if pending is not None:
                process(*pending)
            pending = (out, host_batch, true_b, i)
        if pending is not None:
            process(*pending)
        dt_epoch = time.perf_counter() - t_epoch
        self.train_step_time += dt_epoch
        if epoch_samples:
            self.step_timer.add(dt_epoch, epoch_samples, steps=n)
        results = evaluator.evaluate()
        evaluator.clean_up()
        return results

    def _train_epoch_chunked(
        self, data_loader, epoch: int, cache, k: int
    ) -> SingleEpochHistory:
        """K-step-per-dispatch epoch over the device-resident dataset.

        The epoch's index batches (same loader RNG stream as the streaming
        path — batch composition is IDENTICAL) are grouped into (K, B) index/
        mask matrices; each chunk is one jitted lax.scan dispatch that
        gathers every batch on device and returns the K steps' evaluator
        payloads stacked. Lag-1 pipelining applies at chunk granularity: the
        host decodes chunk c's K batches while chunk c+1 runs. Ragged tails
        ride the same program as padded valid=False slots (lax.cond-skipped
        on device) — see _chunk_work_plan."""
        from wav2vec2forbrain_tpu.train.device_cache import padded_index_row

        evaluator = self.experiment.create_evaluator("train")
        brain_lr = float(self.lr_schedules.brain(epoch))
        w2v_lr = float(self.lr_schedules.w2v(epoch))
        multi_step = self.experiment.get_multi_step()
        n = len(data_loader)
        epoch_samples = 0
        t_epoch = time.perf_counter()

        rows = [
            padded_index_row(idxs, self.config.batch_size, self.data_axis)
            + (idxs,)
            for idxs in data_loader.iter_index_batches()
        ]

        def track(loss, pred_ids, logit_lens, metrics, idxs, true_b, i):
            preds = {
                "loss": float(loss),
                "pred_ids": np.asarray(pred_ids)[:true_b],
                "logit_lens": np.asarray(logit_lens)[:true_b],
            }
            if metrics:
                preds["metrics"] = {k_: float(v) for k_, v in metrics.items()}
            evaluator.track_batch(preds, cache.host_batch(idxs))
            if i % self.config.log_every_n_batches == (
                self.config.log_every_n_batches - 1
            ):
                self._log_intermediate(i, n, evaluator)

        # W2VB_CHUNK_TIMING=1: per-phase wall attribution of this loop,
        # printed per epoch (dispatch = multi_step host-side call, fetch =
        # blocking np.asarray of the lag-1 chunk's stacked outputs, track =
        # tokenizer decode + WER on the host). Diagnostic for the short-step
        # regime where per-chunk host costs stop hiding behind device time.
        timing = (
            {"dispatch": 0.0, "fetch": 0.0, "track": 0.0, "n_chunks": 0}
            if os.environ.get("W2VB_CHUNK_TIMING")
            else None
        )

        pending = None  # (MultiStepOut, chunk rows, first batch index, n_real)
        # Work plan: chunks of up to K CONSECUTIVE batches sharing one bucket
        # width (the scan needs a static shape, and using the run's own width
        # — never a chunk max — keeps chunked numerics identical to per-batch
        # steps at any bucket config, including the padding-consuming biGRU).
        # Run tails shorter than K are padded with duplicate rows carrying
        # valid=False: the scan lax.cond-skips them (params/opt/RNG untouched,
        # ~no compute), so EVERY batch rides a chunk program and the host
        # pays ceil(run/K) dispatches per run instead of one per tail batch.
        work = _chunk_work_plan(rows, k, cache, self._bucket_order_grouped())

        def process_chunk(mo, chunk, i0, n_real):
            t0 = time.perf_counter() if timing is not None else 0.0
            loss = np.asarray(mo.loss)
            pred_ids = np.asarray(mo.pred_ids)
            logit_lens = np.asarray(mo.logit_lens)
            metrics = {k_: np.asarray(v) for k_, v in mo.metrics.items()}
            if timing is not None:
                timing["fetch"] += time.perf_counter() - t0
                t0 = time.perf_counter()
            for j, (_idx, _mask, true_b, idxs) in enumerate(chunk[:n_real]):
                track(
                    loss[j],
                    pred_ids[j],
                    logit_lens[j],
                    {k_: v[j] for k_, v in metrics.items()},
                    idxs,
                    true_b,
                    i0 + j,
                )
            if timing is not None:
                timing["track"] += time.perf_counter() - t0

        # lag-1 pipeline over the chunks: chunk m's host decode overlaps
        # chunk m+1's device compute
        for i0, chunk, width, n_real in work:
            idx_mat = np.stack([r[0] for r in chunk])
            mask_mat = np.stack([r[1] for r in chunk])
            valid = np.arange(len(chunk)) < n_real
            t_disp = time.perf_counter() if timing is not None else 0.0
            mo = multi_step(
                self.trainable,
                self.frozen,
                self.opt_state,
                self.model_state,
                cache._dev,
                idx_mat,
                mask_mat,
                valid,
                self.rng,
                brain_lr,
                w2v_lr,
                width,
            )
            if timing is not None:
                timing["dispatch"] += time.perf_counter() - t_disp
                timing["n_chunks"] += 1
            self.trainable = mo.params
            self.opt_state = mo.opt_state
            self.model_state = mo.model_state
            self.rng = mo.rng
            n_new = sum(r[2] for r in chunk[:n_real])
            if self._n_proc > 1:
                p_, l_ = self._host_payload(mo.pred_ids, mo.logit_lens)
                mo = mo._replace(pred_ids=p_, logit_lens=l_)
            _copy_to_host_async(
                mo.loss,
                mo.pred_ids,
                mo.logit_lens,
                *jax.tree_util.tree_leaves(mo.metrics),
            )
            self.samples_seen += n_new
            epoch_samples += n_new
            if pending is not None:
                process_chunk(*pending)
            pending = (mo, chunk, i0, n_real)
        if pending is not None:
            process_chunk(*pending)

        dt_epoch = time.perf_counter() - t_epoch
        if timing is not None:
            timing = {
                k_: round(v, 4) if isinstance(v, float) else v
                for k_, v in timing.items()
            }
            print(
                f"chunk timing epoch {epoch}: {timing} "
                f"(epoch wall {dt_epoch:.3f}s, {n} steps)",
                flush=True,
            )
        self.train_step_time += dt_epoch
        if epoch_samples:
            self.step_timer.add(dt_epoch, epoch_samples, steps=n)
        results = evaluator.evaluate()
        evaluator.clean_up()
        return results

    def _evaluate_epoch(
        self, mode: Literal["val", "test"], with_logits: bool = False
    ) -> SingleEpochHistory:
        dataloader = (
            self.dataloader_val if mode == "val" else self.dataloader_test
        )
        evaluator = self.experiment.create_evaluator(mode)
        n = len(dataloader)
        need_logits = (
            with_logits or getattr(evaluator, "lm_decoder", None) is not None
        )
        cache = self._cache_by_loader.get(id(dataloader))
        if self._multi_step_k >= 2 and cache is not None and not need_logits:
            return self._evaluate_epoch_chunked(
                dataloader, evaluator, cache, self._multi_step_k
            )
        pending = None

        def process(outs, host_batch, true_b, i):
            loss, logits, logit_lens, pred_ids, metrics = outs
            preds = {
                "loss": float(loss),
                "pred_ids": np.asarray(pred_ids)[:true_b],
            }
            if metrics:
                preds["metrics"] = {k: float(v) for k, v in metrics.items()}
            preds["logit_lens"] = np.asarray(logit_lens)[:true_b]
            if need_logits:
                preds["logits"] = np.asarray(logits)[:true_b]
            evaluator.track_batch(preds, host_batch)
            if i % self.config.log_every_n_batches == (
                self.config.log_every_n_batches - 1
            ):
                self._log_intermediate(i, n, evaluator)

        # lag-1 pipeline: host decode (incl. LM beam search on test) overlaps
        # the next batch's device eval
        stream = self._stream_for(dataloader)
        for i, (batch, true_b, host_batch) in enumerate(stream):
            outs = self.eval_step(
                self.trainable, self.frozen, self.model_state, batch
            )
            loss_o, logits_o, lens_o, pred_o, metrics_o = outs
            if self._n_proc > 1:
                logits_o, lens_o, pred_o = self._host_payload(
                    logits_o, lens_o, pred_o
                )
                outs = (loss_o, logits_o, lens_o, pred_o, metrics_o)
            _copy_to_host_async(
                loss_o,
                lens_o,
                pred_o,
                *jax.tree_util.tree_leaves(metrics_o),
                *((logits_o,) if need_logits else ()),
            )
            if pending is not None:
                process(*pending)
            pending = (outs, host_batch, true_b, i)
        if pending is not None:
            process(*pending)
        results = evaluator.evaluate()
        evaluator.clean_up()
        return results

    def _evaluate_epoch_chunked(
        self, dataloader, evaluator, cache, k: int
    ) -> SingleEpochHistory:
        """K-batch-per-dispatch eval epoch (no logits fetched — epochs that
        need full logits, e.g. LM decode, stay on the single-step path).
        Tail slots are duplicate rows with valid=False, skipped on device;
        their outputs are never tracked on the host."""
        from wav2vec2forbrain_tpu.train.device_cache import padded_index_row

        multi_eval = self.experiment.get_multi_eval()
        n = len(dataloader)
        rows = [
            padded_index_row(idxs, self.config.batch_size, self.data_axis)
            + (idxs,)
            for idxs in dataloader.iter_index_batches()
        ]
        # eval results are order-invariant (averaged), so batches are always
        # width-GROUPED: one run per bucket width, ceil(run/K) dispatches;
        # tail slots carry valid=False and are lax.cond-skipped on device
        work = _chunk_work_plan(rows, k, cache, grouped=True)

        def track(loss, pred_ids, logit_lens, metrics, idxs, true_b, i):
            preds = {
                "loss": float(loss),
                "pred_ids": np.asarray(pred_ids)[:true_b],
                "logit_lens": np.asarray(logit_lens)[:true_b],
            }
            if metrics:
                preds["metrics"] = {k_: float(v) for k_, v in metrics.items()}
            evaluator.track_batch(preds, cache.host_batch(idxs))
            if i % self.config.log_every_n_batches == (
                self.config.log_every_n_batches - 1
            ):
                self._log_intermediate(i, n, evaluator)

        pending = None

        def process_chunk(ys, chunk, i0, n_real_sub):
            loss, logit_lens, pred_ids, metrics = ys
            loss = np.asarray(loss)
            logit_lens = np.asarray(logit_lens)
            pred_ids = np.asarray(pred_ids)
            metrics = {k_: np.asarray(v) for k_, v in metrics.items()}
            for j, (_idx, _mask, true_b, idxs) in enumerate(
                chunk[:n_real_sub]
            ):
                track(
                    loss[j],
                    pred_ids[j],
                    logit_lens[j],
                    {k_: v[j] for k_, v in metrics.items()},
                    idxs,
                    true_b,
                    i0 + j,
                )

        for i0, chunk, width, n_real_sub in work:
            idx_mat = np.stack([r[0] for r in chunk])
            mask_mat = np.stack([r[1] for r in chunk])
            valid = np.arange(len(chunk)) < n_real_sub
            ys = multi_eval(
                self.trainable,
                self.frozen,
                self.model_state,
                cache._dev,
                idx_mat,
                mask_mat,
                valid,
                width,
            )
            if self._n_proc > 1:
                l_, ll_, pp_ = self._host_payload(ys[0], ys[1], ys[2])
                ys = (l_, ll_, pp_, ys[3])
            _copy_to_host_async(*jax.tree_util.tree_leaves(ys))
            if pending is not None:
                process_chunk(*pending)
            pending = (ys, chunk, i0, n_real_sub)
        if pending is not None:
            process_chunk(*pending)
        results = evaluator.evaluate()
        evaluator.clean_up()
        return results

    def _precompile_bucket_programs(self):
        """Compile every (split, bucket width) chunk program BEFORE epoch 1
        (--precompile_buckets) by dispatching one all-invalid chunk per
        reachable width: every scan slot carries valid=False, so the body is
        lax.cond-skipped — params/opt state/RNG pass through bit-identical
        and ~no compute runs — but XLA compiles the full (K, width) program.

        Why: batch composition is random within a day (reference parity), so
        a batch's bucket is the max of batch_size draws — rare small-width
        batches appear stochastically in LATE epochs, each paying its full
        chunk-program compile (~17 s) inside that epoch (the hidden 8x
        per-epoch collapse in round 4's long-seq bench). The reference has
        no compile-time concern (eager torch); this is pure TPU UX.

        The train programs donate their state buffers, so the (identical)
        outputs are reassigned. Eval programs are precompiled only for
        splits that will actually take the chunked path (no LM decode)."""
        if self._multi_step_k < 2 or not self._cache_by_loader:
            return
        if not getattr(self.config, "precompile_buckets", True):
            return
        k = self._multi_step_k
        target = max(self.config.batch_size, 1)
        b_full = ((target + self.data_axis - 1) // self.data_axis) * self.data_axis
        idx_mat = np.zeros((k, b_full), np.int32)
        mask_mat = np.ones((k, b_full), np.float32)
        valid = np.zeros((k,), bool)
        brain_lr = float(self.lr_schedules.brain(0))
        w2v_lr = float(self.lr_schedules.w2v(0))
        t0 = time.perf_counter()
        compiled = []
        train_cache = self._cache_by_loader.get(id(self.dataloader_train))
        if train_cache is not None:
            multi_step = self.experiment.get_multi_step()
            for w in train_cache.reachable_widths():
                mo = multi_step(
                    self.trainable,
                    self.frozen,
                    self.opt_state,
                    self.model_state,
                    train_cache._dev,
                    idx_mat,
                    mask_mat,
                    valid,
                    self.rng,
                    brain_lr,
                    w2v_lr,
                    w,
                )
                self.trainable = mo.params
                self.opt_state = mo.opt_state
                self.model_state = mo.model_state
                self.rng = mo.rng
                compiled.append(f"train@{w}")
        lm_on = bool(getattr(self.config, "lm_decode_test_predictions", False))
        for mode, loader in (("val", self.dataloader_val),
                             ("test", self.dataloader_test)):
            cache = self._cache_by_loader.get(id(loader))
            if cache is None or (mode == "test" and lm_on):
                continue
            multi_eval = self.experiment.get_multi_eval()
            for w in cache.reachable_widths():
                multi_eval(
                    self.trainable,
                    self.frozen,
                    self.model_state,
                    cache._dev,
                    idx_mat,
                    mask_mat,
                    valid,
                    w,
                )
                compiled.append(f"{mode}@{w}")
        if compiled:
            print(
                f"precompile_buckets: {len(compiled)} chunk programs "
                f"({', '.join(compiled)}) in {time.perf_counter() - t0:.1f}s"
            )

    def _get_wandb_metrics(self, epoch_hist: SingleEpochHistory, prefix: str):
        avg = epoch_hist.get_average()
        metrics = {f"{prefix}_{self.config.loss_function}_loss": avg.loss}
        metrics.update({f"{prefix}_{k}": v for k, v in avg.metrics.items()})
        return metrics

    # --- periodic full-train-state checkpoints (failure recovery; TPU-native
    # addition, SURVEY.md §5: the reference loses a crashed run entirely) ----

    def _train_state_path(self) -> str:
        return os.path.join(
            self.experiment.results_dir, "train_state", "state.msgpack"
        )

    def _save_train_state(self, epoch: int, history: list):
        from flax import serialization

        path = self._train_state_path()
        # the gathers run on EVERY process (_host_tree replicates ZeRO-1's
        # data-scattered opt state before device_get — a collective); only
        # the coordinator then writes
        opt_leaves, _ = jax.tree_util.tree_flatten(
            self._host_tree(self.opt_state)
        )
        bundle = {
            "params": serialization.to_state_dict(
                merge_params(
                    self._host_tree(self.trainable),
                    self._host_tree(self.frozen),
                )
            ),
            "state": serialization.to_state_dict(
                self._host_tree(self.model_state)
            ),
            "opt_leaves": {str(i): np.asarray(l) for i, l in enumerate(opt_leaves)},
            "rng": np.asarray(jax.device_get(self.rng)),
            "epoch": epoch,
        }
        if not is_coordinator():
            barrier("train-state-save")
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(bundle))
        os.replace(tmp, path)
        hist_path = os.path.join(os.path.dirname(path), "history.json")
        with open(hist_path, "w") as f:
            json.dump(
                TrainHistory(history, SingleEpochHistory()).to_dict(), f
            )
        barrier("train-state-save")

    def restore_train_state(self, path: str):
        """Returns (next_epoch, history). Restores params, optimizer moments,
        batch-norm stats, and the RNG — exact continuation."""
        from flax import serialization

        from wav2vec2forbrain_tpu.train.steps import partition_params

        if os.path.isdir(path):
            path = os.path.join(path, "state.msgpack")
        with open(path, "rb") as f:
            bundle = serialization.msgpack_restore(f.read())
        template = merge_params(
            jax.device_get(self.trainable), jax.device_get(self.frozen)
        )
        params = serialization.from_state_dict(template, bundle["params"])
        trainable, frozen = partition_params(params, self.experiment.labels)
        self.trainable = self.experiment.shard_params(trainable)
        self.frozen = self.experiment.shard_params(frozen)
        self.model_state = self.experiment.shard_params(
            serialization.from_state_dict(
                jax.device_get(self.model_state), bundle["state"]
            )
        )
        leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        new_leaves = [
            bundle["opt_leaves"][str(i)] for i in range(len(leaves))
        ]
        # re-place on the mesh in the experiment's configured layout
        # (replicated, or scattered over data when ZeRO-1 is on) so a resumed
        # run's step sees the same input shardings the fresh run compiled for
        self.opt_state = self.experiment.shard_opt_state(
            jax.tree_util.tree_unflatten(treedef, new_leaves)
        )
        self.rng = self.experiment.canonical_rng(jnp_asarray_rng(bundle["rng"]))
        history = []
        hist_path = os.path.join(os.path.dirname(path), "history.json")
        if os.path.exists(hist_path):
            history = list(TrainHistory.from_json(hist_path).epochs)
        return int(bundle["epoch"]) + 1, history

    def _save_model(self, path: str):
        # gather on all processes (collective for cross-host shardings),
        # write on the coordinator, then barrier so a subsequent
        # _load_model on any process sees the finished file
        params = merge_params(
            self._host_tree(self.trainable), self._host_tree(self.frozen)
        )
        state = self._host_tree(self.model_state)
        if is_coordinator():
            save_checkpoint(path, params, state)
        barrier("best-model-save")

    def _load_model(self, path: str):
        from wav2vec2forbrain_tpu.train.steps import partition_params

        params, state = load_checkpoint(path)
        merged_template = merge_params(self.trainable, self.frozen)
        from flax import serialization

        params = serialization.from_state_dict(
            jax.device_get(merged_template), params
        )
        trainable, frozen = partition_params(params, self.experiment.labels)
        self.trainable = self.experiment.shard_params(trainable)
        self.frozen = self.experiment.shard_params(frozen)
        if state:
            self.model_state = serialization.from_state_dict(
                jax.device_get(self.model_state), state
            )

    # --- main loop ----------------------------------------------------------

    def train(self):
        # NB: like the reference (train_loop.py:129-134,153), resuming from a
        # checkpoint pre-seeds `history` (the early-stopping window continues)
        # but the epoch counter and schedulers restart at 0 and the run does
        # `epochs` MORE epochs.
        history: list = (
            self.experiment.checkpoint_history.epochs
            if self.experiment.checkpoint_history is not None
            else []
        )
        best_metric = float(
            "inf" if self.config.minimize_best_model_metric else "-inf"
        )
        from wav2vec2forbrain_tpu.parallel.distributed import shared_uuid

        best_model_path = os.path.join(
            self.yaml_config.cache_dir,
            "model_checkpoints",
            shared_uuid(),  # process-agreed: all processes read it back
            "best_model.msgpack",
        )
        if is_coordinator():
            os.makedirs(os.path.dirname(best_model_path), exist_ok=True)
        saved_best = False

        def get_relevant_metric(epoch_hist: SingleEpochHistory):
            avg = epoch_hist.get_average()
            return (
                avg.loss
                if self.config.best_model_metric == "loss"
                else avg.metrics[self.config.best_model_metric]
            )

        start_epoch = 0
        if self.config.resume_train_state:
            start_epoch, history = self.restore_train_state(
                self.config.resume_train_state
            )
            print(f"Resumed full train state at epoch {start_epoch}")

        self._precompile_bucket_programs()

        last_epoch = 0
        for epoch in range(start_epoch, self.config.epochs):
            last_epoch = epoch + 1
            print(f"\nEpoch {epoch + 1}/{self.config.epochs}")
            train_losses = self._train_epoch(self.dataloader_train, epoch)
            val_losses = self._evaluate_epoch("val")
            print(
                f"\n\n{'=' * 20}\nFinished Epoch {epoch + 1}/{self.config.epochs} "
                f"train {self.config.loss_function}-loss: "
                f"{train_losses.get_average().loss} "
                f"val {self.config.loss_function}-loss: "
                f"{val_losses.get_average().loss}"
            )
            epoch_losses = EpochLosses(train_losses, val_losses)
            history.append(epoch_losses)
            metrics = self._get_wandb_metrics(val_losses, "val")
            metrics.update(self._get_wandb_metrics(train_losses, "train"))
            metrics.update(self.step_timer.metrics("train", self.n_chips))
            self.step_timer.reset()
            self.logger.log(metrics)

            every = self.config.checkpoint_every_n_epochs
            if every is not None and (epoch + 1) % every == 0:
                self._save_train_state(epoch, history)
                print(f"Saved train state at {self._train_state_path()}")

            if self.config.return_best_model:
                curr = get_relevant_metric(val_losses)
                is_better = (
                    curr < best_metric
                    if self.config.minimize_best_model_metric
                    else curr > best_metric
                )
                if is_better:
                    best_metric = curr
                    self._save_model(best_model_path)
                    saved_best = True
                    print(f"\n\nSaving model checkpoint at {best_model_path}\n")

            if (
                self.config.early_stopping_patience is not None
                and len(history) >= self.config.early_stopping_patience
            ):
                window = [
                    get_relevant_metric(e.val_losses) for e in history
                ][-self.config.early_stopping_patience :]
                if self.config.minimize_best_model_metric:
                    window[0] -= self.config.early_stopping_delta
                    best_index = int(np.argmin(window))
                else:
                    window[0] += self.config.early_stopping_delta
                    best_index = int(np.argmax(window))
                if best_index == 0:
                    print(
                        f"\nEarly stopping after {epoch} epochs "
                        f"({self.config.early_stopping_patience} epochs without "
                        f"improvement in validation "
                        f"{self.config.best_model_metric} metrics)"
                    )
                    break

        if self.config.return_best_model and saved_best:
            self._load_model(best_model_path)
            barrier("best-model-load")  # all processes done reading
            if is_coordinator():
                os.remove(best_model_path)
                os.rmdir(os.path.dirname(best_model_path))
            print(
                "Loaded model with best validation loss of this experiment from disk"
            )

        if self.config.train_on_val_once:
            print("Training one epoch on val set")
            self._train_epoch(self.dataloader_val, last_epoch)

        test_losses = self._evaluate_epoch("test")
        self.logger.log(self._get_wandb_metrics(test_losses, "test"))
        print(
            f"\nTest loss ({self.config.loss_function}): "
            f"{test_losses.get_average().loss}"
        )
        return TrainHistory(history, test_losses)
