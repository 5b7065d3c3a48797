"""Device-resident dataset cache: upload once, gather batches on device.

Through a remote-attached TPU (and on any accelerator, to a lesser degree)
the per-step H2D copy of the neural-feature batch is the steady-state
bottleneck of the Trainer: tools/profile_pipeline.py measured +95 ms/step for
the headline (32, 384, 256) f32 transfer, serialized with device compute.
The T12 corpus is small — ~9k train sentences, <2 GB padded at f16 — so the
TPU-native fix is to make the *dataset* device-resident: features, token
ids, lengths and day indices are uploaded once, and each step assembles its
batch ON DEVICE with a jitted gather driven by a tiny host index vector
(~100 bytes/step instead of ~13 MB/step).

Semantics vs the streaming path:
- batch composition and shuffle order are IDENTICAL — both paths consume
  DataLoader.iter_index_batches() (the same RNG stream; see data/loader.py)
- every sample is padded to the dataset-wide (T, U) bucket instead of its
  batch's bucket. With a single-bucket configuration (e.g. the headline
  pad_to_multiple=384 T12 setup) the gathered batches are bit-identical to
  collated ones; with multiple buckets short batches run at the max bucket
  shape — valid-length masking keeps losses/metrics correct, but models with
  padding-sensitive batch statistics (the conformer conv-module BatchNorm
  normalizes padded frames too, like the reference's) see the max-bucket
  numerics. One bucket also means ONE compiled executable per step type.
- the evaluator's host-side view of the batch (targets/lengths for WER) is
  served from host copies of the same arrays; features are never fetched
  back.

The reference has no equivalent (it streams `.cuda()` copies per step,
ref: src/train/train_loop.py:61-66); this is a TPU-first framework feature
gated by --device_data_cache (auto/on/off + byte budget).
"""

from typing import List, Optional

import numpy as np

from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.util.seq import calc_seq_len, round_up


def _wire_np_dtype(wire: str):
    if wire == "float16":
        return np.float16
    if wire == "bfloat16":
        import ml_dtypes

        return ml_dtypes.bfloat16
    return np.float32


def padded_index_row(idxs: List[int], batch_size: int, data_axis: int = 1):
    """(idx_row, mask_row, true_b): batch indices padded up to the full
    configured batch size rounded to the data axis, padding rows duplicating
    the last index with mask 0 — the exact padding contract of
    Trainer._put, as an index vector."""
    true_b = len(idxs)
    target = max(batch_size, true_b)
    full = ((target + data_axis - 1) // data_axis) * data_axis
    pad = full - true_b
    idx = np.asarray(list(idxs) + [idxs[-1]] * pad, np.int32)
    mask = np.concatenate(
        [np.ones((true_b,), np.float32), np.zeros((pad,), np.float32)]
    )
    return idx, mask, true_b


class DeviceDatasetCache:
    """One split's samples as device arrays + a jitted batch gather."""

    def __init__(
        self,
        feats: np.ndarray,  # (N, T, C) wire dtype (or multichannel layout)
        targets: np.ndarray,  # (N, U) int32
        day_idxs: np.ndarray,  # (N,) int32
        input_lens: np.ndarray,  # (N,) int32
        target_lens: np.ndarray,  # (N,) int32
        time_axis: int = 0,  # time axis WITHIN a sample
    ):
        self._host_targets = targets
        self._host_day = day_idxs
        self._host_ilens = input_lens
        self._host_tlens = target_lens
        self._host_feats = feats  # dropped after upload()
        self._time_axis = time_axis
        self._t_full = feats.shape[1 + time_axis]
        self._buckets: Optional[List[int]] = None
        self._dev = None
        self._gather = None

    # --- construction -------------------------------------------------------

    @classmethod
    def plan(
        cls,
        dataset,
        tokenizer,
        pad_to_multiple: int = 1,
        target_pad_to_multiple: int = 1,
        wire_dtype: str = "float32",
        time_axis: int = 0,
        remove_punctuation: bool = True,
    ) -> Optional["DeviceDatasetCache"]:
        """Host-side stage: pad/tokenize every sample to the dataset-wide
        bucket. Returns None for an empty split. `nbytes` is exact after
        this, so the auto budget check can run before any upload."""
        n = len(dataset)
        if n == 0:
            return None
        samples = [dataset[i] for i in range(n)]  # applies resampling
        t_max = round_up(
            max(s.input.shape[time_axis] for s in samples), pad_to_multiple
        )

        def pad_input(a):
            widths = [(0, 0)] * a.ndim
            widths[time_axis] = (0, t_max - a.shape[time_axis])
            return np.pad(a, widths)

        dt = _wire_np_dtype(wire_dtype)
        feats = np.stack([pad_input(s.input) for s in samples]).astype(dt)

        from wav2vec2forbrain_tpu.data.dataset import _PUNCTUATION_RE

        def process_label(label: str) -> str:
            return _PUNCTUATION_RE.sub("", label) if remove_punctuation else label

        targets = tokenizer(
            [process_label(s.target) for s in samples], padding="longest"
        ).input_ids
        u_max = round_up(targets.shape[1], target_pad_to_multiple)
        if u_max > targets.shape[1]:
            targets = np.pad(
                targets,
                ((0, 0), (0, u_max - targets.shape[1])),
                constant_values=tokenizer.pad_token_id,
            )
        return cls(
            feats=feats,
            targets=targets.astype(np.int32),
            day_idxs=np.asarray([s.day_idx for s in samples], np.int32),
            input_lens=np.asarray(
                [s.input.shape[time_axis] for s in samples], np.int32
            ),
            target_lens=np.asarray(
                [calc_seq_len(row) for row in targets], np.int32
            ),
            time_axis=time_axis,
        )

    @property
    def nbytes(self) -> int:
        feats = self._host_feats
        feats_bytes = (
            feats.nbytes if feats is not None else self._dev[0].nbytes
        )
        return int(
            feats_bytes
            + self._host_targets.nbytes
            + self._host_day.nbytes
            + self._host_ilens.nbytes
            + self._host_tlens.nbytes
        )

    def upload(self, mesh=None, batch_sharding=None):
        """Move the planned arrays to device (replicated across the mesh when
        one is configured, so a dp gather stays shard-local after the jit's
        out_shardings re-shard only the gathered batch)."""
        import jax
        import jax.numpy as jnp

        self._mesh = mesh
        self._batch_sharding = batch_sharding
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        else:
            put = jnp.asarray
        self._dev = tuple(
            put(a)
            for a in (
                self._host_feats,
                self._host_targets,
                self._host_day,
                self._host_ilens,
                self._host_tlens,
            )
        )
        # block so an over-budget upload fails HERE (caller catches and falls
        # back to streaming) rather than inside the first train step
        jax.block_until_ready(self._dev[0])
        self._host_feats = None  # free the host copy

        t_axis = 1 + self._time_axis

        def gather(feats, targets, day, ilens, tlens, idx, mask, t_width):
            # static-width slice of the gathered rows: XLA lowers the pair
            # to one gather with slice_sizes (no full-width materialization),
            # so a short bucket reads only its bucket's bytes from HBM
            x = jax.lax.slice_in_dim(feats[idx], 0, t_width, axis=t_axis)
            return B2tBatch(
                input=x,
                target=targets[idx],
                day_idxs=day[idx],
                input_lens=ilens[idx],
                target_lens=tlens[idx],
                sample_mask=mask,
            )

        out_shardings = None
        if batch_sharding is not None:
            out_shardings = B2tBatch(
                input=batch_sharding,
                target=batch_sharding,
                day_idxs=batch_sharding,
                input_lens=batch_sharding,
                target_lens=batch_sharding,
                sample_mask=batch_sharding,
            )
            self._gather = jax.jit(
                gather, static_argnums=(7,), out_shardings=out_shardings
            )
        else:
            self._gather = jax.jit(gather, static_argnums=(7,))
        return self

    # --- length buckets -------------------------------------------------------

    def set_buckets(self, t_buckets: Optional[List[int]]):
        """Enable multi-bucket gathers: per batch, features are sliced to the
        smallest bucket width covering the batch's longest sample (instead of
        the dataset-wide max every batch pays in single-bucket mode). One
        compiled gather + one compiled step program per DISTINCT width
        actually hit. Widths must be <= the stored (dataset-max) width; the
        list is normalized to always cover the max."""
        if not t_buckets:
            self._buckets = None
            return self
        bs = sorted({min(int(b), self._t_full) for b in t_buckets})
        if bs[-1] < self._t_full:
            bs.append(self._t_full)
        self._buckets = bs
        return self

    def reachable_widths(self) -> List[int]:
        """Every bucket width a batch from this split can land in: a batch's
        width is the bucket of its longest sample, so the reachable set is
        exactly {bucket(len) for len in the split's sample lengths}. Used by
        the Trainer's --precompile_buckets pass to compile every (split,
        width) chunk program up front instead of paying a ~17 s compile the
        first time a rare width appears inside a late epoch."""
        if self._buckets is None:
            return [self._t_full]
        bs = np.asarray(self._buckets, np.int64)
        pos = np.searchsorted(bs, np.unique(self._host_ilens))
        pos = np.minimum(pos, len(bs) - 1)
        return sorted({int(bs[p]) for p in pos})

    def width_for(self, idxs: List[int]) -> int:
        """The bucket width for a batch: smallest bucket covering its
        longest sample (dataset max when bucketing is off)."""
        if self._buckets is None:
            return self._t_full
        need = int(self._host_ilens[np.asarray(idxs, np.int64)].max())
        for b in self._buckets:
            if b >= need:
                return b
        return self._t_full

    # --- per-epoch iteration ------------------------------------------------

    def device_batch(
        self, idx: np.ndarray, mask: np.ndarray, t_width: Optional[int] = None
    ) -> B2tBatch:
        return self._gather(
            *self._dev, idx, mask, self._t_full if t_width is None else t_width
        )

    def host_batch(self, idxs: List[int]) -> B2tBatch:
        """The evaluator's view (true rows only, features omitted)."""
        sel = np.asarray(idxs, np.int64)
        return B2tBatch(
            input=None,
            target=self._host_targets[sel],
            day_idxs=self._host_day[sel],
            input_lens=self._host_ilens[sel],
            target_lens=self._host_tlens[sel],
            sample_mask=np.ones((len(idxs),), np.float32),
        )

    def stream(self, loader, batch_size: int, data_axis: int = 1):
        """Yields (device_batch, true_b, host_batch) like _batch_stream, with
        rows padded up to the full batch size (masked row -1 duplicates —
        the exact padding contract of Trainer._put)."""
        for idxs in loader.iter_index_batches():
            idx, mask, true_b = padded_index_row(idxs, batch_size, data_axis)
            yield (
                self.device_batch(idx, mask, self.width_for(idxs)),
                true_b,
                self.host_batch(idxs),
            )


def build_split_caches(
    loaders: dict,
    tokenizer,
    config,
    mesh=None,
    batch_sharding=None,
    max_bytes: Optional[int] = None,
    verbose: bool = True,
) -> dict:
    """Plan caches for the given {split: DataLoader}, enforce the total byte
    budget, upload, and return {split: DeviceDatasetCache}. Any failure
    (budget, OOM, exotic layout) degrades to streaming for that split —
    never aborts the run."""
    multiple_channels = getattr(config, "preprocessing", "") in (
        "seperate_zscoring_2channels",
        "seperate_zscoring_4channels",
    )
    time_axis = 1 if multiple_channels else 0
    plans = {}
    total = 0
    for split, loader in loaders.items():
        try:
            plan = DeviceDatasetCache.plan(
                loader.dataset,
                tokenizer,
                pad_to_multiple=config.pad_to_multiple,
                target_pad_to_multiple=config.target_pad_to_multiple,
                wire_dtype=getattr(config, "h2d_dtype", "float32"),
                time_axis=time_axis,
                remove_punctuation=config.remove_punctuation,
            )
        except Exception as e:  # noqa: BLE001 — degrade, never abort
            if verbose:
                print(f"device_data_cache: planning {split} failed ({e}); "
                      "streaming instead")
            plan = None
        if plan is not None:
            plans[split] = plan
            total += plan.nbytes
    if max_bytes is not None and total > max_bytes:
        if verbose:
            print(
                f"device_data_cache: {total / 1e6:.0f} MB exceeds the "
                f"{max_bytes / 1e6:.0f} MB budget; streaming instead"
            )
        return {}
    caches = {}
    for split, plan in plans.items():
        try:
            caches[split] = plan.upload(mesh, batch_sharding)
        except Exception as e:  # noqa: BLE001 — e.g. RESOURCE_EXHAUSTED
            if verbose:
                print(f"device_data_cache: upload of {split} failed ({e}); "
                      "streaming instead")
    n_buckets = getattr(config, "length_buckets", "off")
    if caches and n_buckets != "off":
        # shared bucket grid across splits so every split's batches hit the
        # same step shapes — bucket count == max distinct step compiles
        all_lens = np.concatenate(
            [c._host_ilens for c in caches.values()]
        ).astype(np.float64)
        if n_buckets == "exact":
            # every pad_to_multiple width any batch can need: a batch's
            # bucket is then EXACTLY the streaming collate's batch-max width,
            # so cached runs reproduce reference numerics bit-for-bit even
            # for models that consume padding (the biGRU feeds padded frames
            # like the reference's unpacked torch.nn.GRU)
            widths = sorted(
                {
                    round_up(int(l), config.pad_to_multiple)
                    for l in np.unique(all_lens)
                }
            )
        else:
            # quantile approximation: fewer compiles; short batches run at
            # the next bucket up (exact losses for masked models, max-bucket
            # numerics for padding-sensitive ones — see module docstring)
            n_buckets = int(n_buckets)
            if n_buckets < 2:
                widths = None
            else:
                widths = sorted(
                    {
                        round_up(
                            int(np.quantile(all_lens, (i + 1) / n_buckets)),
                            config.pad_to_multiple,
                        )
                        for i in range(n_buckets)
                    }
                )
        if widths:
            for c in caches.values():
                c.set_buckets(widths)
            if verbose:
                eff = sorted({w for c in caches.values() for w in c._buckets})
                print(f"device_data_cache: length buckets (frames) {eff}")
    if caches and verbose:
        print(
            f"device_data_cache: resident "
            f"{', '.join(sorted(caches))} ({total / 1e6:.0f} MB); "
            "per-step H2D reduced to index vectors"
        )
    return caches
