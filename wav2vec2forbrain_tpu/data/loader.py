"""Minimal host-side batch loader (replaces torch DataLoader).

Supports shuffled fixed-size batching and the day-homogeneous batch sampler
(ref: src/util/batch_sampler.py:8-55 and torch DataLoader usage at
src/experiments/b2t_experiment.py:82-99). Deterministic given a seed.
"""

import random
from typing import Callable, Dict, Iterator, List, Optional

from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.data.dataset import Brain2TextDataset


class Brain2TextBatchSampler:
    """Batches that never mix recording days (ref: batch_sampler.py:29-55).

    With `length_key` (--length_sorted_batches), each day's samples are
    length-sorted before slicing into batches, so batches are length-
    homogeneous and land in the smallest covering length bucket (standard
    bucketed batching). Composition becomes deterministic; the epoch-level
    batch ORDER still shuffles via __iter__."""

    def __init__(
        self,
        data,
        batch_size: int,
        shuffle: bool = True,
        rng=None,
        length_key=None,
    ):
        self.shuffle = shuffle
        self.batch_size = batch_size
        self._rng = rng if rng is not None else random.Random()
        self.length_key = length_key
        self.day_index = self.build_day_index(data)
        self.batches = self.build_batches()

    def __iter__(self):
        if self.shuffle:
            self._rng.shuffle(self.batches)
        for batch in self.batches:
            yield batch

    def __len__(self):
        return len(self.batches)

    def build_batches(self) -> List[List[int]]:
        batches: List[List[int]] = []
        batch: List[int] = []
        for indices in self.day_index.values():
            if self.length_key is not None:
                indices.sort(key=self.length_key)
            else:
                self._rng.shuffle(indices)
            for index in indices:
                batch.append(index)
                if len(batch) == self.batch_size:
                    batches.append(batch)
                    batch = []
            if len(batch) > 0:
                batches.append(batch)
                batch = []
        return batches

    def build_day_index(self, data) -> Dict[int, List[int]]:
        day_idx: Dict[int, List[int]] = {}
        for i in range(len(data)):
            sample = data.samples[i]
            day_idx.setdefault(sample.day_idx, []).append(i)
        return day_idx


class DataLoader:
    """Shuffling batch iterator over a dataset with a collate fn."""

    def __init__(
        self,
        dataset: Brain2TextDataset,
        batch_size: int,
        collate_fn: Callable[[list], B2tBatch],
        shuffle: bool = False,
        batch_sampler: Optional[Brain2TextBatchSampler] = None,
        seed: int = 0,
        length_key=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.batch_sampler = batch_sampler
        self.length_key = length_key
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def iter_index_batches(self) -> Iterator[List[int]]:
        """The epoch's batch compositions as index lists.

        Single source of truth for batch order: __iter__ collates these, and
        the device-resident dataset cache (train/device_cache.py) gathers
        them on device — both modes consume the same RNG stream, so shuffle
        order is identical whichever path a run takes."""
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        order = list(range(len(self.dataset)))
        if self.length_key is not None:
            # --length_sorted_batches: deterministic length-homogeneous
            # composition (each batch = a run of length-sorted samples, so it
            # pays only its own covering bucket width, not the max of
            # batch_size uniform draws); only the batch ORDER reshuffles
            order.sort(key=self.length_key)
            batches = [
                order[s : s + self.batch_size]
                for s in range(0, len(order), self.batch_size)
            ]
            if self.shuffle:
                self._rng.shuffle(batches)
            yield from batches
            return
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            yield order[start : start + self.batch_size]

    def __iter__(self) -> Iterator[B2tBatch]:
        for idxs in self.iter_index_batches():
            yield self.collate_fn([self.dataset[i] for i in idxs])
