"""Brain2Text dataset: .mat ingest, block-split policy, collation.

Mirrors the reference data semantics (ref: src/datasets/brain2text.py:46-213):
24 T12 sessions; split policy val -> `test/` dir, test -> first block of
`train/` dir files, train -> remaining blocks; 8 preprocessing strategies;
upper-cased transcriptions; optional resampling; pad-to-max collate with
regex punctuation stripping and day/length side info.

TPU-first differences: collation produces numpy `B2tBatch` pytrees with
optional pad-to-multiple bucketing so jitted steps see a bounded set of
shapes, and batching/shuffling is a tiny host-side loader (no torch
DataLoader).
"""

import os
import re
from pathlib import Path
from typing import Callable, List, Literal

import numpy as np
from scipy.io import loadmat

from wav2vec2forbrain_tpu.args.base_args import B2TDatasetArgsModel
from wav2vec2forbrain_tpu.data.batch import B2tBatch
from wav2vec2forbrain_tpu.data.preprocessing import (
    PreprocessingFunctions,
    resample_sample,
)
from wav2vec2forbrain_tpu.data.tokenizer import Wav2Vec2CTCTokenizer
from wav2vec2forbrain_tpu.util.seq import calc_seq_len, round_up

# The 24 T12 recording sessions (ref: src/datasets/brain2text.py:46-72).
sessionNames = sorted(
    [
        "t12.2022.04.28",
        "t12.2022.05.26",
        "t12.2022.06.21",
        "t12.2022.07.21",
        "t12.2022.08.13",
        "t12.2022.05.05",
        "t12.2022.06.02",
        "t12.2022.06.23",
        "t12.2022.07.27",
        "t12.2022.08.18",
        "t12.2022.05.17",
        "t12.2022.06.07",
        "t12.2022.06.28",
        "t12.2022.07.29",
        "t12.2022.08.23",
        "t12.2022.05.19",
        "t12.2022.06.14",
        "t12.2022.07.05",
        "t12.2022.08.02",
        "t12.2022.08.25",
        "t12.2022.05.24",
        "t12.2022.06.16",
        "t12.2022.07.14",
        "t12.2022.08.11",
    ]
)

N_DAYS = len(sessionNames)

_PUNCTUATION_RE = re.compile(r'[\,\?\.\!\-\;\:"]')


class B2tSample:
    __slots__ = ("input", "target", "day_idx")

    def __init__(self, input: np.ndarray, target: str, day_idx: int = 0):
        self.input = input
        self.target = target
        self.day_idx = day_idx


class Brain2TextDataset:
    def __init__(
        self,
        config: B2TDatasetArgsModel,
        dataset_splits_dir: str,
        split: Literal["train", "val", "test"] = "train",
    ) -> None:
        self.config = config

        if split == "val":
            data_path = Path(dataset_splits_dir) / "test"
        elif split == "test" and config.competition_mode:
            data_path = Path(dataset_splits_dir) / "competitionHoldOut"
        else:
            data_path = Path(dataset_splits_dir) / "train"

        if not os.path.exists(data_path):
            raise Exception(f"{data_path} does not exist.")

        data_files = [
            (day_idx, loadmat(data_path / f"{file_prefix}.mat"))
            for day_idx, file_prefix in enumerate(sessionNames)
            if os.path.exists(data_path / f"{file_prefix}.mat")
        ]

        preprocess = PreprocessingFunctions[config.preprocessing]

        self.samples: List[B2tSample] = []

        for day_idx, data_file in data_files:
            block_nums = np.squeeze(data_file["blockIdx"])
            block_list = np.unique(block_nums)

            # Block-wise split policy (ref: brain2text.py:117-120):
            # test = first block of train-dir files, train = remaining blocks.
            if split == "test" and not config.competition_mode:
                block_list = [block_list[0]]
            if split == "train" and not config.competition_mode:
                block_list = block_list[1:]

            blocks = []
            for b in range(len(block_list)):
                sent_idx = np.argwhere(block_nums == block_list[b])
                blocks.append(sent_idx[:, 0].astype(np.int32))

            input_features, transcriptions = preprocess(
                data_file, blocks, config.area
            )
            assert len(input_features) == len(
                transcriptions
            ), "Length of input features and transcriptions must be equal."

            for i in range(len(input_features)):
                self.samples.append(
                    B2tSample(
                        np.asarray(input_features[i], dtype=np.float32),
                        transcriptions[i].upper(),
                        day_idx,
                    )
                )

    def __len__(self) -> int:
        return (
            len(self.samples)
            if self.config.limit_samples is None
            else min(len(self.samples), self.config.limit_samples)
        )

    def __getitem__(self, index: int) -> B2tSample:
        orig_sample_rate = 50
        target_sample_rate = self.config.sample_rate
        if target_sample_rate % orig_sample_rate != 0:
            print("WARNING: target_sample_rate % orig_sample_rate != 0")
        sample = self.samples[index]
        if target_sample_rate != orig_sample_rate:
            return B2tSample(
                resample_sample(sample.input, target_sample_rate, orig_sample_rate),
                sample.target,
                sample.day_idx,
            )
        return sample

    def get_collate_fn(
        self,
        tokenizer: Wav2Vec2CTCTokenizer,
        pad_to_multiple: int = 1,
        target_pad_to_multiple: int = 1,
    ) -> Callable[[List[B2tSample]], B2tBatch]:
        if tokenizer is None:
            raise ValueError("Tokenizer must be provided for the collate function.")
        multiple_channels = self.config.preprocessing in (
            "seperate_zscoring_2channels",
            "seperate_zscoring_4channels",
        )
        time_axis = 1 if multiple_channels else 0
        remove_punct = self.config.remove_punctuation

        def _collate(batch: List[B2tSample]) -> B2tBatch:
            max_len = round_up(
                max(s.input.shape[time_axis] for s in batch), pad_to_multiple
            )
            inputs = []
            for s in batch:
                pad_widths = [(0, 0)] * s.input.ndim
                pad_widths[time_axis] = (0, max_len - s.input.shape[time_axis])
                inputs.append(np.pad(s.input, pad_widths))

            def process_label(label: str) -> str:
                if remove_punct:
                    label = _PUNCTUATION_RE.sub("", label)
                return label

            label_ids = tokenizer(
                [process_label(s.target) for s in batch], padding="longest"
            ).input_ids
            if target_pad_to_multiple > 1:
                padded_u = round_up(label_ids.shape[1], target_pad_to_multiple)
                if padded_u > label_ids.shape[1]:
                    label_ids = np.pad(
                        label_ids,
                        ((0, 0), (0, padded_u - label_ids.shape[1])),
                        constant_values=tokenizer.pad_token_id,
                    )

            return B2tBatch(
                input=np.stack(inputs).astype(np.float32),
                target=label_ids.astype(np.int32),
                day_idxs=np.asarray([s.day_idx for s in batch], dtype=np.int32),
                input_lens=np.asarray(
                    [s.input.shape[time_axis] for s in batch], dtype=np.int32
                ),
                target_lens=np.asarray(
                    [calc_seq_len(row) for row in label_ids], dtype=np.int32
                ),
                sample_mask=np.ones((len(batch),), dtype=np.float32),
            )

        return _collate
