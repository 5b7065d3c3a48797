"""Device batch types.

The reference moves a NamedTuple-with-attached-attrs to CUDA per step
(ref: src/datasets/batch_types.py:5-41). TPU-native equivalent: a flat
NamedTuple of arrays — automatically a JAX pytree — with static shapes so it
can be donated to a jitted step and sharded over a mesh without host logic.
"""

from typing import NamedTuple, Optional

import numpy as np


class B2tBatch(NamedTuple):
    """One collated batch (numpy on host, jnp once inside jit).

    input:       (B, T, C) float32 neural features, zero-padded over T
    target:      (B, U) int32 token ids, padded with the tokenizer pad id (0)
    day_idxs:    (B,) int32 recording-day index (0..23)
    input_lens:  (B,) int32 valid frames per sample
    target_lens: (B,) int32 valid target tokens per sample
    sample_mask: (B,) float32 1.0 for real samples, 0.0 for rows added to pad
                 the batch up to the data-parallel mesh axis (loss/metrics
                 ignore padded rows; all-ones batches reproduce the
                 reference's plain batch mean exactly)
    """

    input: np.ndarray
    target: Optional[np.ndarray]
    day_idxs: np.ndarray
    input_lens: np.ndarray
    target_lens: Optional[np.ndarray]
    sample_mask: Optional[np.ndarray] = None
