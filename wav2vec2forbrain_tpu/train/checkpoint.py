"""Checkpoint I/O for param/state pytrees.

Replaces torch.save/load state-dict checkpoints
(ref: src/experiments/experiment.py:137-141, src/train/train_loop.py:178,
src/experiments/b2t_gru_w2v_experiment.py:202-207) with flax msgpack
serialization of the nested-dict pytrees. Artifact names keep the reference
layout: model.msgpack (~model.pt), brain_encoder.msgpack (~brain_encoder.pt).

The full checkpoint bundles {params, state} so batch-norm running stats
(conformer) resume exactly.
"""

import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, params: dict, state: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict converts lists to {str(i): ...} dicts so from_state_dict
    # can restore against a pytree template (strict load analogue).
    bundle = serialization.to_state_dict(
        {"params": _to_numpy(params), "state": _to_numpy(state or {})}
    )
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(bundle))


def load_checkpoint(
    path: str, template: Optional[dict] = None
) -> Tuple[dict, dict]:
    """Returns (params, state). If `template` given, restores exact pytree
    structure (strict=True analogue); otherwise returns raw nested dicts."""
    with open(path, "rb") as f:
        bundle = serialization.msgpack_restore(f.read())
    params = bundle["params"]
    state = bundle.get("state", {})
    if template is not None:
        params = serialization.from_state_dict(template, params)
    return params, state


def save_subtree(path: str, subtree: dict):
    """e.g. the brain encoder alone (store_brain_encoder flag,
    ref: b2t_gru_w2v_experiment.py:202-207)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                serialization.to_state_dict({"params": _to_numpy(subtree)})
            )
        )
