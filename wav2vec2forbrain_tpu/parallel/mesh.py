"""Device mesh + sharding rules (the framework's distributed layer).

The reference has no parallelism at all (SURVEY.md §2.4; scale-out is "run
more wandb agents"). Here distribution is first-class and TPU-native:

- a 2-D ('data', 'model') `jax.sharding.Mesh`
- batches sharded over 'data' (pure DP; gradient all-reduce is inserted by
  XLA and rides ICI)
- optionally, encoder matmul weights sharded over 'model'
  (Megatron-style column/row split of attention and FFN projections) so the
  conformer-large fits/scales when a model axis is requested

No hand-written collectives: pjit + NamedSharding let XLA place
psum/all_gather on the right axis.
"""

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int = 0,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """data_parallel=0 means "all remaining devices after the model axis"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1:
        model_parallel = 1
    if data_parallel <= 0:
        data_parallel = max(1, n // model_parallel)
    need = data_parallel * model_parallel
    if need > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs {need} devices, have {n}"
        )
    grid = np.asarray(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


# Megatron-style sharding of the transformer/conformer matmuls over 'model'.
# Column-parallel (out-dim sharded): qkv projections, FFN up-projection.
# Row-parallel (in-dim sharded): attention output proj, FFN down-projection.
_COL_KERNEL = re.compile(
    r"(q_proj|k_proj|v_proj|linear_q|linear_k|linear_v|intermediate_dense)\.kernel$"
)
_ROW_KERNEL = re.compile(r"(out_proj|linear_out|output_dense)\.kernel$")
_COL_BIAS = re.compile(
    r"(q_proj|k_proj|v_proj|linear_q|linear_k|linear_v|intermediate_dense)\.bias$"
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def param_pspec(path, leaf, shard_model: bool) -> P:
    """PartitionSpec for one param leaf. Everything not matched replicates.

    Rank-aware: scan-stacked layers carry a leading layer dim that stays
    unsharded."""
    if not shard_model:
        return P()
    s = _path_str(path)
    ndim = getattr(leaf, "ndim", None)
    lead = [None] * (ndim - 2) if ndim and ndim > 2 else []
    if _COL_KERNEL.search(s):
        return P(*lead, None, "model")
    if _ROW_KERNEL.search(s):
        return P(*lead, "model", None)
    if _COL_BIAS.search(s):
        lead1 = [None] * (ndim - 1) if ndim and ndim > 1 else []
        return P(*lead1, "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the model params on `mesh`."""
    shard_model = mesh.shape["model"] > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf, shard_model)),
        params,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def batch_shardings(batch_tree, mesh: Mesh):
    """Shard every batch leaf over 'data' on its leading axis."""
    return jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch_tree)


def pad_batch_to_multiple(batch_tree, multiple: int):
    """Pad the leading dim of every leaf so it divides the data axis.

    Padded samples get input_lens handled by the caller (they contribute to
    the loss denominator unless masked; the loader produces full batches in
    training, so this is only hit on the last eval batch)."""
    lead = jax.tree_util.tree_leaves(batch_tree)[0].shape[0]
    rem = lead % multiple
    if rem == 0:
        return batch_tree, lead
    pad = multiple - rem
    padded = jax.tree_util.tree_map(
        lambda a: np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0),
        batch_tree,
    )
    return padded, lead
