"""ZeRO-1-style optimizer-state sharding over the data axis.

The reference trains single-GPU, so its optimizer state is simply resident
(torch Adam, ref: src/experiments/experiment.py optimizer factory). On a
TPU mesh the Adam moments are the largest per-replica buffers after the
params themselves; replicating them across the `data` axis wastes
HBM that could hold bigger batches or a longer remat-free schedule.

`--optimizer_state_sharding=zero1` shards every moment leaf across the
`data` axis instead (the ZeRO stage-1 layout): each data shard owns a
1/dp slice of the moments, computes the Adam update for its slice (XLA
turns the gradient all-reduce into a reduce-scatter where profitable),
and the updated params are all-gathered back to the replicated layout the
forward pass expects. All of that is expressed purely through shardings —
`device_put` for the initial state plus `with_sharding_constraint` on the
step outputs (train/steps.py) — with XLA's SPMD partitioner inserting the
collectives; there are no hand-written collectives to get wrong.

Composition with tensor parallelism: a leaf already sharded over `model`
(Megatron column/row split, parallel/mesh.py) keeps that axis; `data` is
laid on the first remaining divisible dimension. Scalar leaves (step
counts) and leaves with no divisible dimension stay replicated.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2vec2forbrain_tpu.parallel.mesh import param_pspec


def zero1_pspec(path, leaf, mesh: Mesh) -> P:
    """PartitionSpec for one optimizer-state leaf under ZeRO-1.

    Starts from the param sharding rules (the moment trees mirror the
    trainable param tree, and `param_pspec`'s patterns are suffix-anchored,
    so they match through the optax state prefix), then shards the first
    free, divisible dimension over `data`.
    """
    ndim = getattr(leaf, "ndim", 0)
    base = param_pspec(path, leaf, mesh.shape["model"] > 1)
    spec = list(base) + [None] * (ndim - len(base))
    spec = spec[:ndim]
    data = mesh.shape["data"]
    if data > 1:
        for d in range(ndim):
            if spec[d] is None and leaf.shape[d] % data == 0:
                spec[d] = "data"
                break
    return P(*spec)


def opt_state_shardings(opt_state, mesh: Mesh):
    """NamedSharding pytree for an optax state under ZeRO-1.

    Works on concrete arrays or ShapeDtypeStructs (only shape/ndim are
    consulted), so the same function serves `device_put` placement and the
    abstract lowering probe (experiments/impl.py::_lower_train_step).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, zero1_pspec(path, leaf, mesh)),
        opt_state,
    )


def _spec_axes(spec: P):
    for entry in spec:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            yield from entry
        else:
            yield entry


def sharded_fraction(opt_state_shardings_tree, opt_state) -> float:
    """Fraction of optimizer-state bytes that are data-sharded (diagnostic)."""
    import numpy as np

    total = 0
    sharded = 0
    for sh, leaf in zip(
        jax.tree_util.tree_leaves(opt_state_shardings_tree),
        jax.tree_util.tree_leaves(opt_state),
    ):
        nbytes = int(np.prod(leaf.shape) or 1) * leaf.dtype.itemsize
        total += nbytes
        if "data" in set(_spec_axes(sh.spec)):
            sharded += nbytes
    return sharded / max(total, 1)
