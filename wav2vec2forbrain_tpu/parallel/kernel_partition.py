"""Mesh partitioning for the Pallas kernels.

GSPMD treats a pallas_call as an opaque custom call: without a partitioning
rule it ALL-GATHERS every sharded operand and runs the kernel fully
replicated on each device — silently destroying data-parallel scaling for
exactly the ops we hand-optimized (verified on the virtual mesh: a dp4-
sharded `mha_fused` compiled to three batch all-gathers).

Every kernel here is batch-parallel: each argument/result either carries the
batch on some dimension or is small and replicated (weights, seeds), and the
only cross-batch coupling is sum-reduction of weight gradients. So the rule
is mechanical and `partition_kernel` states it once per kernel:

- named batch *factors* (f0, f1, ...) map to concrete dimensions per
  argument/result; mesh axes found there stay — the kernel runs per-shard on
  local shapes with zero collectives on the data path,
- every other dimension is replicated,
- outputs listed in `reduce_outputs` (weight grads: batch-summed inside the
  kernel) get a psum over the batch mesh axes in the partitioned lowering,
- the same factor map is emitted as an einsum-like Shardy sharding rule so
  the new (Shardy) propagation pass understands the op too.

Single-device / no-mesh traces lower the wrapped function unchanged.
"""

from typing import Dict, Optional, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

# factor map type: {factor_index: dimension} for one argument or result;
# None means fully replicated (no batch factor anywhere on it)
FactorMap = Optional[Dict[int, int]]


def _named_sharding(arg_info):
    s = getattr(arg_info, "sharding", None)
    return s if isinstance(s, NamedSharding) else None


def _sharding_rule(arg_specs, out_specs, arg_ndims, out_ndims):
    """Einsum-like Shardy rule: batch factors shared, everything else
    private (unique letters, no propagation)."""
    names = iter(f"p{i}" for i in range(10000))

    def term(fmap, ndim):
        dims = {} if fmap is None else {d: f for f, d in fmap.items()}
        return " ".join(
            f"f{dims[d]}" if d in dims else next(names) for d in range(ndim)
        )

    lhs = ", ".join(term(f, n) for f, n in zip(arg_specs, arg_ndims))
    rhs = ", ".join(term(f, n) for f, n in zip(out_specs, out_ndims))
    return f"{lhs} -> {rhs}"


def partition_kernel(
    fn,
    *,
    arg_factors: Sequence[FactorMap],
    arg_ndims: Sequence[int],
    out_factors: Sequence[FactorMap],
    out_ndims: Sequence[int],
    reduce_outputs: Sequence[int] = (),
    static_argnums: Sequence[int] = (),
):
    """Declare `fn`'s batch-parallel partitioning to GSPMD/Shardy.

    arg_factors/out_factors: per-array {factor: dim} maps (None = replicated).
    reduce_outputs: output indices whose local values are per-shard partial
        sums over the batch — psum'd over the batch mesh axes on lowering.
    """
    cp = custom_partitioning(fn, static_argnums=tuple(static_argnums))
    single_out = len(out_factors) == 1

    def _factor_axes(arg_infos):
        """factor index -> mesh axis name(s) carried by the operands."""
        axes = {}
        for fmap, ai in zip(arg_factors, arg_infos):
            if fmap is None:
                continue
            s = _named_sharding(ai)
            if s is None:
                continue
            for f, d in fmap.items():
                if d < len(s.spec) and s.spec[d] is not None:
                    axes.setdefault(f, s.spec[d])
        return axes

    def _spec(fmap, ndim, axes):
        if fmap is None:
            return PartitionSpec()
        dims = {d: axes.get(f) for f, d in fmap.items()}
        return PartitionSpec(*[dims.get(d) for d in range(ndim)])

    def _shardings(mesh, arg_infos):
        axes = _factor_axes(arg_infos)
        arg_sh = tuple(
            NamedSharding(mesh, _spec(f, n, axes))
            for f, n in zip(arg_factors, arg_ndims)
        )
        out_sh = tuple(
            NamedSharding(mesh, _spec(f, n, axes))
            for f, n in zip(out_factors, out_ndims)
        )
        return axes, arg_sh, out_sh

    def infer_sharding_from_operands(mesh, arg_infos, result_infos):
        _, _, out_sh = _shardings(mesh, arg_infos)
        return out_sh[0] if single_out else out_sh

    def partition(mesh, arg_infos, result_infos):
        axes, arg_sh, out_sh = _shardings(mesh, arg_infos)
        # mesh axes the batch is sharded over (for weight-grad psum)
        batch_axes = []
        for entry in axes.values():
            for name in (entry if isinstance(entry, tuple) else (entry,)):
                if name is not None and name not in batch_axes:
                    batch_axes.append(name)

        def lower_fn(*args):
            out = fn(*args)
            if reduce_outputs and batch_axes:
                outs = list(out) if not single_out else [out]
                for i in reduce_outputs:
                    outs[i] = jax.lax.psum(outs[i], tuple(batch_axes))
                out = outs[0] if single_out else type(out)(outs)
            return out

        return (
            mesh,
            lower_fn,
            out_sh[0] if single_out else out_sh,
            arg_sh,
        )

    cp.def_partition(
        infer_sharding_from_operands=infer_sharding_from_operands,
        partition=partition,
        sharding_rule=_sharding_rule(
            arg_factors, out_factors, arg_ndims, out_ndims
        ),
    )
    return cp


def partition_batched(
    fn,
    *,
    arg_ndims: Sequence[int],
    out_ndims: Sequence[int],
    shardable_dims: Sequence[int] = (0,),
    replicated_argnums: Sequence[int] = (),
    static_argnums: Sequence[int] = (),
):
    """Common case: every non-replicated argument and every result carries
    the batch factors on the SAME dimensions (`shardable_dims`)."""
    fmap = {f: d for f, d in enumerate(shardable_dims)}
    repl = set(replicated_argnums)
    return partition_kernel(
        fn,
        arg_factors=[
            None if i in repl else dict(fmap) for i in range(len(arg_ndims))
        ],
        arg_ndims=arg_ndims,
        out_factors=[dict(fmap) for _ in out_ndims],
        out_ndims=out_ndims,
        static_argnums=static_argnums,
    )
