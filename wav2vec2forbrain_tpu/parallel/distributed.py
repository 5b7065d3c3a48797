"""Multi-host (DCN) initialization.

The reference has no distributed story (SURVEY.md §2.4); here multi-host
slices work through jax.distributed + the same ('data','model') mesh —
jax.devices() then spans all hosts and the pjit-sharded step is unchanged
(XLA routes data-parallel collectives over ICI within a slice and DCN
across slices).

Call maybe_initialize_distributed() once at process start. It is a no-op on
single-host setups: TPU pod environments (GKE/TPU VM) are auto-detected by
jax.distributed.initialize() from the cluster env; explicit coordination can
be forced with the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID variables.
"""

import os


def maybe_initialize_distributed() -> bool:
    """Returns True if jax.distributed was initialized."""
    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS")
    # multi-host only when the worker list names >1 host (single-host TPU-VM
    # boots set TPU_WORKER_HOSTNAMES=localhost)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = len([w for w in workers.split(",") if w.strip()]) > 1
    auto_env = multi_worker or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    if not explicit and not auto_env:
        return False
    import jax

    kwargs = {}
    if explicit:
        kwargs = dict(
            coordinator_address=explicit,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except (RuntimeError, ValueError) as e:
        if "already" in str(e):
            return True
        print(f"WARNING: jax.distributed.initialize failed: {e}")
        return False


def is_coordinator() -> bool:
    """True on the process that owns file writes (checkpoints, logs,
    results artifacts). Multi-host runs assume the results/cache dirs live
    on a filesystem every process can READ (standard pod setup); only
    process 0 ever writes."""
    import jax

    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process). Used after
    coordinator-only writes that other processes subsequently read, e.g.
    the best-model checkpoint reload at the end of training."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def shared_uuid() -> str:
    """A uuid4 string that is IDENTICAL on every process (the coordinator's
    value, broadcast): multi-host runs must agree on coordinator-written
    paths they all read back (e.g. the best-model checkpoint)."""
    import uuid

    import jax

    u = uuid.uuid4()
    if jax.process_count() == 1:
        return str(u)
    import numpy as np
    from jax.experimental import multihost_utils

    bits = np.frombuffer(u.bytes, dtype=np.uint8).copy()
    bits = np.asarray(multihost_utils.broadcast_one_to_all(bits), np.uint8)
    return str(uuid.UUID(bytes=bits.tobytes()))


_replicate_jit_cache: dict = {}


def host_fetchable(mesh, *arrays):
    """Make jit outputs host-readable on multi-process meshes.

    np.asarray / device_get on an array whose shards span other processes
    raises; this reshards such arrays to fully-replicated (one jitted
    identity per mesh, executed as an SPMD all-gather by every process —
    payloads here are the tiny evaluator outputs, so the collective is
    noise). Single-process (including the 8-virtual-device CPU test mesh
    and the single-chip TPU tunnel): returns the inputs untouched.

    Note on the H2D direction: no per-process slicing helper is needed —
    `jax.device_put(host_array, cross_process_sharding)` is the supported
    global placement path (every process passes the same host value and
    uploads only its addressable shards), so Trainer._put works unchanged
    on multi-host meshes.
    """
    import jax

    if jax.process_count() == 1 or mesh is None:
        return arrays
    fn = _replicate_jit_cache.get(id(mesh))
    if fn is None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        fn = jax.jit(lambda x: x, out_shardings=rep)
        _replicate_jit_cache[id(mesh)] = fn
    return tuple(
        a if getattr(a, "is_fully_addressable", True) else fn(a)
        for a in arrays
    )
