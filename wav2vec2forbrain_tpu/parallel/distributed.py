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


def process_batch_slice(global_batch: int) -> tuple:
    """(per-process batch, offset) for host-sharded data loading."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return per, i * per
