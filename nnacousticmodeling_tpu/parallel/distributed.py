"""Multi-host bring-up helpers.

The reference is strictly single-process/single-GPU; the multi-host
story here follows the standard JAX recipe: one process per host calls
``initialize_distributed``, after which ``jax.devices()`` spans the pod
slice and the mesh helpers in ``mesh.py`` build global meshes whose
``data``/``fold`` axes place collectives on ICI within a slice and DCN
across slices.

This environment exposes one physical chip, so multi-host execution is
validated structurally (virtual 8-device CPU meshes in tests and the
driver's ``dryrun_multichip``); on a real pod these helpers are the
entry point:

    # on every host — `sbatch scripts/pod/launch_slurm.sh <train_cli
    # args>` does exactly this via `train_cli --distributed`:
    initialize_distributed(coordinator, num_hosts, host_id)
    mesh = pod_mesh({"fold": K, "data": jax.device_count() // K})

Utterance-batch data parallelism over hosts needs no other changes:
the engine's update steps are jit-compiled with sharded batches and
XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from .mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with explicit or env-provided
    (TPU metadata) topology. Call once per host process before any
    device use."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(axes: Dict[str, int]):
    """Global mesh over every device in the (multi-host) runtime."""
    return make_mesh(axes, devices=jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a globally-sharded batch this host should feed
    (process-local slice under equal sharding over processes)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_array(mesh, local_rows, axis_name: str = "data"):
    """Assemble a global batch ``jax.Array`` sharded over ``axis_name``
    from this host's process-local rows (the rows named by
    ``local_batch_slice``). Each host feeds only its own shard; no
    host ever materializes the global batch.

    The TPU-native replacement for the reference's per-step full-batch
    host->device upload (orcus_chainer_util.py:124-125)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P(axis_name, *([None] * (np_ndim(local_rows) - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_rows)


def np_ndim(a) -> int:
    import numpy as np
    return np.ndim(a)


def replicated_array(mesh, value):
    """A fully-replicated global array from identical per-host data
    (every process must pass the same ``value``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(value, NamedSharding(mesh, P()))


def sync(name: str = "sync") -> None:
    """Barrier across all hosts (debug/bring-up aid)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
