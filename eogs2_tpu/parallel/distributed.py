"""Multi-host bootstrap (all-new vs the single-GPU reference, SURVEY §5.8).

The reference is strictly single-process (`device="cuda"` hardcoded,
train_pan.py:127). TPU pods span processes: one JAX process per host, all
devices visible globally after `jax.distributed.initialize`. The mesh code
in parallel/mesh.py is process-count agnostic — `jax.devices()` returns the
GLOBAL device list once initialized, so the same ("g",) / ("d","g") meshes
span hosts with collectives riding ICI within a slice and DCN across.

Data handling model: the scene (images, cameras, init point cloud) is
host-replicated — every process loads the same files and enters the same
jitted step with the same host inputs. Gaussian-N-major arrays are placed
over "g" with `make_global_array` (works under both single- and
multi-process); XLA's partitioner does the rest. This matches the workload:
one scene, model-parallel over Gaussians — there is no per-host data shard
to distribute.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize the JAX distributed runtime when multi-process flags are
    present (CLI flags or EOGS2_COORDINATOR / EOGS2_NUM_PROCESSES /
    EOGS2_PROCESS_ID env vars). No-op single-process fallback: returns False
    when no coordinator is configured, so every entry point can call this
    unconditionally.

    On TPU pods all three values are discoverable from the environment and
    `jax.distributed.initialize()` could be called bare; we keep them
    explicit so CPU/GPU test rigs (and the 2-process CPU CI test) work the
    same way.
    """
    coordinator = coordinator or os.environ.get("EOGS2_COORDINATOR")
    if num_processes is None and "EOGS2_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["EOGS2_NUM_PROCESSES"])
    if process_id is None and "EOGS2_PROCESS_ID" in os.environ:
        process_id = int(os.environ["EOGS2_PROCESS_ID"])
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_coordinator() -> bool:
    """True on the process that should own host-side side effects (logging,
    checkpoint writes, eval) — process 0, or always in single-process."""
    return jax.process_index() == 0


def make_global_array(host_x, mesh: Mesh, spec: P):
    """Build a (possibly process-spanning) global array from host-replicated
    data. Every process must pass identical `host_x`. Single-process this is
    just device_put; multi-process each host materializes only its
    addressable shards."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(host_x, sharding)
    if isinstance(host_x, jax.Array) and not host_x.is_fully_addressable:
        # already a process-spanning global array: reshard
        return jax.device_put(host_x, sharding)
    host_x = np.asarray(host_x)
    return jax.make_array_from_callback(
        host_x.shape, sharding, lambda idx: host_x[idx]
    )


def all_processes_allclose(x, atol: float = 0.0) -> bool:
    """Debug guard: verify a replicated host value is identical across
    processes (catches per-host nondeterminism in scene loading)."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return bool(np.all(np.abs(gathered - gathered[0]) <= atol))
