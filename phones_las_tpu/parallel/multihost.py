"""Multi-host (multi-process) scale-out.

The reference is strictly single-process (SURVEY.md §3: no NCCL/MPI/
TF_CONFIG path ever configured); beyond one host the TPU-native story is
JAX's multi-controller runtime: every process runs the same program,
``jax.distributed.initialize`` wires the coordination service, the mesh
spans *all* processes' devices, and jit-compiled steps communicate over
ICI/DCN via the collectives GSPMD already inserts — no new model code.

What each process contributes:

  * data: a disjoint slice of the epoch's batch plan
    (``DataSource(shard=(process_index, process_count))`` — identical
    shuffled plan on every process from the shared seed, strided so
    every process sees the same number of batches);
  * arrays: its *local* batch rows, assembled into global jax.Arrays
    with ``shard_batch_global`` (the global batch is
    ``process_count × per_host_batch``, standard per-host DP semantics).

Single-process degenerates to the plain ``shard_batch`` path, so the
same Trainer code runs everywhere.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from phones_las_tpu.parallel.mesh import _BATCH_SPECS, shard_batch


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-controller runtime.

    Explicit args win; otherwise standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) or the Cloud-TPU metadata autodetection inside
    ``jax.distributed.initialize`` apply. Returns True when a multi-
    process runtime was initialized, False for the single-process no-op
    (no coordinator configured anywhere).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        return False  # single process; nothing to wire
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def shard_batch_global(batch: Dict, mesh) -> Dict:
    """Assemble each process's local batch rows into global jax.Arrays
    sharded over the mesh's 'data' axis.

    Single-process: identical to ``shard_batch``. Multi-process: the
    global batch axis is ``process_count × local_rows`` and each process
    supplies only its addressable shards
    (``jax.make_array_from_process_local_data``).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    from jax.sharding import NamedSharding

    out = {}
    for k, spec in _BATCH_SPECS.items():
        if k not in batch:
            continue
        local = np.asarray(batch[k])
        sharding = NamedSharding(mesh, spec)
        global_shape = (
            local.shape[0] * jax.process_count(),
        ) + local.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, global_shape
        )
    return out


def shard_plan(plans: list, index: int, count: int) -> list:
    """Deterministic per-process slice of an epoch's batch plan.

    At every global step all processes MUST execute the same bucket
    shape — they assemble one global array and enter one compiled SPMD
    program together — so batches are grouped by bucket and each group
    of ``count`` consecutive same-bucket batches becomes one global
    step (process i takes the group's i-th batch). A naive stride over
    the mixed plan would put, say, a 2 s bucket on process 0 and an 8 s
    bucket on process 1 at the same step → shape mismatch → distributed
    hang. Steps are emitted in the order each group *completes* in the
    canonical shuffled plan — NOT sorted by bucket, which would impose
    a shortest-first length curriculum every epoch that single-host
    training does not have. All processes compute the identical full
    plan from the shared shuffle seed, so no coordination is needed.
    (Per bucket, ``len % count`` leftover batches are dropped.)"""
    assert 0 <= index < count, (index, count)
    by_bucket: dict = {}
    order = []  # (bucket, group_idx) in canonical completion order
    for plan in plans:
        group = by_bucket.setdefault(plan[0], [])
        group.append(plan)
        if len(group) % count == 0:
            order.append((plan[0], len(group) // count - 1))
    return [by_bucket[b][g * count + index] for b, g in order]
