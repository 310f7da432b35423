"""Multi-host (multi-process) initialization — the DCN scaling path.

One process per host, each owning its local chips (a v5e pod slice beyond one
host, or several hosts' worth of any accelerator). After
:func:`initialize_multihost`, ``jax.devices()`` is GLOBAL across processes,
``parallel.mesh.make_mesh`` builds the global data-parallel mesh, and the
jitted train steps run unchanged — GSPMD routes gradient/BN/metric
all-reduces over ICI within a host and DCN across hosts from the same
sharding annotations (SURVEY.md section 2g: the reference has no distributed
layer; this is the rebuild's NCCL/MPI-role component, with no per-step
communication code).

Host-side batch placement differs from single-process: a process can only
materialize its addressable shards, so :func:`shard_batch_multihost` builds
the global batch array from each process's local slice
(``jax.make_array_from_process_local_data``). Each process feeds
``global_batch_size / num_processes`` samples per step.

Tested two-process on CPU (tests/test_multihost.py) — the same code path a
real pod uses, minus the fabric.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str],
    num_processes: Optional[int],
    process_id: Optional[int],
    local_device_ids=None,
) -> bool:
    """``jax.distributed.initialize`` wrapper; returns True when multi-host.

    No-op (returns False) when ``num_processes`` is None/0/1 — single-process
    runs don't pay the distributed-runtime startup. Must be called before any
    JAX backend use in the process.
    """
    if not num_processes or num_processes <= 1:
        return False
    if coordinator_address is None or process_id is None:
        raise ValueError(
            "multi-host needs --coordinator-address and --process-id "
            f"(got {coordinator_address!r}, {process_id!r})"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id),
        local_device_ids=local_device_ids,
    )
    return True


def process_slice(n: int) -> slice:
    """This process's contiguous slice of a global batch axis of length n."""
    k = jax.process_count()
    i = jax.process_index()
    if n % k:
        raise ValueError(f"global batch {n} not divisible by {k} processes")
    per = n // k
    return slice(i * per, (i + 1) * per)


def put_multihost(batch: dict, mesh, axis_name: str = "data") -> dict:
    """Driver-side placement: pad the global batch, slice locally, go global.

    Every process holds the IDENTICAL global host batch (the loaders are
    seeded, so same order everywhere); it is wrap-padded to divide the global
    mesh, each process keeps its contiguous slice, and
    :func:`shard_batch_multihost` assembles the global arrays. Single-process
    falls through to the plain path.
    """
    from .mesh import pad_batch_to_multiple, shard_batch

    if jax.process_count() == 1:
        if mesh is not None:
            batch = pad_batch_to_multiple(batch, mesh.devices.size)
        return shard_batch(batch, mesh, axis_name)
    batch = pad_batch_to_multiple(batch, mesh.devices.size)
    sizes = {np.shape(v)[0] for v in batch.values() if np.ndim(v) >= 1}
    bs = max(sizes) if sizes else 0
    sl = process_slice(bs)
    local = {k: np.asarray(v)[sl] if (np.ndim(v) >= 1 and np.shape(v)[0] == bs)
             else v for k, v in batch.items()}
    return shard_batch_multihost(local, mesh, axis_name)


def to_host(a) -> np.ndarray:
    """Device array -> host numpy, multi-host safe.

    ``np.asarray`` raises on a global array whose shards live on other
    hosts' devices (batch-sharded step outputs under multi-host); the
    all-gather-to-every-host form is the semantic the stitch/eval writers
    want — each host then owns the full artifact set. Collective: every
    process must call it in the same order (the drivers do — same loop).
    Single-process: plain asarray, zero overhead.
    """
    if jax.process_count() > 1 and hasattr(a, "is_fully_addressable") \
            and not a.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


def shard_batch_multihost(batch: dict, mesh, axis_name: str = "data") -> dict:
    """Place a batch onto a multi-host mesh from per-process local slices.

    ``batch`` holds each process's LOCAL samples (global_batch /
    process_count of them). Fields whose leading axis equals the local batch
    size become global arrays sharded on ``axis_name``; everything else is
    replicated (every process passes identical values).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..data.pipeline import Batch
    from .mesh import batch_sharding, replicated

    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(batch, mesh, axis_name)

    bshard = batch_sharding(mesh, axis_name)
    rshard = replicated(mesh)
    sizes = {np.shape(v)[0] for v in batch.values() if np.ndim(v) >= 1}
    local_bs = max(sizes) if sizes else 0
    out = Batch()
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] == local_bs and local_bs > 0:
            out[k] = jax.make_array_from_process_local_data(bshard, v)
        else:
            out[k] = jax.make_array_from_process_local_data(rshard, v)
    return out
