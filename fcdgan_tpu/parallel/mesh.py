"""Device mesh + sharding rules — the framework's distributed backend.

The reference has no distributed layer at all (single pinned CUDA device,
SURVEY.md section 2g). Here scaling is mesh-native: a 1-D ``data`` mesh over
the chips (v5e-8's 8 chips over ICI), batches sharded on the batch axis,
parameters replicated, and XLA/GSPMD inserting the collectives (gradient
all-reduce, cross-replica BatchNorm statistics, confusion-matrix reduction)
from sharding annotations alone — the "pick a mesh, annotate shardings, let
XLA insert collectives" recipe. Train steps stay pure jitted functions; no
per-step communication code.

Multi-host (DCN) extension point: call ``jax.distributed.initialize`` before
:func:`make_mesh` and the same annotations scale across hosts."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh], axis_name: str = "data") -> dict:
    """Place a host batch onto the mesh, batch axis split across chips.

    With mesh=None this is a plain single-device put. Scalar/1-D fields whose
    leading axis equals the batch size are sharded too; anything else is
    replicated."""
    from ..data.pipeline import Batch

    if mesh is None:
        return Batch({k: jax.device_put(v) for k, v in batch.items()})
    bshard = batch_sharding(mesh, axis_name)
    rshard = replicated(mesh)
    sizes = {np.shape(v)[0] for v in batch.values() if np.ndim(v) >= 1}
    bs = max(sizes) if sizes else 0
    out = Batch()
    for k, v in batch.items():
        if np.ndim(v) >= 1 and np.shape(v)[0] == bs and bs % mesh.devices.size == 0:
            out[k] = jax.device_put(v, bshard)
        else:
            out[k] = jax.device_put(v, rshard)
    return out


def replicate_state(state, mesh: Optional[Mesh]):
    """Replicate a pytree (model/optimizer state) across the mesh."""
    if mesh is None:
        return jax.device_put(state)
    return jax.device_put(state, replicated(mesh))


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Wrap-pad all batch-axis fields (weight 0) so the batch divides the mesh."""
    import numpy as np

    from ..data.pipeline import Batch

    w = batch["weight"]
    bs = len(w)
    rem = bs % multiple
    if rem == 0:
        return batch
    extra = multiple - rem
    out = Batch()
    for k, v in batch.items():
        v = np.asarray(v)
        reps = np.resize(np.arange(bs), extra)
        out[k] = np.concatenate([v, v[reps]], axis=0)
    out["weight"] = np.concatenate([np.asarray(w), np.zeros(extra, np.float32)])
    return out
