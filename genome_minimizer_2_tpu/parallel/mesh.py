"""Device-mesh construction and sharding layouts.

The reference is single-process/single-device (device selection repeated in 8
modules — SURVEY.md §1). Here parallelism is first-class: a
``jax.sharding.Mesh`` over ('data', 'model') axes, with

- **data parallelism**: batches sharded over the 'data' axis; XLA inserts
  psum all-reduces for gradients over ICI,
- **tensor parallelism** (optional): the ~55k-wide gene/feature axis of the
  first encoder layer and last decoder layer sharded over 'model' — the only
  matmuls wide enough to benefit (SURVEY.md §2.3),
- per-host data loading keyed by ``jax.process_index()`` for multi-host pods.

On a single host with one chip the mesh is trivially 1x1 and all shardings
collapse to replication, so the same jitted code runs everywhere.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data=None`` consumes all remaining devices on the data axis. The device
    order follows ``jax.devices()`` so ICI-adjacent chips land on the fastest-
    varying (model) axis.
    """
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        if len(devs) % model:
            raise ValueError(f"{len(devs)} devices not divisible by model={model}")
        data = len(devs) // model
    n = data * model
    grid = np.array(devs[:n]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/sample) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(leaf, sharding: NamedSharding):
    """Place a host (or single-device) array onto a mesh-wide sharding.

    Single-controller: plain ``jax.device_put``. Multi-controller (a real
    pod, ``jax.process_count() > 1``): ``device_put`` cannot target
    non-addressable devices, so build the global array from per-shard
    callbacks over a full host copy — each process materializes only its
    addressable shards. ``leaf`` must hold identical values on every process
    (true for seeded init and replicated train state).
    """
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key):
        data = put_global(np.asarray(jax.random.key_data(leaf)), sharding)
        return jax.random.wrap_key_data(data)
    x = np.asarray(leaf)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def param_sharding(mesh: Mesh, path: str, shape: tuple[int, ...]) -> NamedSharding:
    """Sharding rule for a parameter leaf.

    Tensor-parallel rules (active only when the 'model' axis has >1 devices):
    the wide feature dimension (the gene axis) of the first encoder weight and
    final decoder weight is sharded over 'model'; everything else replicates.
    ``path`` is a '/'-joined pytree path like 'encoder/0/w'.
    """
    if mesh.shape[MODEL_AXIS] == 1:
        return replicated(mesh)
    # endswith: the same rules apply to optimizer moments (mu/nu carry the
    # params tree structure under a chain/adam-state prefix)
    if path.endswith("encoder/0/w"):  # (D, H): shard gene axis (rows)
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    if path.endswith("decoder/3/w"):  # (H, D): shard gene axis (cols)
        return NamedSharding(mesh, P(None, MODEL_AXIS))
    if path.endswith("decoder/3/b"):  # (D,)
        return NamedSharding(mesh, P(MODEL_AXIS))
    return replicated(mesh)
