"""Device meshes and sharding rules.

The reference's distributed runtime is NCCL DDP + DeepSpeed ZeRO-2
(SURVEY.md §2.2). The TPU-native equivalent is declarative: one
`jax.sharding.Mesh` with a data axis (and a latent model axis for future
tensor parallelism), batch sharded over `data`, parameters replicated, and
optimizer state SHARDED over `data` (the ZeRO-2 role) — XLA inserts the
reduce-scatter/all-gather collectives over ICI.

No explicit collectives appear in the training step; they are implied by the
sharding annotations (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """A (data, model) mesh over the given devices (defaults to all).

    The reference only ever data-parallels (SURVEY.md §2.2: TP/PP absent),
    so `model=1` is the parity configuration; the axis exists so task heads
    and future megamodels can shard weights without re-plumbing.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with batch-dim sharding over `data`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), s),
                                  batch)


def zero_state_spec(param_spec: P, shape: tuple, mesh: Mesh) -> P:
    """ZeRO-2-style optimizer-state partition spec for a parameter.

    Shard the largest divisible axis of the state tensor over `data`
    (optimizer moments are elementwise, so any axis partitioning is valid).
    Falls back to replication for small/indivisible tensors.
    """
    ndata = mesh.shape[DATA_AXIS]
    if not shape:
        return P()
    # prefer the largest axis that divides evenly
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % ndata == 0 and shape[i] >= ndata:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()
