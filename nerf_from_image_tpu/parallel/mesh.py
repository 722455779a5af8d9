"""Device mesh construction and sharding rules.

The reference's entire parallelism story is single-process nn.DataParallel
over local GPUs (reference: run.py:636-644, SURVEY §2.10). The TPU-native
replacement is SPMD: one jax.sharding.Mesh with a 'data' axis (batch items /
rays) and an optional 'model' axis (reserved for tensor-parallel triplane
synthesis at very large configs), NamedShardings on the batch dims, and
XLA-emitted psum over ICI for gradient all-reduce — overlapped with the
backward pass by the XLA scheduler, no explicit collectives in user code.

Multi-host: call `initialize_distributed()` (jax.distributed) before mesh
construction; data sharding then spans DCN-connected hosts transparently.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a [data, model] mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 4, axis: int = 0) -> NamedSharding:
    """Shards dim `axis` of a rank-`rank` array over the data axis."""
    spec = [None] * rank
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree):
    """Places a pytree of batched arrays with batch dim sharded over 'data'."""

    def place(x):
        if x is None:
            return None
        return jax.device_put(
            x, data_sharded(mesh, rank=np.ndim(x), axis=0)
        )

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicates a pytree (e.g. model params) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if x is not None else None, tree
    )


def initialize_distributed(**kwargs):
    """Multi-host init (DCN); no-op when running single-process.

    With explicit kwargs (coordinator address etc.) failures are REAL
    misconfigurations and must propagate — swallowing them would leave
    each host training an independent, silently-unsynced replica. Only the
    zero-config probe (no cluster environment detected / already
    initialized) is allowed to fall through to single-process mode."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if kwargs and "already initialized" not in str(e).lower():
            raise

