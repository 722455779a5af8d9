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


def shard_batch(mesh: Mesh, tree, global_batch: int = None):
    """Places a pytree of batched arrays with batch dim sharded over 'data'.

    CONTRACT (identical single- and multi-host): every process passes the
    identical GLOBAL batch (the step-indexed samplers and eval-index
    machinery are deterministic, so all hosts compute the same
    selection). Passing a per-host slice on multi-host would silently
    mis-shard — each host's rows would be re-sliced as if global. Pass
    `global_batch` (the expected leading-dim size) to turn that mistake
    into a loud error; leave it None only for ad-hoc single-host use.

    Single-process this is a device_put with a NamedSharding; multi-host
    each process slices out its local portion and contributes it via
    jax.make_array_from_process_local_data, so the result is one global
    jax.Array spanning all hosts either way.
    """
    if global_batch is not None:
        for leaf in jax.tree.leaves(tree):
            if np.ndim(leaf) >= 1 and np.shape(leaf)[0] != global_batch:
                # ValueError (not assert): this contract check must
                # survive `python -O`, or the mis-sharding it guards
                # against becomes silent again.
                raise ValueError(
                    f"shard_batch expects the GLOBAL batch "
                    f"({global_batch} rows) on every process, got "
                    f"{np.shape(leaf)[0]} — did a caller pass a per-host "
                    f"slice?"
                )
    if jax.process_count() > 1:
        return shard_global_batch(mesh, tree)

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


def shard_global_batch(mesh: Mesh, tree):
    """Multi-host batch ingestion: identical global batch in, global array out.

    Each process passes the SAME full global batch (host numpy); each
    slices out the rows its addressable devices own and contributes them
    via jax.make_array_from_process_local_data. This is the TPU-native
    replacement for the reference's single-host DataParallel scatter
    (reference: run.py:636-644) extended over DCN-connected hosts.
    """
    nproc = jax.process_count()
    pid = jax.process_index()

    def place(x):
        if x is None:
            return None
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        sharding = data_sharded(mesh, rank=x.ndim, axis=0)
        n = x.shape[0]
        assert n % nproc == 0, (
            f"global batch {n} not divisible by {nproc} processes"
        )
        per = n // nproc
        local = x[pid * per : (pid + 1) * per]
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree.map(place, tree)


def maybe_init_multihost(args=None) -> None:
    """Driver entry point for multi-host SPMD.

    Initializes jax.distributed when the user passed --multihost or a
    recognized cluster coordinator environment is present. Must run before
    the first jax device query (drivers call it right after parse_args).
    """
    import os

    want = bool(getattr(args, "multihost", False)) if args is not None else False
    env = any(
        v in os.environ
        for v in (
            "COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if want or env:
        # Explicit topology (clusters without a jax auto-detect plugin,
        # and the 2-process driver-level test): COORDINATOR_ADDRESS plus
        # NFI_NUM_PROCESSES / NFI_PROCESS_ID configure the cluster
        # directly; otherwise jax's environment auto-detection runs.
        kwargs = {}
        addr = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        )
        if addr:
            have_n = "NFI_NUM_PROCESSES" in os.environ
            have_id = "NFI_PROCESS_ID" in os.environ
            if have_n and have_id:
                kwargs = dict(
                    coordinator_address=addr,
                    num_processes=int(os.environ["NFI_NUM_PROCESSES"]),
                    process_id=int(os.environ["NFI_PROCESS_ID"]),
                )
            elif have_n or have_id:
                # A partial explicit topology must NOT fall through to the
                # zero-config probe: initialize_distributed() swallows its
                # failures, and each host would then train an unsynced
                # single-process replica — the exact hazard its docstring
                # warns about.
                missing = "NFI_PROCESS_ID" if have_n else "NFI_NUM_PROCESSES"
                raise ValueError(
                    f"COORDINATOR_ADDRESS={addr} is set with an incomplete "
                    f"explicit topology: {missing} is missing. Set both "
                    "NFI_NUM_PROCESSES and NFI_PROCESS_ID (or neither, to "
                    "use jax's cluster auto-detection)."
                )
        # An explicit coordinator address signals multi-host intent even
        # when the NFI_* topology comes from jax auto-detection — failures
        # are then real misconfigurations, never fall back silently.
        initialize_distributed(_strict=bool(addr), **kwargs)
        if jax.process_count() > 1:
            print(
                f"multihost: process {jax.process_index()}/"
                f"{jax.process_count()}, "
                f"{jax.local_device_count()} local / "
                f"{jax.device_count()} global devices"
            )


def initialize_distributed(_strict: bool = False, **kwargs):
    """Multi-host init (DCN); no-op when running single-process.

    With explicit kwargs (coordinator address etc.) or `_strict=True`
    failures are REAL misconfigurations and must propagate — swallowing
    them would leave each host training an independent, silently-unsynced
    replica. Only the zero-config probe (no cluster environment detected /
    already initialized) is allowed to fall through to single-process
    mode."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if (kwargs or _strict) and "already initialized" not in str(e).lower():
            raise

