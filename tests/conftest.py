"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere; this makes multi-chip
sharding tests (parallel/) executable without TPU hardware, and keeps golden
comparisons against the fp32 PyTorch reference numerically strict.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "collective_call_terminate" not in xla_flags:
    # XLA:CPU's collective rendezvous has a stuck-detector that LOG(FATAL)s
    # the whole process when participant threads don't arrive in time
    # ("Termination timeout ... exceeded. Exiting to ensure a consistent
    # program state"). With 8 virtual devices time-sharing a small host the
    # default budget flakes under load — raise it far beyond any real
    # deadlock window.
    xla_flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
    )
os.environ["XLA_FLAGS"] = xla_flags

# The environment may pin JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize
# before conftest runs; override explicitly — tests must run on the local
# 8-device CPU mesh, not over the device tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_PATH = os.environ.get("NFI_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def import_reference_module(name: str):
    """Imports a module from the PyTorch reference repo as a golden oracle.

    The reference is used strictly as a black-box numerical oracle in tests;
    the framework itself never imports it.
    """
    import importlib

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return importlib.import_module(name)
