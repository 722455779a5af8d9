"""Host/process environment setup that must run BEFORE jax is imported.

Import-light on purpose (stdlib only): drivers call `prepare_xla_flags()`
above their `import jax` line.
"""

import os


def prepare_xla_flags():
    """Hardens XLA_FLAGS for host-CPU mesh runs.

    XLA:CPU's collective rendezvous has a stuck-detector that LOG(FATAL)s
    the whole process when participant threads don't arrive within the
    default budget ("Termination timeout ... exceeded. Exiting to ensure a
    consistent program state"). With N virtual devices time-sharing a small
    host the default flakes under load; raise it far beyond any real
    deadlock window. No-op for flags the caller already set.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "collective_call_terminate" not in flags:
        flags = (
            flags
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
            + " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
        ).strip()
    os.environ["XLA_FLAGS"] = flags
