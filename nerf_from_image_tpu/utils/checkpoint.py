"""Checkpoint save/resume via orbax.

Replaces the reference's torch.save dicts (reference: run.py:1475-1516,
lib/utils.py:23-113). The full train state — generator/discriminator params,
both optimizer states, EMA, iteration, ppl running average, ADA p, and the
PRNG key — is one pytree, so save/restore is exact by construction (the
reference needs bespoke RNG-state plumbing per device; a JAX key tree is
already reproducible state).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Saves a pytree checkpoint (creates parent dirs)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, template: Optional[Any] = None):
    """Loads a pytree checkpoint; `template` restores exact array types."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item=jax.tree.map(np.asarray, jax.device_get(template))
                ),
            )
        return ckptr.restore(path)


def latest_checkpoint(directory: str, prefix: str = "checkpoint_"):
    """Finds the newest checkpoint directory under `directory`."""
    if not os.path.isdir(directory):
        return None
    candidates = [
        d for d in os.listdir(directory) if d.startswith(prefix)
    ]
    if not candidates:
        return None

    def step_of(name):
        tail = name[len(prefix):]
        return int(tail) if tail.isdigit() else -1

    best = max(candidates, key=step_of)
    return os.path.join(directory, best)
