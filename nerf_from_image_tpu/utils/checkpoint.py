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


def _unwrap_keys(tree: Any) -> Any:
    """Typed PRNG keys -> raw uint32 key data (orbax can't serialize the
    opaque key dtype)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x)
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        )
        else x,
        tree,
    )


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Saves a pytree checkpoint (creates parent dirs)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(_unwrap_keys(state)), force=True)


def load_checkpoint(path: str, template: Optional[Any] = None):
    """Loads a pytree checkpoint; `template` restores exact array types."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item=jax.tree.map(
                        np.asarray, jax.device_get(_unwrap_keys(template))
                    )
                ),
            )
        return ckptr.restore(path)


def load_train_checkpoint(path: str, template: Optional[Any] = None):
    """Loads a training checkpoint, returning (state, key). Handles both the
    bare-state layout and the {'state':..., 'key':...} layout. The key is
    stored as raw uint32 key data and rewrapped here."""
    restored = load_checkpoint(
        path,
        template={
            "state": template,
            "key": jax.random.key_data(jax.random.key(0)),
        }
        if template is not None
        else None,
    )
    if isinstance(restored, dict) and "state" in restored:
        key = restored.get("key")
        if key is not None:
            key = jax.random.wrap_key_data(jax.numpy.asarray(key))
        return restored["state"], key
    return restored, None


def generator_variables_from_checkpoint(restored) -> dict:
    """Extracts EMA generator variables from a restored train checkpoint
    (either layout; orbax restores NamedTuples as dicts/lists)."""
    state = restored.get("state", restored) if isinstance(restored, dict) \
        else restored
    if isinstance(state, dict):
        params_ema = state["params_ema"]
        buffers = state.get("buffers_g", {})
    else:
        params_ema = state.params_ema
        buffers = state.buffers_g
    variables = {"params": params_ema}
    if buffers:
        variables["buffers"] = buffers
    return variables


def latest_checkpoint(directory: str, prefix: str = "checkpoint_"):
    """Finds the newest checkpoint directory under `directory`.

    `checkpoint_latest` (written every eval interval, like the reference's
    checkpoint_latest.pth) wins over numbered milestone checkpoints; the
    best-FID checkpoint is never auto-resumed (reference: run.py:133-143)."""
    if not os.path.isdir(directory):
        return None
    if os.path.isdir(os.path.join(directory, prefix + "latest")):
        return os.path.join(directory, prefix + "latest")
    candidates = [
        d
        for d in os.listdir(directory)
        if d.startswith(prefix) and d[len(prefix):].isdigit()
    ]
    if not candidates:
        return None
    best = max(candidates, key=lambda name: int(name[len(prefix):]))
    return os.path.join(directory, best)


def load_encoder_variables(encoder, path: str, resolution: int = 128):
    """Loads BootstrapEncoder variables from either a reference `.pth`
    (key 'model_coord', DataParallel 'module.' prefixes, reference naming)
    or an orbax checkpoint / experiment directory. Shared by the
    invert / eval_driving / demo_driving drivers."""
    import jax
    import jax.numpy as jnp

    if path.endswith(".pth"):
        from nerf_from_image_tpu.models.encoder import encoder_rename
        from nerf_from_image_tpu.utils import torch_interop

        enc_init = encoder.init(
            jax.random.key(0),
            jnp.zeros((1, resolution, resolution, 3)),
        )
        sd = torch_interop.load_torch_checkpoint(path, key="model_coord")
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        return jax.tree.map(
            jnp.asarray,
            torch_interop.state_dict_to_variables(
                dict(enc_init), sd, rename=encoder_rename
            ),
        )
    return encoder_variables_from_checkpoint(
        load_checkpoint(resolve_checkpoint_path(path))
    )


def resolve_checkpoint_path(path: str) -> str:
    """Resolves a --resume_from value to a loadable checkpoint directory.

    Accepts either a checkpoint directory itself or an experiment directory
    containing checkpoint_* subdirectories, in which case checkpoint_latest
    (or the highest-numbered milestone) is picked — the reference's
    `--resume_from name` convenience (reference: run.py:102-132)."""
    path = _ckpt_dir(path)
    inner = latest_checkpoint(path)
    return inner if inner is not None else path


def encoder_variables_from_checkpoint(restored) -> dict:
    """Extracts BootstrapEncoder variables from a coord-regressor training
    checkpoint (CoordTrainState — orbax restores it as a dict with
    params/opt_state/iteration entries) or from raw saved variables."""
    state = restored.get("state", restored) if isinstance(restored, dict) \
        else restored
    if isinstance(state, dict):
        params = state.get("params", state)
    else:
        params = state.params
    return {"params": params}
