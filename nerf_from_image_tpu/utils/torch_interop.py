"""PyTorch checkpoint interop: state-dict -> flax variable trees.

The released reference checkpoints (EMA generator, discriminator, SegFormer
encoder; reference run.py:1475-1516 for the saved dict layout) are plain
torch state dicts. Our module trees mirror the reference attribute names, so
conversion is a mechanical walk of the flax variable tree fetching the
matching torch key, with a tiny rename table for the few structural
differences. Weights are stored in torch layouts (OIHW convs, [out, in]
linears) on the JAX side, so no tensor re-layout is needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np


def _default_rename(path: str) -> str:
    """Maps a flax param path (dot-joined) to a torch state-dict key."""
    replacements = [
        ("mapping_network.", "mapping_network.backbone."),
        ("net_0", "net.0"),
        ("net_2", "net.2"),
        ("viewdir_output", "viewdir_mapper.output"),
        (".embedding", ".weight"),  # nn.Embed
    ]
    for old, new in replacements:
        path = path.replace(old, new)
    # ResidualEncoder instance norms: norm3_weight -> norm3.weight
    parts = path.split(".")
    last = parts[-1]
    for norm_suffix in ("_weight", "_bias"):
        if last.endswith(norm_suffix) and last.startswith("norm"):
            parts[-1] = last[: -len(norm_suffix)] + "." + norm_suffix[1:]
            path = ".".join(parts)
    return path


def state_dict_to_variables(
    variables: Dict[str, Any],
    state_dict: Dict[str, "np.ndarray"],
    rename: Callable[[str], str] = _default_rename,
    prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """Fills a flax variable tree with tensors from a torch state dict.

    Args:
      variables: flax variables as returned by module.init (collections
        'params' and optionally 'buffers').
      state_dict: flat dict of torch parameter/buffer names -> numpy arrays.
      rename: path-translation hook.
      prefix: optional torch-side key prefix to strip/add.
      strict: raise on missing keys (otherwise keep initialized values).

    Returns:
      A new variable tree with converted weights (numpy arrays — callers
      jax.device_put as needed).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    def fill(tree, path_parts: List[str]):
        if isinstance(tree, dict):
            return {
                k: fill(v, path_parts + [k]) for k, v in tree.items()
            }
        flax_path = ".".join(path_parts)
        torch_key = prefix + rename(flax_path)
        if torch_key in sd:
            used.add(torch_key)
            val = sd[torch_key]
            want = tuple(np.shape(tree))
            if tuple(val.shape) != want:
                if val.size == int(np.prod(want)):
                    val = val.reshape(want)
                else:
                    raise ValueError(
                        f"Shape mismatch for {torch_key}: torch {val.shape} "
                        f"vs flax {want}"
                    )
            return val.astype(np.asarray(tree).dtype)
        if strict:
            raise KeyError(f"No torch key for flax param {flax_path} "
                           f"(tried {torch_key})")
        return tree

    out = {}
    for collection, tree in variables.items():
        out[collection] = fill(tree, [])

    leftovers = [
        k
        for k in sd
        if k not in used and not k.endswith("resample_filter")
    ]
    if strict and leftovers:
        raise KeyError(f"Unconsumed torch keys ({len(leftovers)}): "
                       f"{leftovers[:8]}...")
    return out


def torch_module_state_to_numpy(module) -> Dict[str, "np.ndarray"]:
    """Extracts a torch module's state dict as numpy (test-time helper)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def load_torch_checkpoint(path: str, key: Optional[str] = None):
    """Loads a torch .pth checkpoint file to numpy state dicts.

    The reference saves dicts like {'model_ema': sd, 'model': sd, ...}
    (reference: run.py:1475-1516); `key` selects one entry.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        ckpt = ckpt[key]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}
