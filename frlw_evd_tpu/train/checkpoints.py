"""Checkpoint save/load (Orbax) + torch .pth importer.

Reference: core/exp.py:155-210 saves {state_dict, optimizer, epoch}; the
rebuild saves the full TrainState pytree with Orbax plus a small metadata
dict. `import_torch_checkpoint` maps a released FRLW-EvD .pth state_dict onto
the flax parameter tree (name-mapped, conv OIHW→HWIO transposed) so published
checkpoints reproduce their mAP (BASELINE.md north star).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, state, epoch: int, max_score: float) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
    else:  # fallback: flat npz
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        np.savez(path + ".npz", **{
            jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "max_score": max_score}, f)


def load_checkpoint(path: str, state) -> Tuple[Any, int, float]:
    path = os.path.abspath(path)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=tree)
    elif os.path.exists(path + ".npz"):
        data = np.load(path + ".npz")
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        restored_flat = [data[jax.tree_util.keystr(k)] for k, _ in flat]
        restored = jax.tree_util.tree_unflatten(treedef, restored_flat)
    else:
        raise FileNotFoundError(f"no checkpoint at {path}")
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    new_state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=jnp.asarray(restored["step"]))
    return new_state, meta["epoch"] + 1, meta.get("max_score", 0.0)


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

def _convert_tensor(name: str, array: np.ndarray) -> np.ndarray:
    """torch layout → flax layout. Conv weights OIHW → HWIO; depthwise convs
    (O, 1, H, W) → (H, W, 1, O); linear (O, I) → (I, O)."""
    if array.ndim == 4:
        return np.transpose(array, (2, 3, 1, 0))
    if array.ndim == 2:
        return np.transpose(array, (1, 0))
    return array


def _torch_key_to_flax_path(key: str):
    """Map a reference state_dict key to a flax param path.

    Reference model is wrapped as `module.backbone/neck/head....`. Flax module
    names were chosen to mirror the torch attribute names, so the mapping is
    mostly mechanical:
      conv.weight → conv/kernel, bn.weight/bias/running_* → bn/...
      nn.Sequential indices i → the matching named submodule (dark2.0 → conv,
      dark2.k>0 → res_{k-1}; csp m.i → m_{i}; head lists cls_convs.k.j →
      cls_convs_{k}_{j}).
    """
    key = key.removeprefix("module.")
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        out.append(p)
        i += 1
    return out


_BN_MAP = {
    "weight": ("scale", "params"),
    "bias": ("bias", "params"),
    "running_mean": ("mean", "batch_stats"),
    "running_var": ("var", "batch_stats"),
    "num_batches_tracked": (None, None),
}


def import_torch_checkpoint(pth_path: str, params, batch_stats,
                            rename_fn=None, strict: bool = False):
    """Load a torch checkpoint and merge onto (params, batch_stats).

    rename_fn(torch_key) -> flax path tuple or None to skip. The default
    mapping handles the AED family layout produced by our model zoo naming.
    Returns (params, batch_stats, report dict).
    """
    import torch

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    flat_params = _flatten(params)
    flat_bs = _flatten(batch_stats)
    loaded, skipped, missing = [], [], []

    for key, tensor in sd.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        path = rename_fn(key) if rename_fn else default_rename(key)
        if path is None:
            skipped.append(key)
            continue
        collection, tpath = path
        target = flat_params if collection == "params" else flat_bs
        if tpath in target and target[tpath].shape == _convert_tensor(key, arr).shape:
            target[tpath] = jnp.asarray(_convert_tensor(key, arr))
            loaded.append(key)
        else:
            missing.append(key)
            if strict:
                raise KeyError(f"no match for {key} → {tpath}")

    report = {"loaded": len(loaded), "skipped": len(skipped),
              "unmatched": missing}
    return _unflatten(flat_params, params), _unflatten(flat_bs, batch_stats), report


def default_rename(torch_key: str):
    """Default key mapping for the AED detector naming scheme."""
    key = torch_key.removeprefix("module.")
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]

    if leaf == "num_batches_tracked":
        return None

    # BN vs conv leaf naming
    if body and body[-1] == "bn":
        name, coll = _BN_MAP[leaf]
        if name is None:
            return None
        return (coll, tuple(body) + (name,))
    if leaf == "weight":
        leaf = "kernel"
    return ("params", tuple(body) + (leaf,))


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[tuple, Any], like):
    def build(prefix, node):
        if isinstance(node, dict):
            return {k: build(prefix + (k,), v) for k, v in node.items()}
        return flat[prefix]
    return build((), like)
