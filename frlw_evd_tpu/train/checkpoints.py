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

# Async checkpointing. Crash-safety contract: saves go to VERSIONED
# directories (<path>__v<epoch>) so the previous committed checkpoint is
# never deleted before its replacement is durable (Orbax force=True rmtree's
# the destination synchronously before the background write). meta.json is
# written only AFTER the commit is durable (at the next wait/flush) and names
# the directory it refers to; stale versions are pruned at the same point.
_async_ckptrs: Dict[str, Any] = {}   # one per target path → concurrent saves
_pending_finalize = []               # (ckptr, meta_path, meta, keep_dirs)


def _get_async_checkpointer(path: str):
    if path not in _async_ckptrs:
        _async_ckptrs[path] = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())
    return _async_ckptrs[path]


def _flush_finalizers() -> None:
    global _pending_finalize
    pending, _pending_finalize = _pending_finalize, []
    for ckptr, meta_path, meta, prune_prefix, keep_dir in pending:
        ckptr.wait_until_finished()   # re-raises stored background errors
        if meta_path is not None:
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        if prune_prefix is not None:
            import shutil

            parent = os.path.dirname(prune_prefix)
            base = os.path.basename(prune_prefix)
            for name in os.listdir(parent):
                full = os.path.join(parent, name)
                if (name.startswith(base + "__v") and full != keep_dir
                        and os.path.isdir(full)):
                    shutil.rmtree(full, ignore_errors=True)


def wait_for_checkpoints() -> None:
    """Block until in-flight async saves are durable, surface any background
    save errors, publish their meta files and prune stale versions."""
    _flush_finalizers()
    for ckptr in _async_ckptrs.values():
        ckptr.wait_until_finished()


def save_checkpoint(path: str, state, epoch: int, max_score: float,
                    use_async: bool = True) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if _HAS_ORBAX:
        if use_async:
            _flush_finalizers()        # publish + error-check previous save
            vdir = f"{path}__v{epoch}"
            ckptr = _get_async_checkpointer(path)
            ckptr.save(vdir, tree, force=True)
            _pending_finalize.append((
                ckptr, path + ".meta.json",
                {"epoch": epoch, "max_score": max_score, "dir": vdir},
                path, vdir))
            return
        ocp.PyTreeCheckpointer().save(path, tree, force=True)
    else:  # fallback: flat npz
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        np.savez(path + ".npz", **{
            jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "max_score": max_score}, f)


def load_checkpoint(path: str, state) -> Tuple[Any, int, float]:
    wait_for_checkpoints()
    path = os.path.abspath(path)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    restore_dir = (meta or {}).get("dir", path)
    if _HAS_ORBAX and os.path.isdir(restore_dir):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(restore_dir, item=tree)
    elif os.path.exists(path + ".npz"):
        data = np.load(path + ".npz")
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        restored_flat = [data[jax.tree_util.keystr(k)] for k, _ in flat]
        restored = jax.tree_util.tree_unflatten(treedef, restored_flat)
    else:
        raise FileNotFoundError(
            f"no checkpoint at {path}" + (
                f" (meta points at missing {restore_dir})"
                if meta is not None and restore_dir != path else ""))
    if meta is None:
        raise FileNotFoundError(f"no checkpoint metadata at {path}.meta.json")
    new_state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=jnp.asarray(restored["step"]))
    return new_state, meta["epoch"] + 1, meta.get("max_score", 0.0)


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

def _convert_tensor(name: str, array: np.ndarray) -> np.ndarray:
    """torch layout → flax layout. Conv weights OIHW → HWIO; linear (O, I) →
    (I, O); weight-norm g (O, 1, 1, 1) → (O,)."""
    if name.endswith("weight_g"):
        return array.reshape(-1)
    if array.ndim == 4:
        return np.transpose(array, (2, 3, 1, 0))
    if array.ndim == 2:
        return np.transpose(array, (1, 0))
    return array




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


_DEPTH2BLOCKS = {21: [1, 2, 2, 1], 53: [2, 8, 8, 4]}


def _map_sequential(module: str, idx: int, depth: int = 21):
    """Reference nn.Sequential index → our named submodule.

    dark2..dark4: [BaseConv, ResLayer*n] → conv / res_{i-1}.
    dark5: [BaseConv, ResLayer*n, conv1, conv2, SPP, conv3, conv4]
      → (dark5_group, conv/res_{i}) then (dark5_spp, conv1..4/spp).
    """
    blocks = dict(zip(["dark2", "dark3", "dark4", "dark5"],
                      _DEPTH2BLOCKS[depth]))
    if module in ("dark2", "dark3", "dark4"):
        return (module, "conv") if idx == 0 else (module, f"res_{idx - 1}")
    if module == "dark5":
        n = blocks["dark5"]
        if idx == 0:
            return ("dark5_group", "conv")
        if idx <= n:
            return ("dark5_group", f"res_{idx - 1}")
        spp_names = ["conv1", "conv2", "spp", "conv3", "conv4"]
        return ("dark5_spp", spp_names[idx - n - 1])
    return (module, str(idx))


def default_rename(torch_key: str, depth: int = 21):
    """Reference AED state_dict key → (collection, flax path tuple).

    Handles: Focus/BFM stems (incl. weight_norm weight_g/weight_v), the
    Darknet Sequential groups, CSP m.<i> lists, PAFPN names (1:1), and the
    head's stems/cls_convs/reg_convs/{cls,reg,obj}_preds ModuleLists.
    Returns None for keys without a flax counterpart (num_batches_tracked).
    """
    key = torch_key.removeprefix("module.")
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]

    if leaf == "num_batches_tracked":
        return None

    out = []
    i = 0
    while i < len(body):
        p = body[i]
        # darknet sequential groups
        if p in ("dark2", "dark3", "dark4", "dark5") and i + 1 < len(body)                 and body[i + 1].isdigit():
            mod, sub = _map_sequential(p, int(body[i + 1]), depth)
            out.extend([mod, sub])
            i += 2
            continue
        # CSP bottleneck list m.<i> → m_<i>
        if p == "m" and i + 1 < len(body) and body[i + 1].isdigit():
            out.append(f"m_{body[i + 1]}")
            i += 2
            continue
        # head ModuleLists: stems.0 → stems_0; cls_convs.0.1 → cls_convs_0_1
        if p in ("stems", "cls_preds", "reg_preds", "obj_preds")                 and i + 1 < len(body) and body[i + 1].isdigit():
            out.append(f"{p}_{body[i + 1]}")
            i += 2
            continue
        if p in ("cls_convs", "reg_convs") and i + 2 < len(body)                 and body[i + 1].isdigit() and body[i + 2].isdigit():
            out.append(f"{p}_{body[i + 1]}_{body[i + 2]}")
            i += 3
            continue
        # BFM weight-norm conv list convs.<i> → convs_<i>
        if p == "convs" and i + 1 < len(body) and body[i + 1].isdigit():
            out.append(f"convs_{body[i + 1]}")
            i += 2
            continue
        out.append(p)
        i += 1

    # leaves
    if body and body[-1] == "bn":
        name, coll = _BN_MAP[leaf]
        if name is None:
            return None
        return (coll, tuple(out) + (name,))
    if leaf == "weight_g":
        return ("params", tuple(out) + ("g",))
    if leaf == "weight_v":
        return ("params", tuple(out) + ("v",))
    if leaf == "weight":
        leaf = "kernel"
    return ("params", tuple(out) + (leaf,))


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


# ---------------------------------------------------------------------------
# transfer learning (reference core/exp.py:178-210)
# ---------------------------------------------------------------------------

def save_part_checkpoints(path_prefix: str, state,
                          use_async: bool = True) -> None:
    """Also write per-part checkpoints for transfer (<name>_backbone /
    <name>_neck, reference saveCheckpoint:204-210). Async by default —
    per-path checkpointers let both parts overlap the next epoch; these are
    transfer artifacts with no meta pointer, so a crash mid-write only loses
    the part file itself."""
    for part in ("backbone", "neck"):
        if part not in state.params:
            continue
        tree = {"params": state.params[part],
                "batch_stats": state.batch_stats.get(part, {})}
        part_path = os.path.abspath(path_prefix + f"_{part}")
        if _HAS_ORBAX:
            if use_async:
                _get_async_checkpointer(part_path).save(
                    part_path, tree, force=True)
            else:
                ocp.PyTreeCheckpointer().save(part_path, tree, force=True)
        else:
            flat, _ = jax.tree_util.tree_flatten_with_path(tree)
            np.savez(part_path + ".npz", **{
                jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})


def load_pretrained_backbone(path: str, state):
    """Load a backbone part checkpoint onto the state (loadPretrained,
    core/exp.py:178-193 — whose `requries_grad` typo silently skipped the
    freeze; pair with `freeze_backbone_tx` to actually freeze)."""
    wait_for_checkpoints()
    part_path = os.path.abspath(path)
    tree = {"params": state.params["backbone"],
            "batch_stats": state.batch_stats.get("backbone", {})}
    if _HAS_ORBAX and os.path.isdir(part_path):
        restored = ocp.PyTreeCheckpointer().restore(part_path, item=tree)
    elif os.path.exists(part_path + ".npz"):
        data = np.load(part_path + ".npz")
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        restored = jax.tree_util.tree_unflatten(
            treedef, [data[jax.tree_util.keystr(k)] for k, _ in flat])
    else:
        raise FileNotFoundError(f"no checkpoint found at '{path}'")
    params = dict(state.params)
    params["backbone"] = restored["params"]
    batch_stats = dict(state.batch_stats)
    batch_stats["backbone"] = restored["batch_stats"]
    return state.replace(params=params, batch_stats=batch_stats)


def freeze_backbone_tx(tx, params):
    """Wrap an optax transform so backbone params receive zero updates — the
    working version of the reference's intended freeze."""
    import optax

    def label(tree):
        return {k: ("frozen" if k == "backbone" else "trainable")
                for k in tree}

    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, label(params))
