"""Checkpoint / resume for the PPO training loop (SURVEY.md §5.4).

The reference has no checkpointing of its own (sb3 owns model zips,
externally). The rebuild checkpoints the full training tuple
``{params, opt_state, env_state, rng_key, step}`` so a run resumes
bit-exactly. Format: NumPy .npz of the path-flattened pytree plus a JSON
sidecar holding the treedef and PRNG-key locations (typed JAX key arrays are
stored via key_data and re-wrapped on restore). An orbax backend
(backend="orbax", orbax.checkpoint.StandardCheckpointer) provides the
production multi-host/async-capable format with the same call surface.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_key_array(leaf) -> bool:
    try:
        return jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def _flatten_with_paths(tree) -> Tuple[Dict[str, np.ndarray], List[str]]:
    flat, key_paths = {}, []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        if _is_key_array(leaf):
            key_paths.append(key)
            leaf = jax.random.key_data(leaf)
        flat[key] = np.asarray(leaf)
    return flat, key_paths


def _treedef_str(tree) -> str:
    """Stable treedef fingerprint: pytree aux data may embed bound methods /
    closures (e.g. flax TrainState.apply_fn, optax transforms) whose reprs
    carry process-specific memory addresses — mask them so a checkpoint
    restores across processes."""
    return re.sub(r"0x[0-9a-f]+", "0x?", str(jax.tree.structure(tree)))


def _strip_prng_keys(tree) -> Tuple[Any, List[str]]:
    """Replace typed PRNG key arrays with raw key_data; return their paths."""
    key_paths = []

    def strip(path, leaf):
        if _is_key_array(leaf):
            key_paths.append("/".join(str(p) for p in path))
            return jax.random.key_data(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(strip, tree), key_paths


def _rewrap_prng_keys(tree, key_paths) -> Any:
    key_paths = set(key_paths)

    def rewrap(path, leaf):
        if "/".join(str(p) for p in path) in key_paths:
            return jax.random.wrap_key_data(jnp.asarray(leaf))
        return leaf

    return jax.tree_util.tree_map_with_path(rewrap, tree)


def save_checkpoint(path: str, tree: Any, step: int = 0, backend: str = "npz") -> str:
    """Save a pytree to `<path>/ckpt_<step>.npz` (+ meta sidecar).

    backend="orbax" writes `<path>/orbax_<step>/` via
    orbax.checkpoint.StandardCheckpointer instead (same meta sidecar; the two
    backends are interchangeable at this call site but not file-compatible).
    """
    if backend == "orbax":
        return _save_orbax(path, tree, step)
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    os.makedirs(path, exist_ok=True)
    flat, key_paths = _flatten_with_paths(tree)
    fname = os.path.join(path, f"ckpt_{step}.npz")
    np.savez(fname, **flat)
    meta = {
        "step": step,
        "treedef": _treedef_str(tree),
        "key_paths": key_paths,
    }
    with open(os.path.join(path, f"ckpt_{step}.meta.json"), "w") as f:
        json.dump(meta, f)
    return fname


def _save_orbax(path: str, tree: Any, step: int) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    stripped, key_paths = _strip_prng_keys(tree)
    dirname = os.path.abspath(os.path.join(path, f"orbax_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dirname, stripped, force=True)
    ckptr.wait_until_finished()
    meta = {"step": step, "treedef": _treedef_str(tree), "key_paths": key_paths}
    with open(os.path.join(path, f"orbax_{step}.meta.json"), "w") as f:
        json.dump(meta, f)
    return dirname


def _restore_orbax(path: str, target: Any, step: int) -> Any:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, f"orbax_{step}.meta.json")) as f:
        meta = json.load(f)
    if meta["treedef"] != _treedef_str(target):
        raise ValueError(
            "checkpoint structure mismatch: "
            f"saved {meta['treedef']} != target {_treedef_str(target)}"
        )
    stripped_target, _ = _strip_prng_keys(target)
    dirname = os.path.abspath(os.path.join(path, f"orbax_{step}"))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(dirname, target=stripped_target)
    return _rewrap_prng_keys(restored, meta.get("key_paths", []))


def latest_step(path: str, backend: str = "npz") -> Optional[int]:
    if not os.path.isdir(path):
        return None
    if backend == "orbax":
        steps = [
            int(f[len("orbax_"):])
            for f in os.listdir(path)
            if f.startswith("orbax_") and not f.endswith(".json")
        ]
    else:
        steps = [
            int(f[len("ckpt_"):-len(".npz")])
            for f in os.listdir(path)
            if f.startswith("ckpt_") and f.endswith(".npz")
        ]
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, target: Any, step: Optional[int] = None, backend: str = "npz"
) -> Tuple[Any, int]:
    """Restore into the structure of `target` (a template pytree).

    Validates the stored treedef matches; PRNG keys are re-wrapped with the
    default impl (threefry2x32).
    """
    if backend not in ("npz", "orbax"):
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if step is None:
        step = latest_step(path, backend=backend)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path!r}")
    if backend == "orbax":
        return _restore_orbax(path, target, step), step
    fname = os.path.join(path, f"ckpt_{step}.npz")
    data = np.load(fname)
    with open(os.path.join(path, f"ckpt_{step}.meta.json")) as f:
        meta = json.load(f)
    if meta["treedef"] != _treedef_str(target):
        raise ValueError(
            "checkpoint structure mismatch: "
            f"saved {meta['treedef']} != target {_treedef_str(target)}"
        )
    key_paths = set(meta.get("key_paths", []))
    paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for path_entry, template_leaf in paths:
        key = "/".join(str(p) for p in path_entry)
        arr = jnp.asarray(data[key])
        tshape = jnp.shape(template_leaf)
        if key not in key_paths and arr.shape != tshape:
            raise ValueError(
                f"checkpoint shape mismatch at {key!r}: "
                f"saved {arr.shape} != target {tshape} "
                "(e.g. restoring into a model/buffer built with different sizes)"
            )
        if key in key_paths:
            arr = jax.random.wrap_key_data(arr)
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves), step
