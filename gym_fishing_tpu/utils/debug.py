"""Debug-mode invariants: RNG key-uniqueness + divergence checks (SURVEY.md §5.2).

SPMD lockstep has no data races by construction; the real hazards in this
engine are (a) reusing a JAX key for two different draws and (b) cross-host
state divergence. These helpers are cheap enough to run in tests and debug
jobs, and are no-ops in the hot path unless explicitly called.
"""

from __future__ import annotations

import jax
import numpy as np


def assert_unique_keys(keys: jax.Array, name: str = "keys") -> None:
    """Host-side check that a batch of PRNG keys contains no duplicates."""
    data = np.asarray(jax.random.key_data(keys)).reshape(keys.shape[0] if keys.ndim else 1, -1)
    uniq = np.unique(data, axis=0)
    if uniq.shape[0] != data.shape[0]:
        raise AssertionError(
            f"{name}: {data.shape[0] - uniq.shape[0]} duplicate PRNG keys — "
            "key reuse produces correlated env instances"
        )


def trajectory_checksum(tree) -> float:
    """Order-independent scalar digest of a pytree (for cross-host compares)."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) or np.issubdtype(arr.dtype, np.integer):
            total += float(np.sum(arr.astype(np.float64)))
    return total


def assert_finite(tree, name: str = "tree") -> None:
    """Raise if any float leaf contains NaN/Inf (post-update sanity gate)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(np.isfinite(arr)):
            key = "/".join(str(p) for p in path)
            raise AssertionError(f"{name}.{key} contains non-finite values")
