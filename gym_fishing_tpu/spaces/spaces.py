"""Minimal jit-safe action/observation spaces.

The reference uses `gym.spaces.Box` / `gym.spaces.Discrete` (reference:
gym_fishing/envs/base_fishing_env.py __init__; reconstructed). We provide a
dependency-free equivalent whose `sample` takes an explicit JAX key (so
sampling composes with jit/vmap) and whose bounds are plain numpy — the
"gym spaces -> jit-safe bounds mapping" of BASELINE.json.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    low: float
    high: float
    shape: Tuple[int, ...] = (1,)
    dtype: np.dtype = np.float32

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.uniform(
            key, self.shape, minval=self.low, maxval=self.high
        ).astype(self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            x.shape == self.shape and np.all(x >= self.low) and np.all(x <= self.high)
        )


@dataclasses.dataclass(frozen=True)
class Discrete:
    n: int
    dtype: np.dtype = np.int32
    shape: Tuple[int, ...] = ()

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (), 0, self.n, dtype=jnp.int32)

    def contains(self, x) -> bool:
        x = int(np.asarray(x))
        return 0 <= x < self.n
