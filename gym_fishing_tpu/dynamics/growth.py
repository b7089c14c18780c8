"""Pure stock-recruitment growth functions (JAX, branch-free, vmap-safe).

Equations per ORACLE_SEMANTICS.md / SURVEY.md §2.3 (reference:
gym_fishing/envs/base_fishing_env.py `population_draw` and the growth-model
subclasses; reconstructed — reference mount empty).

Every function maps (params, post-harvest stock x) -> deterministic next
stock, elementwise, with no data-dependent control flow, so the whole family
fuses into a single XLA/Pallas kernel under jit+vmap.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from gym_fishing_tpu.core.types import EnvParams


def logistic(p: EnvParams, x):
    return x + p.r * x * (1.0 - x / p.K)


def ricker(p: EnvParams, x):
    return x * jnp.exp(p.r * (1.0 - x / p.K))


def beverton_holt(p: EnvParams, x):
    return p.A * x / (1.0 + p.B * x)


def allen(p: EnvParams, x):
    return x * jnp.exp(p.r * (1.0 - x / p.K) * (x - p.C) / p.K)


def myers(p: EnvParams, x):
    xt = x**p.theta
    return p.r * xt / (1.0 + xt / p.K)


def may(p: EnvParams, x):
    xq = x**p.q
    return x + p.r * x * (1.0 - x / p.K) - p.a * xq / (xq + p.b**p.q)


GROWTH_FNS: Dict[str, Callable] = {
    "logistic": logistic,
    "ricker": ricker,
    "beverton_holt": beverton_holt,
    "allen": allen,
    "myers": myers,
    "may": may,
}


def get_growth_fn(name: str) -> Callable:
    try:
        return GROWTH_FNS[name]
    except KeyError:
        raise ValueError(f"unknown growth model {name!r}; known: {sorted(GROWTH_FNS)}")
