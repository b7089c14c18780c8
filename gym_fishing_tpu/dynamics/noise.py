"""Process-noise models (ORACLE_SEMANTICS.md step 4).

The reference applies multiplicative process noise inside `population_draw`
(reference: gym_fishing/envs/base_fishing_env.py; reconstructed). Two forms
exist across reference variants and both are implemented behind the
`noise_form` flag (SURVEY.md §2.3 marks the exact form TBV):

- additive:   x2 = mu + sigma * x1 * xi      (noise scales with post-harvest
                                              stock x1; ~lognormal for small
                                              sigma)
- lognormal:  x2 = mu * exp(sigma * xi)      (exactly lognormal; no mean
                                              correction)

`xi ~ N(0, 1)` is injected, never drawn here — that keeps the dynamics core
deterministic and lets the exactness harness drive engine and oracle with an
identical noise stream (SURVEY.md §7.4).
"""

from __future__ import annotations

import jax.numpy as jnp

from gym_fishing_tpu.core.types import EnvParams


def apply_process_noise(form: str, p: EnvParams, mu, x1, xi):
    if form == "additive":
        return mu + p.sigma * x1 * xi
    if form == "lognormal":
        return mu * jnp.exp(p.sigma * xi)
    raise ValueError(f"unknown noise form {form!r}")
