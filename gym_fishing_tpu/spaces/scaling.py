"""Observation/action affine scaling and action decode/encode.

Implements the reference's `get_obs` / `get_fish_population` / `get_quota` /
`get_action` maps (reference: gym_fishing/envs/base_fishing_env.py and
fishing_cts_env.py; reconstructed — ORACLE_SEMANTICS.md pins every form):

- obs      = clip(measured / K - 1, -1, 1)         (so x in [0, 2K] -> [-1, 1])
- inverse  x = K * (obs + 1)
- continuous quota   = (clip(a,-1,1) + 1) * K * action_scale
- proportional quota = a / n_actions * K
- relative (3-action): candidate harvest h * {1.0, 1.2, 0.8}[a]

Everything is branch-free (gather/select, no lax.cond) so it vectorizes on the
VPU under vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from gym_fishing_tpu.core.types import RELATIVE_MULTIPLIERS, EnvConfig, EnvParams


def obs_from_stock(p: EnvParams, measured):
    """Measured stock -> observation in [-1, 1], shape (..., 1)."""
    obs = jnp.clip(measured / p.K - 1.0, -1.0, 1.0)
    return obs[..., None]


def stock_from_obs(p: EnvParams, obs):
    """Inverse scaling: observation -> (measured) stock."""
    return p.K * (jnp.squeeze(obs, axis=-1) + 1.0)


def decode_action(cfg: EnvConfig, p: EnvParams, carried_harvest, action):
    """Action -> (quota, new carried harvest). Branch-free per scheme.

    The scheme is static (EnvConfig) so only the selected branch is traced.
    """
    if cfg.scheme == "continuous":
        # Continuous actions have trailing shape (1,) (Box(-1, 1, (1,))).
        a = jnp.clip(action[..., 0], -1.0, 1.0)
        quota = (a + 1.0) * p.K * p.action_scale
        return quota, carried_harvest
    if cfg.scheme == "proportional":
        a = action.astype(jnp.result_type(p.K))
        quota = a / cfg.n_actions * p.K
        return quota, carried_harvest
    if cfg.scheme == "relative":
        mult = jnp.asarray(RELATIVE_MULTIPLIERS, dtype=jnp.result_type(carried_harvest))
        h = carried_harvest * mult[action]
        return h, h
    raise ValueError(f"unknown decode scheme {cfg.scheme!r}")


def encode_action(cfg: EnvConfig, p: EnvParams, carried_harvest, quota):
    """Inverse decode (`get_action`): desired quota -> action."""
    if cfg.scheme == "continuous":
        a = jnp.clip(quota / (p.K * p.action_scale) - 1.0, -1.0, 1.0)
        return a[..., None]
    if cfg.scheme == "proportional":
        a = jnp.round(quota * cfg.n_actions / p.K).astype(jnp.int32)
        return jnp.clip(a, 0, cfg.n_actions - 1)
    if cfg.scheme == "relative":
        mult = jnp.asarray(RELATIVE_MULTIPLIERS, dtype=jnp.result_type(carried_harvest))
        cands = carried_harvest[..., None] * mult
        return jnp.argmin(jnp.abs(cands - quota[..., None]), axis=-1).astype(jnp.int32)
    raise ValueError(f"unknown decode scheme {cfg.scheme!r}")
