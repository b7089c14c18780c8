"""NumPy float64 oracle for the gym_fishing dynamics.

This is the correctness anchor for the whole framework (SURVEY.md §7.2 step 1):
a deliberately eager, scalar, float64 re-implementation of the reference
`gym_fishing` environment semantics (reference: gym_fishing/envs/
base_fishing_env.py — step/harvest_draw/population_draw; reconstructed, see
ORACLE_SEMANTICS.md since the reference mount is empty).

It intentionally shares **no code** with the JAX engine. Exactness tests drive
both through the injected-noise step (`step_xi`) with identical N(0,1) draws,
sidestepping the NumPy-MT19937 vs JAX-threefry mismatch (SURVEY.md §7.4).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

GROWTH_MODELS = ("logistic", "ricker", "beverton_holt", "allen", "myers", "may")
MIXTURE = "mixture"  # per-episode model uncertainty: growth chosen by model_idx
NOISE_FORMS = ("additive", "lognormal")
DECODE_SCHEMES = ("continuous", "proportional", "relative")

# Relative (3-action) scheme multipliers: maintain / +20% / -20%.
RELATIVE_MULTIPLIERS = (1.0, 1.2, 0.8)


@dataclasses.dataclass
class OracleConfig:
    """All dynamics parameters, pinned per ORACLE_SEMANTICS.md."""

    growth: str = "logistic"
    noise_form: str = "additive"
    scheme: str = "continuous"

    r: float = 0.3
    r_drift: float = 0.0  # effective r at step t = r + r_drift * t
    K: float = 1.0
    sigma: float = 0.05
    sigma_m: float = 0.0
    price: float = 1.0
    cost: float = 0.0
    init_state: float = 0.75
    init_harvest: float = 0.0125
    Tmax: int = 100
    n_actions: int = 3
    action_scale: float = 1.0

    # beverton_holt
    A: float = 1.5
    B: float = 0.5
    # allen (Allee threshold)
    C: float = 0.2
    # myers
    theta: float = 2.0
    # may
    a: float = 0.175
    b: float = 0.1
    q: float = 2.0
    # mixture (model-uncertainty) variant: index into GROWTH_MODELS
    model_idx: int = 0
    # penalty on the collapse step (TBV -> pinned default 0)
    collapse_penalty: float = 0.0

    def __post_init__(self) -> None:
        if self.growth not in GROWTH_MODELS + (MIXTURE,):
            raise ValueError(f"unknown growth model {self.growth!r}")
        if self.noise_form not in NOISE_FORMS:
            raise ValueError(f"unknown noise form {self.noise_form!r}")
        if self.scheme not in DECODE_SCHEMES:
            raise ValueError(f"unknown decode scheme {self.scheme!r}")


@dataclasses.dataclass
class OracleState:
    stock: float
    harvest: float
    t: int


def reset(cfg: OracleConfig) -> OracleState:
    return OracleState(stock=float(cfg.init_state), harvest=float(cfg.init_harvest), t=0)


def growth(cfg: OracleConfig, x: float) -> float:
    """Deterministic stock-recruitment update (ORACLE_SEMANTICS.md table)."""
    if cfg.growth == MIXTURE:
        cfg = dataclasses.replace(cfg, growth=GROWTH_MODELS[cfg.model_idx])
    r, K = cfg.r, cfg.K
    if cfg.growth == "logistic":
        return x + r * x * (1.0 - x / K)
    if cfg.growth == "ricker":
        return x * math.exp(r * (1.0 - x / K))
    if cfg.growth == "beverton_holt":
        return cfg.A * x / (1.0 + cfg.B * x)
    if cfg.growth == "allen":
        return x * math.exp(r * (1.0 - x / K) * (x - cfg.C) / K)
    if cfg.growth == "myers":
        xt = x**cfg.theta
        return r * xt / (1.0 + xt / K)
    if cfg.growth == "may":
        xq = x**cfg.q
        return x + r * x * (1.0 - x / K) - cfg.a * xq / (xq + cfg.b**cfg.q)
    raise AssertionError(cfg.growth)


def decode(cfg: OracleConfig, state: OracleState, action) -> Tuple[float, float]:
    """Action -> (quota, new carried harvest)."""
    if cfg.scheme == "continuous":
        a = float(np.asarray(action).reshape(()))
        a = min(max(a, -1.0), 1.0)
        quota = (a + 1.0) * cfg.K * cfg.action_scale
        return quota, state.harvest  # carried harvest updated to realized later
    if cfg.scheme == "proportional":
        a = int(np.asarray(action).reshape(()))
        quota = a / cfg.n_actions * cfg.K
        return quota, state.harvest
    if cfg.scheme == "relative":
        a = int(np.asarray(action).reshape(()))
        h = state.harvest * RELATIVE_MULTIPLIERS[a]
        return h, h
    raise AssertionError(cfg.scheme)


def get_action(cfg: OracleConfig, state: OracleState, quota: float):
    """Inverse decode: desired quota -> action (used by baseline policies)."""
    if cfg.scheme == "continuous":
        a = quota / (cfg.K * cfg.action_scale) - 1.0
        return np.asarray([min(max(a, -1.0), 1.0)], dtype=np.float64)
    if cfg.scheme == "proportional":
        a = int(round(quota * cfg.n_actions / cfg.K))
        return min(max(a, 0), cfg.n_actions - 1)
    if cfg.scheme == "relative":
        cands = [state.harvest * m for m in RELATIVE_MULTIPLIERS]
        return int(np.argmin([abs(c - quota) for c in cands]))
    raise AssertionError(cfg.scheme)


def get_obs(cfg: OracleConfig, x: float, eta: float = 0.0) -> np.ndarray:
    m = x * math.exp(cfg.sigma_m * eta) if cfg.sigma_m > 0.0 else x
    obs = m / cfg.K - 1.0
    return np.asarray([min(max(obs, -1.0), 1.0)], dtype=np.float64)


def get_fish_population(cfg: OracleConfig, obs) -> float:
    """Inverse of the obs scaling: obs -> (measured) stock."""
    return cfg.K * (float(np.asarray(obs).reshape(())) + 1.0)


def step_xi(
    cfg: OracleConfig,
    state: OracleState,
    action,
    xi: float,
    eta: float = 0.0,
) -> Tuple[OracleState, np.ndarray, float, bool, dict]:
    """Injected-noise step — deterministic given (xi, eta) ~ N(0,1) draws.

    Follows ORACLE_SEMANTICS.md step order exactly:
    decode -> harvest -> growth -> noise -> clip -> reward -> done -> observe.
    """
    quota, new_h = decode(cfg, state, action)
    hv = min(state.stock, quota)
    x1 = state.stock - hv
    cfg_t = (
        dataclasses.replace(cfg, r=cfg.r + cfg.r_drift * state.t)
        if cfg.r_drift != 0.0 else cfg
    )
    mu = growth(cfg_t, x1)
    if cfg.noise_form == "additive":
        x2 = mu + cfg.sigma * x1 * xi
    else:  # lognormal
        x2 = mu * math.exp(cfg.sigma * xi)
    x_next = max(x2, 0.0)
    reward = cfg.price * hv - cfg.cost * quota * quota
    if x_next <= 0.0:
        reward -= cfg.collapse_penalty
    t_next = state.t + 1
    done = (t_next >= cfg.Tmax) or (x_next <= 0.0)
    if cfg.scheme != "relative":
        new_h = hv
    new_state = OracleState(stock=x_next, harvest=new_h, t=t_next)
    obs = get_obs(cfg, x_next, eta)
    info = {"quota": quota, "harvest": hv, "stock": x_next}
    return new_state, obs, reward, done, info


def step(
    cfg: OracleConfig,
    state: OracleState,
    action,
    rng: np.random.Generator,
) -> Tuple[OracleState, np.ndarray, float, bool, dict]:
    """Seeded step: draws xi (and eta if needed) from a NumPy Generator."""
    xi = float(rng.standard_normal()) if cfg.sigma > 0.0 else 0.0
    eta = float(rng.standard_normal()) if cfg.sigma_m > 0.0 else 0.0
    return step_xi(cfg, state, action, xi, eta)


def rollout_xi(
    cfg: OracleConfig,
    actions,
    xis,
    etas=None,
    state: Optional[OracleState] = None,
) -> dict:
    """Roll a full injected-noise trajectory; returns stacked arrays.

    Stops stepping at the first `done` only in the sense of recording it;
    callers compare prefixes up to `done` against the engine.
    """
    if state is None:
        state = reset(cfg)
    T = len(actions)
    if etas is None:
        etas = np.zeros(T)
    out = {k: [] for k in ("stock", "obs", "reward", "done", "harvest", "quota")}
    for i in range(T):
        state, obs, reward, done, info = step_xi(cfg, state, actions[i], xis[i], etas[i])
        out["stock"].append(state.stock)
        out["obs"].append(obs[0])
        out["reward"].append(reward)
        out["done"].append(done)
        out["harvest"].append(info["harvest"])
        out["quota"].append(info["quota"])
    return {k: np.asarray(v) for k, v in out.items()}
