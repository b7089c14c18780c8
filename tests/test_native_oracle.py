"""C-oracle cross-validation: two independently-written implementations of
the pinned semantics (Python/NumPy vs C) must agree bit-for-bit under the
same injected noise stream, across all growth models, schemes and noise
forms. Their agreement is the strongest evidence the pinned semantics are
implemented as specified."""

import numpy as np
import pytest

from gym_fishing_tpu.core.types import GROWTH_MODELS
from gym_fishing_tpu.native import COracle, available
from gym_fishing_tpu.oracle import oracle as orc

pytestmark = pytest.mark.skipif(not available(), reason="no C compiler")


def streams(cfg, T, seed):
    rng = np.random.default_rng(seed)
    xis = rng.standard_normal(T)
    etas = rng.standard_normal(T)
    if cfg.scheme == "continuous":
        actions = [np.asarray([a]) for a in rng.uniform(-1.0, -0.3, T)]
    else:
        actions = list(rng.integers(0, cfg.n_actions, T))
    return actions, xis, etas


@pytest.mark.parametrize("growth", GROWTH_MODELS)
@pytest.mark.parametrize("noise_form", ["additive", "lognormal"])
def test_c_oracle_bitwise_vs_python(growth, noise_form):
    r = 3.0 if growth == "myers" else (0.75 if growth == "may" else 0.3)
    cfg = orc.OracleConfig(
        growth=growth, noise_form=noise_form, scheme="continuous",
        sigma=0.08, sigma_m=0.03, r=r,
    )
    actions, xis, etas = streams(cfg, 60, seed=hash(growth) % 1000)
    py = orc.rollout_xi(cfg, actions, xis, etas)
    c = COracle(cfg).rollout_xi(actions, xis, etas)
    n = len(c["stock"])  # C stops at done; align
    for k in ("stock", "obs", "reward", "harvest", "quota"):
        np.testing.assert_array_equal(py[k][:n], c[k], err_msg=k)
    np.testing.assert_array_equal(py["done"][:n], c["done"])


@pytest.mark.parametrize("scheme,n_actions", [("relative", 3), ("proportional", 50)])
def test_c_oracle_discrete_schemes(scheme, n_actions):
    cfg = orc.OracleConfig(growth="logistic", scheme=scheme, n_actions=n_actions, sigma=0.1)
    actions, xis, etas = streams(cfg, 40, seed=5)
    py = orc.rollout_xi(cfg, actions, xis, etas)
    c = COracle(cfg).rollout_xi(actions, xis, etas)
    n = len(c["stock"])
    np.testing.assert_array_equal(py["stock"][:n], c["stock"])
    np.testing.assert_array_equal(py["harvest"][:n], c["harvest"])


def test_c_oracle_batch_step_matches_rollout():
    cfg = orc.OracleConfig(growth="may", r=0.75, scheme="continuous", sigma=0.05)
    co = COracle(cfg)
    B, T = 64, 20
    rng = np.random.default_rng(2)
    x = np.full(B, cfg.init_state)
    h = np.full(B, cfg.init_harvest)
    t = np.zeros(B, np.int64)
    # instance 0 replays the single-trajectory rollout
    actions = rng.uniform(-1, -0.3, (T, B))
    xis = rng.standard_normal((T, B))
    obs_hist = []
    for i in range(T):
        obs, reward, done = co.step_batch(x, h, t, actions[i], xis[i])
        obs_hist.append(obs[0])
    single = co.rollout_xi(
        [np.asarray([a]) for a in actions[:, 0]], xis[:, 0]
    )
    n = len(single["obs"])
    np.testing.assert_array_equal(np.asarray(obs_hist)[:n], single["obs"])


def test_c_oracle_throughput_sane():
    """The native batch stepper should be far faster than the Python oracle."""
    import time

    cfg = orc.OracleConfig(growth="logistic", scheme="continuous", sigma=0.05)
    co = COracle(cfg)
    B, T = 4096, 100
    rng = np.random.default_rng(0)
    x = np.full(B, cfg.init_state)
    h = np.full(B, cfg.init_harvest)
    t = np.zeros(B, np.int64)
    actions = rng.uniform(-1, -0.5, B)
    xis = rng.standard_normal(B)
    t0 = time.perf_counter()
    for _ in range(T):
        co.step_batch(x, h, t, actions, xis)
    c_rate = B * T / (time.perf_counter() - t0)
    assert c_rate > 1e6  # >1M steps/s on one core (Python oracle: ~1e5)


def test_c_oracle_nonstationary_drift():
    cfg = orc.OracleConfig(growth="ricker", scheme="continuous",
                           sigma=0.06, r_drift=-0.002)
    actions, xis, etas = streams(cfg, 50, seed=9)
    py = orc.rollout_xi(cfg, actions, xis, etas)
    c = COracle(cfg).rollout_xi(actions, xis, etas)
    n = len(c["stock"])
    for k in ("stock", "obs", "reward", "harvest", "quota"):
        np.testing.assert_array_equal(py[k][:n], c[k], err_msg=k)
