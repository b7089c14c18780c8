"""Unit tests of the NumPy oracle against closed-form fisheries facts.

These anchor the *semantics* (ORACLE_SEMANTICS.md) before any JAX code is
trusted: logistic equilibrium at K, MSY surplus production rK/4, May
bistability (two stable equilibria + unstable tipping point), decode schemes,
scaling round-trips (SURVEY.md §7.5 unit-test plan).
"""

import numpy as np
import pytest

from gym_fishing_tpu.oracle import oracle as orc


def iterate(cfg, x0, n, quota=0.0):
    st = orc.OracleState(stock=x0, harvest=0.0, t=0)
    cfg = orc.OracleConfig(**{**cfg.__dict__})
    for _ in range(n):
        a = orc.get_action(cfg, st, quota)
        st, *_ = orc.step_xi(cfg, st, a, 0.0)
        st = orc.OracleState(stock=st.stock, harvest=st.harvest, t=0)  # ignore Tmax
    return st.stock


def test_logistic_equilibrium_at_K():
    cfg = orc.OracleConfig(growth="logistic", sigma=0.0)
    x = iterate(cfg, 0.3, 500)
    assert x == pytest.approx(cfg.K, abs=1e-9)


def test_logistic_msy_surplus_is_rK_over_4():
    # At stock K/2 the logistic surplus production is r*K/4.
    cfg = orc.OracleConfig(growth="logistic", sigma=0.0)
    x = cfg.K / 2
    surplus = orc.growth(cfg, x) - x
    assert surplus == pytest.approx(cfg.r * cfg.K / 4, rel=1e-12)


def test_ricker_equilibrium_at_K():
    cfg = orc.OracleConfig(growth="ricker", sigma=0.0)
    assert iterate(cfg, 0.4, 500) == pytest.approx(cfg.K, abs=1e-9)


def test_beverton_holt_equilibrium():
    cfg = orc.OracleConfig(growth="beverton_holt", sigma=0.0)
    eq = (cfg.A - 1.0) / cfg.B
    assert iterate(cfg, 0.2, 500) == pytest.approx(eq, abs=1e-9)


def test_allen_allee_extinction_below_threshold():
    cfg = orc.OracleConfig(growth="allen", sigma=0.0, C=0.2)
    # Allen growth rate is negative below the Allee threshold C.
    assert orc.growth(cfg, 0.1) < 0.1
    assert orc.growth(cfg, 0.5) > 0.5


def test_myers_allee():
    cfg = orc.OracleConfig(growth="myers", r=3.0, sigma=0.0)
    # unstable at (3 - sqrt(5))/2 ~ 0.382, stable at (3 + sqrt(5))/2 ~ 2.618
    lo = (3 - np.sqrt(5)) / 2
    hi = (3 + np.sqrt(5)) / 2
    assert iterate(cfg, lo - 0.05, 400) == pytest.approx(0.0, abs=1e-6)
    assert iterate(cfg, lo + 0.05, 400) == pytest.approx(hi, abs=1e-6)


def test_may_bistability_and_tipping_point():
    cfg = orc.OracleConfig(growth="may", r=0.75, sigma=0.0)
    hi = iterate(cfg, 0.75, 2000)
    lo = iterate(cfg, 0.10, 2000)
    assert hi == pytest.approx(0.65, abs=0.02)
    assert lo == pytest.approx(0.054, abs=0.01)
    assert hi > 0.5 > 0.3 > lo  # distinct basins around the ~0.30 tipping point
    # starting just above/below the unstable equilibrium diverges to each basin
    assert iterate(cfg, 0.32, 4000) == pytest.approx(hi, abs=1e-6)
    assert iterate(cfg, 0.28, 4000) == pytest.approx(lo, abs=1e-6)


def test_harvest_first_then_growth_order():
    cfg = orc.OracleConfig(growth="logistic", sigma=0.0)
    st = orc.reset(cfg)
    quota = 0.5
    a = orc.get_action(cfg, st, quota)
    st2, obs, reward, done, info = orc.step_xi(cfg, st, a, 0.0)
    x1 = cfg.init_state - quota
    expected = x1 + cfg.r * x1 * (1 - x1 / cfg.K)
    assert st2.stock == pytest.approx(expected, rel=1e-12)
    assert reward == pytest.approx(cfg.price * quota, rel=1e-12)


def test_continuous_decode_and_inverse():
    cfg = orc.OracleConfig(scheme="continuous")
    st = orc.reset(cfg)
    for q in [0.0, 0.3, 1.7, 2.0]:
        a = orc.get_action(cfg, st, q)
        got, _ = orc.decode(cfg, st, a)
        assert got == pytest.approx(q, abs=1e-12)


def test_proportional_decode():
    cfg = orc.OracleConfig(scheme="proportional", n_actions=100)
    st = orc.reset(cfg)
    q, _ = orc.decode(cfg, st, 25)
    assert q == pytest.approx(0.25 * cfg.K)
    assert orc.get_action(cfg, st, q) == 25


def test_relative_decode_carries_harvest():
    cfg = orc.OracleConfig(scheme="relative", sigma=0.0)
    st = orc.reset(cfg)
    st1, *_ = orc.step_xi(cfg, st, 1, 0.0)  # +20%
    assert st1.harvest == pytest.approx(cfg.init_harvest * 1.2, rel=1e-12)
    st2, *_ = orc.step_xi(cfg, st1, 2, 0.0)  # -20%
    assert st2.harvest == pytest.approx(cfg.init_harvest * 1.2 * 0.8, rel=1e-12)
    st3, *_ = orc.step_xi(cfg, st2, 0, 0.0)  # maintain
    assert st3.harvest == pytest.approx(st2.harvest, rel=1e-12)


def test_obs_scaling_roundtrip_and_bounds():
    cfg = orc.OracleConfig()
    for x in [0.0, 0.5, 1.0, 2.0, 5.0]:
        obs = orc.get_obs(cfg, x)
        assert -1.0 <= obs[0] <= 1.0
        if x <= 2 * cfg.K:
            assert orc.get_fish_population(cfg, obs) == pytest.approx(x, abs=1e-12)


def test_termination_at_Tmax_and_collapse():
    cfg = orc.OracleConfig(sigma=0.0, Tmax=3)
    st = orc.reset(cfg)
    a = orc.get_action(cfg, st, 0.0)
    for i in range(3):
        st, obs, r, done, _ = orc.step_xi(cfg, st, a, 0.0)
        assert done == (i == 2)
    # collapse: harvest everything
    cfg2 = orc.OracleConfig(sigma=0.0)
    st = orc.reset(cfg2)
    a = orc.get_action(cfg2, st, 2.0)
    st, obs, r, done, _ = orc.step_xi(cfg2, st, a, 0.0)
    assert st.stock == 0.0 and done


def test_reward_shaping_cost_term():
    cfg = orc.OracleConfig(sigma=0.0, price=2.0, cost=0.5)
    st = orc.reset(cfg)
    a = orc.get_action(cfg, st, 0.5)
    _, _, reward, _, _ = orc.step_xi(cfg, st, a, 0.0)
    assert reward == pytest.approx(2.0 * 0.5 - 0.5 * 0.25, rel=1e-12)


def test_noise_forms():
    for form in ("additive", "lognormal"):
        cfg = orc.OracleConfig(sigma=0.1, noise_form=form)
        st = orc.reset(cfg)
        a = orc.get_action(cfg, st, 0.0)
        s1, *_ = orc.step_xi(cfg, st, a, 1.0)
        s0, *_ = orc.step_xi(cfg, st, a, 0.0)
        assert s1.stock != s0.stock
    # sigma=0 => deterministic regardless of xi
    cfg = orc.OracleConfig(sigma=0.0)
    st = orc.reset(cfg)
    a = orc.get_action(cfg, st, 0.0)
    assert orc.step_xi(cfg, st, a, 3.0)[0].stock == orc.step_xi(cfg, st, a, -3.0)[0].stock


def test_observation_noise_variant():
    cfg = orc.OracleConfig(sigma=0.0, sigma_m=0.1)
    st = orc.reset(cfg)
    a = orc.get_action(cfg, st, 0.0)
    _, obs_pos, *_ = orc.step_xi(cfg, st, a, 0.0, eta=1.0)
    _, obs_zero, *_ = orc.step_xi(cfg, st, a, 0.0, eta=0.0)
    assert obs_pos[0] != obs_zero[0]
    # measured stock is lognormally perturbed: m = x * exp(sigma_m * eta)
    x = orc.step_xi(cfg, st, a, 0.0)[0].stock
    assert orc.get_fish_population(cfg, obs_pos) == pytest.approx(
        x * np.exp(0.1), rel=1e-12
    )
