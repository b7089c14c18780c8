"""Dynamic-programming solver tests.

Anchors (new capability — no reference counterpart; validated against
closed-form control theory instead):
- Reed's theorem: for deterministic logistic growth with gamma -> 1, the
  optimal policy is constant escapement at the MSY stock K/2, yielding rK/4
  per step at equilibrium.
- Finite-horizon backward induction at gamma=1 must match the simulated
  return of the (optimal) escapement policy on the deterministic env.
- The dp policy object must be at least as good as the closed-form baselines
  through the same simulate_mdp evaluation pipeline.
"""

import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents import build_mdp, dp, escapement, finite_horizon, msy, value_iteration
from gym_fishing_tpu.analysis import simulate_mdp


def test_mdp_rows_are_distributions():
    env, params = gft.make("fishing-v1", sigma=0.1)
    m = build_mdp(env, params, n_states=65, n_quotas=17)
    P = np.asarray(m.P)
    assert P.shape == (17, 65, 65)
    assert np.all(P >= -1e-12)
    np.testing.assert_allclose(P.sum(axis=-1), 1.0, atol=1e-8)
    # collapsed state is absorbing with zero reward
    np.testing.assert_allclose(P[:, 0, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.R)[:, 0], 0.0, atol=1e-12)


def test_mdp_lognormal_rows_are_distributions():
    import dataclasses

    env, params = gft.make("fishing-v1", sigma=0.1)
    cfg = dataclasses.replace(env.config, noise_form="lognormal")
    env = dataclasses.replace(env, config=cfg)
    m = build_mdp(env, params, n_states=65, n_quotas=17)
    P = np.asarray(m.P)
    assert np.all(P >= -1e-12)
    np.testing.assert_allclose(P.sum(axis=-1), 1.0, atol=1e-8)
    # lognormal noise never crosses zero: with quota 0 (mu > 0), no collapse
    assert P[0, 1:, 0].max() < 1e-12


def test_value_iteration_recovers_constant_escapement():
    # Reed: deterministic logistic, gamma->1 => escapement at K/2, MSY rK/4.
    env, params = gft.make("fishing-v1", sigma=0.0)
    sol = value_iteration(env, params, gamma=0.999, tol=1e-3, n_states=201, n_quotas=201)
    grid = np.asarray(sol.grid)
    pol = np.asarray(sol.policy_quota)
    expect = np.maximum(grid - 0.5, 0.0)
    # compare away from the kink where grid/quota quantization dominates
    mask = (grid > 0.6) & (grid < 1.5)
    np.testing.assert_allclose(pol[mask], expect[mask], atol=0.03)
    # value at K/2 ~ discounted MSY stream: (rK/4) * gamma/(1-gamma) stepwise
    v_half = np.interp(0.5, grid, np.asarray(sol.V))
    assert v_half == pytest.approx(0.075 * 0.999 / (1 - 0.999), rel=0.05)
    assert int(sol.iterations) > 10
    assert np.asarray(sol.V)[0] == 0.0


def test_finite_horizon_matches_escapement_return():
    env, params = gft.make("fishing-v1", sigma=0.0)
    V, pol, mdp = finite_horizon(env, params, gamma=1.0, n_states=401, n_quotas=401)
    assert V.shape[0] == int(np.asarray(params.Tmax))
    assert pol.shape == (int(np.asarray(params.Tmax)), 401)
    v0 = np.interp(0.75, np.asarray(mdp.grid), np.asarray(V[0]))
    r_esc = simulate_mdp(env, escapement(env, params), reps=1, params=params).reward.sum()
    # DP optimum >= escapement, and exceeds it by exactly the value of
    # harvesting the remaining stock (~K/2 escaped + final growth) at step T.
    assert v0 >= float(r_esc) - 0.05
    assert v0 == pytest.approx(float(r_esc) + 0.5, abs=0.1)
    # last-step optimal policy is myopic: harvest everything
    assert np.all(np.asarray(pol[-1])[1:] >= np.asarray(mdp.grid)[1:] - 0.01)


def test_dp_policy_beats_baselines_under_noise():
    env, params = gft.make("fishing-v1", sigma=0.05)
    pol = dp(env, params, gamma=0.995, n_states=257, n_quotas=129)
    r_dp = simulate_mdp(env, pol, reps=6, params=params).reward.sum()
    r_msy = simulate_mdp(env, msy(env, params), reps=6, params=params).reward.sum()
    r_esc = simulate_mdp(env, escapement(env, params), reps=6, params=params).reward.sum()
    assert r_dp >= 0.97 * max(r_msy, r_esc)


def test_dp_policy_on_may_tipping_point():
    env, params = gft.make("fishing-may-v1", sigma=0.0)
    sol = value_iteration(env, params, gamma=0.99, n_states=257, n_quotas=129)
    V = np.asarray(sol.V)
    assert np.all(np.isfinite(V)) and V[0] == 0.0 and V.max() > 0.0
    # below the Allee-like tipping region the optimal policy stops harvesting
    grid = np.asarray(sol.grid)
    low = (grid > 0.02) & (grid < 0.05)
    assert np.asarray(sol.policy_quota)[low].max() <= grid[low].max()


def test_dp_predict_contract_and_mixture_rejection():
    env, params = gft.make("fishing-v1", sigma=0.0)
    pol = dp(env, params, gamma=0.99, n_states=65, n_quotas=33)
    a, st = pol.predict(np.zeros((4, 1)))
    assert a.shape == (4, 1) and st is None
    env_m, params_m = gft.make("fishing-mixture-v1")
    with pytest.raises(ValueError, match="mixture"):
        build_mdp(env_m, params_m)


def test_policy_evaluation_matches_optimal_and_mc():
    from gym_fishing_tpu.agents import policy_evaluation

    env, params = gft.make("fishing-v1", sigma=0.0)
    gamma = 0.99
    sol = value_iteration(env, params, gamma=gamma, n_states=257, n_quotas=257)
    # evaluating the optimal policy recovers the optimal value function
    V_opt, mdp = policy_evaluation(
        env, sol.policy_quota, params, gamma=gamma, n_states=257, n_quotas=257
    )
    np.testing.assert_allclose(np.asarray(V_opt), np.asarray(sol.V), atol=1e-3)
    # a strictly worse policy evaluates strictly below the optimum somewhere
    V_msy, _ = policy_evaluation(
        env, msy(env, params).quota, params, gamma=gamma, mdp=mdp
    )
    assert np.all(np.asarray(V_msy) <= np.asarray(sol.V) + 1e-6)
    # closed form: escapement from 0.75 harvests 0.25 now, then the MSY
    # surplus rK/4 = 0.075 every step forever -> 0.25 + 0.075 * g/(1-g)
    V_esc, _ = policy_evaluation(
        env, escapement(env, params).quota, params, gamma=gamma, mdp=mdp
    )
    v0 = np.interp(0.75, np.asarray(mdp.grid), np.asarray(V_esc))
    assert v0 == pytest.approx(0.25 + 0.075 * gamma / (1 - gamma), rel=0.01)
