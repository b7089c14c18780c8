"""Property tests (SURVEY.md §7.5): invariants that must hold for every
growth model, scheme, and random parameter draw — stock non-negativity,
obs bounds, reward identity, harvest feasibility, done semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_fishing_tpu as gft
from gym_fishing_tpu.core.types import GROWTH_MODELS


@pytest.mark.parametrize("growth", GROWTH_MODELS)
@pytest.mark.parametrize("scheme", ["continuous", "relative", "proportional"])
def test_step_invariants(growth, scheme):
    rng = np.random.default_rng(hash((growth, scheme)) % (2**31))
    env = gft.make_env(
        "prop", growth=growth, scheme=scheme,
        n_actions=3 if scheme == "relative" else 17,
    )
    for trial in range(5):
        params = env.params(
            jnp.float64,
            r=float(rng.uniform(0.1, 3.0 if growth == "myers" else 0.8)),
            K=float(rng.uniform(0.5, 2.0)),
            sigma=float(rng.uniform(0.0, 0.15)),
            price=float(rng.uniform(0.5, 2.0)),
            cost=float(rng.uniform(0.0, 0.2)),
        )
        state = env.reset(params)
        key = jax.random.key(trial)
        for t in range(20):
            key, k_act, k_step = jax.random.split(key, 3)
            action = env.action_space.sample(k_act)
            stock_before = float(state.stock)
            state, ts = env.step_xi(
                params, state, action,
                float(rng.standard_normal()), float(rng.standard_normal()),
            )
            # invariants
            assert float(state.stock) >= 0.0
            obs = np.asarray(ts.obs)
            assert obs.shape == (1,) and -1.0 <= obs[0] <= 1.0
            hv, q = float(ts.harvest), float(ts.quota)
            assert 0.0 <= hv <= stock_before + 1e-12
            assert hv <= q + 1e-12
            expected_r = float(params.price) * hv - float(params.cost) * q * q
            assert float(ts.reward) == pytest.approx(expected_r, rel=1e-10, abs=1e-12)
            assert int(state.t) == t + 1
            if bool(ts.done):
                assert int(state.t) >= int(params.Tmax) or float(state.stock) <= 0.0
                break


def test_zero_stock_is_absorbing():
    for growth in GROWTH_MODELS:
        env = gft.make_env("abs", growth=growth)
        params = env.params(jnp.float64, sigma=0.1)
        state = env.reset(params).replace(stock=jnp.float64(0.0))
        state2, ts = env.step_xi(params, state, jnp.asarray([0.0]), 1.7, 0.0)
        assert float(state2.stock) == 0.0
        assert float(ts.harvest) == 0.0
        assert bool(ts.done)


def test_deterministic_given_noise_stream():
    """step_xi is a pure function: same inputs, same outputs, any model."""
    for growth in GROWTH_MODELS:
        env = gft.make_env("det", growth=growth)
        params = env.params(jnp.float64, sigma=0.07)
        s0 = env.reset(params)
        a = jnp.asarray([-0.5])
        r1 = env.step_xi(params, s0, a, 0.33, -0.2)
        r2 = env.step_xi(params, s0, a, 0.33, -0.2)
        assert float(r1[0].stock) == float(r2[0].stock)
        assert float(r1[1].reward) == float(r2[1].reward)
