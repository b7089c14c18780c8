"""Env API / registry conformance tests — the rebuild's analog of the
reference's env-checker tests (SURVEY.md §4): spaces, reset/step signatures,
obs bounds, registry overrides, inverse maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.spaces import Box, Discrete


def test_registry_ids_and_make():
    ids = gft.registered_ids()
    assert "fishing-v0" in ids and "fishing-v1" in ids
    for env_id in ids:
        env, params = gft.make(env_id)
        state = env.reset(params)
        key = jax.random.key(0)
        if isinstance(env.action_space, Box):
            action = env.action_space.sample(key)
        else:
            action = env.action_space.sample(key)
        state, ts = jax.jit(env.step)(params, state, action, key)
        obs = np.asarray(ts.obs)
        assert obs.shape == (1,)
        assert -1.0 <= obs[0] <= 1.0
        assert np.isfinite(float(ts.reward))


def test_spaces():
    env, _ = gft.make("fishing-v0")
    assert isinstance(env.action_space, Discrete) and env.action_space.n == 3
    assert isinstance(env.observation_space, Box)
    env, _ = gft.make("fishing-v1")
    assert isinstance(env.action_space, Box) and env.action_space.shape == (1,)
    key = jax.random.key(0)
    a = env.action_space.sample(key)
    assert env.action_space.contains(np.asarray(a))


def test_make_overrides():
    env, params = gft.make("fishing-v1", sigma=0.0, r=0.5, K=2.0, dtype=jnp.float64)
    assert float(params.sigma) == 0.0 and float(params.r) == 0.5
    # static override: discrete proportional with 20 actions
    env2, _ = gft.make("fishing-v0", scheme="proportional", n_actions=20)
    assert isinstance(env2.action_space, Discrete) and env2.action_space.n == 20
    with pytest.raises(TypeError):
        gft.make("fishing-v1", not_a_param=3)
    with pytest.raises(ValueError):
        gft.make("fishing-v99")


def test_inverse_maps_roundtrip():
    env, params = gft.make("fishing-v1", dtype=jnp.float64)
    state = env.reset(params)
    for q in [0.0, 0.4, 1.3, 2.0]:
        a = env.get_action(params, state, q)
        got = env.get_quota(params, state, a)
        assert float(got) == pytest.approx(q, abs=1e-12)
    obs = env.get_obs(params, state)
    assert float(env.get_fish_population(params, obs)) == pytest.approx(
        float(params.init_state), abs=1e-12
    )


def test_seeded_step_statistics():
    """Seed-driven noise is N(0,1)-distributed through the dynamics
    (statistical validation — pointwise equality is impossible across RNGs,
    SURVEY.md §7.4)."""
    env, params = gft.make("fishing-v1", dtype=jnp.float64, sigma=0.1)
    state = env.reset(params)
    action = jnp.asarray([-1.0], jnp.float64)  # zero quota
    keys = jax.random.split(jax.random.key(3), 4000)
    step = jax.jit(jax.vmap(lambda k: env.step(params, state, action, k)[0].stock))
    stocks = np.asarray(step(keys))
    x = float(params.init_state)
    mu = x + 0.3 * x * (1 - x)  # deterministic logistic update
    samples = (stocks - mu) / (0.1 * x)
    assert abs(samples.mean()) < 0.05
    assert abs(samples.std() - 1.0) < 0.05


def test_dtype_follows_params():
    env, p32 = gft.make("fishing-v1", dtype=jnp.float32)
    s = env.reset(p32)
    assert s.stock.dtype == jnp.float32
    env, p64 = gft.make("fishing-v1", dtype=jnp.float64)
    s = env.reset(p64)
    assert s.stock.dtype == jnp.float64


def test_numbered_aliases_match_descriptive_ids():
    """Each reconstructed numbered id is the same env as its descriptive id."""
    import jax

    pairs = {
        "fishing-v4": "fishing-allen-v1",
        "fishing-v5": "fishing-beverton-holt-v1",
        "fishing-v6": "fishing-may-v1",
        "fishing-v7": "fishing-myers-v1",
        "fishing-v8": "fishing-ricker-v1",
        "fishing-v9": "fishing-nonstationary-v1",
        "fishing-v10": "fishing-mixture-v1",
    }
    key = jax.random.key(0)
    for alias, target in pairs.items():
        ea, pa = gft.make(alias)
        et, pt = gft.make(target)
        assert ea.config == et.config
        sa, st = ea.reset(pa), et.reset(pt)
        action = jnp.zeros((1,), pa.dtype)
        (sa2, tsa), (st2, tst) = ea.step(pa, sa, action, key), et.step(pt, st, action, key)
        assert float(tsa.reward) == float(tst.reward)
        assert float(sa2.stock) == float(st2.stock)
    # v2 = flagship logistic + observation error
    e2, p2 = gft.make("fishing-v2")
    assert e2.config == gft.make("fishing-v1")[0].config
    assert float(p2.sigma_m) > 0.0
