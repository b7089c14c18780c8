"""SAC learner tests: device-resident replay buffer semantics + learning
signal on the logistic env."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.sac import (
    SACConfig,
    SACPolicy,
    buffer_add,
    buffer_init,
    buffer_sample,
    sac_train,
)


def test_replay_buffer_wraparound_and_sampling():
    buf = buffer_init(8, 1, 1)
    obs = jnp.arange(6, dtype=jnp.float32)[:, None]
    add = jax.jit(buffer_add)
    buf = add(buf, obs, obs, obs[:, 0], obs, jnp.zeros(6))
    assert int(buf.size) == 6 and int(buf.ptr) == 6
    # wrap: add 6 more -> capacity 8, ptr wraps to 4
    buf = add(buf, obs + 10, obs + 10, obs[:, 0] + 10, obs + 10, jnp.zeros(6))
    assert int(buf.size) == 8 and int(buf.ptr) == 4
    # newest writes overwrote the oldest slots
    stored = np.asarray(buf.obs[:, 0])
    assert set(stored.tolist()) == {12, 13, 14, 15, 4, 5, 10, 11}
    o, a, r, no, d = buffer_sample(buf, jax.random.key(0), 32)
    assert o.shape == (32, 1)
    assert np.isin(np.asarray(o[:, 0]), stored).all()


def test_sac_learns_on_fishing_v1():
    env, params = gft.make("fishing-v1", sigma=0.05)
    cfg = SACConfig(
        num_envs=64, batch_size=1024, buffer_size=1 << 15,
        updates_per_step=4, lr=1e-3,
    )
    state, hist = sac_train(env, cfg, steps=1500, seed=0, env_params=params)
    first = hist[0]["episode_return"]
    last = np.nanmean([h["episode_return"] for h in hist[-5:]])
    assert last > first + 0.2, (first, last)
    # trained policy plugs into the analysis stack
    from gym_fishing_tpu.analysis import simulate_mdp

    pol = SACPolicy(env, state)
    df = simulate_mdp(env, pol, reps=2, params=params)
    assert df.reward.sum() > 0


def test_sac_rejects_discrete_env():
    env, params = gft.make("fishing-v0")
    from gym_fishing_tpu.agents.sac import make_sac_state

    with pytest.raises(AssertionError):
        make_sac_state(env, SACConfig(), jax.random.key(0), params)
