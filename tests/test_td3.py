"""TD3 learner tests: learning signal + delayed-update bookkeeping."""

import jax
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.td3 import TD3Config, TD3Policy, make_td3_state, td3_train


def test_td3_learns_to_sustain():
    env, params = gft.make("fishing-v1", sigma=0.05)
    cfg = TD3Config(num_envs=64, batch_size=1024, buffer_size=1 << 15,
                    updates_per_step=4, lr=1e-3)
    state, hist = td3_train(env, cfg, steps=1200, seed=0, env_params=params)
    first = hist[0]["episode_return"]
    last = np.nanmax([h["episode_return"] for h in hist[-6:]])
    assert last > first + 1.0, (first, last)
    pol = TD3Policy(env, state)
    from gym_fishing_tpu.analysis import simulate_mdp

    df = simulate_mdp(env, pol, reps=2, params=params)
    assert df.reward.sum() > 0


def test_td3_delayed_update_counter():
    env, params = gft.make("fishing-v1", sigma=0.0)
    cfg = TD3Config(num_envs=8, batch_size=64, buffer_size=1 << 10,
                    updates_per_step=3, policy_delay=2)
    state = make_td3_state(env, cfg, jax.random.key(0), params)
    from functools import partial

    from gym_fishing_tpu.agents.td3 import td3_train_step

    step = jax.jit(partial(td3_train_step, env, params, cfg))
    state, _ = step(state, jax.random.key(1))
    assert int(state.update_count) == 3


def test_td3_rejects_discrete():
    env, params = gft.make("fishing-v0")
    with pytest.raises(AssertionError):
        make_td3_state(env, TD3Config(), jax.random.key(0), params)
