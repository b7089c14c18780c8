"""PPO learner tests: learning signal on the logistic env, discrete-action
path, and determinism of the jitted train step."""

import jax
import numpy as np

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.ppo import (
    PPOConfig,
    PPOPolicy,
    make_train_state,
    train,
    train_step,
)
from gym_fishing_tpu.batch import batched_reset


def test_ppo_learns_to_sustain_fishery():
    env, params = gft.make("fishing-v1", sigma=0.05)
    cfg = PPOConfig(num_envs=128, num_steps=64, epochs=4, num_minibatches=8)
    ts, hist = train(env, cfg, seed=0, iterations=20, env_params=params)
    first = np.nanmean([h["episode_return"] for h in hist[:3]])
    last = np.nanmean([h["episode_return"] for h in hist[-3:]])
    assert last > first + 0.5, (first, last)
    # episodes get longer as the agent stops collapsing the stock
    assert hist[-1]["episode_length"] > 5 * max(hist[0]["episode_length"], 1.0)


def test_ppo_discrete_env_trains():
    env, params = gft.make("fishing-v0", sigma=0.05)
    cfg = PPOConfig(num_envs=64, num_steps=32, epochs=2, num_minibatches=4)
    ts, hist = train(env, cfg, seed=1, iterations=3, env_params=params)
    assert np.isfinite(hist[-1]["loss"])
    # trained policy plugs into the simulate/analysis stack
    pol = PPOPolicy(env, ts)
    from gym_fishing_tpu.analysis import simulate_mdp

    df = simulate_mdp(env, pol, reps=2, params=params)
    assert len(df) == 2 * int(np.asarray(params.Tmax))


def test_train_step_deterministic():
    env, params = gft.make("fishing-v1", sigma=0.1)
    cfg = PPOConfig(num_envs=32, num_steps=16, epochs=2, num_minibatches=2)
    key = jax.random.key(7)
    ts = make_train_state(env, cfg, key)
    bstate = batched_reset(env, params, cfg.num_envs)
    step = jax.jit(lambda t, b, k: train_step(env, params, cfg, t, b, k))
    ts1, b1, m1 = step(ts, bstate, key)
    ts2, b2, m2 = step(ts, bstate, key)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])
