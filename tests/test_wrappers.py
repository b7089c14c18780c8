"""Observation-stacking wrapper tests (POMDP remedy for obs-noise envs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.batch import batched_reset, batched_step, rollout
from gym_fishing_tpu.envs import stack_observations


def test_window_semantics_match_unwrapped():
    env, params = gft.make("fishing-may-obs-v1", dtype=jnp.float64)
    wenv = stack_observations(env, k=3)
    s = env.reset(params)
    ws = wenv.reset(params)
    key = jax.random.key(0)
    obs_hist = [float(env.get_obs(params, s)[0])] * 3
    for i in range(6):
        key, sub = jax.random.split(key)
        a = jnp.asarray([-0.7], jnp.float64)
        s, ts = env.step(params, s, a, sub)
        ws, wts = wenv.step(params, ws, a, sub)  # same key -> same noise
        obs_hist.append(float(ts.obs[0]))
        np.testing.assert_allclose(np.asarray(wts.obs), obs_hist[-3:], atol=0)
        assert float(wts.reward) == float(ts.reward)
    assert wenv.observation_space.shape == (3,)


def test_batched_rollout_and_autoreset_with_stack():
    env, params = gft.make("fishing-v1", sigma=0.05, Tmax=5)
    wenv = stack_observations(env, k=4)
    B, T = 8, 12
    state = batched_reset(wenv, params, B)
    assert state.env.window.shape == (B, 4)
    policy = lambda obs, key: jnp.full((B, 1), -0.8, params.dtype)
    state2, traj = jax.jit(
        lambda s, k: rollout(wenv, params, policy, s, k, T)
    )(state, jax.random.key(1))
    assert traj.obs.shape == (T, B, 4)
    # autoreset at Tmax=5: episodes end at step index 4 and 9, and the
    # post-reset window is re-filled with the broadcast initial observation
    done_steps = np.asarray(traj.done)
    assert done_steps[4].all() and done_steps[9].all()
    init_obs = float(env.get_obs(params, env.reset(params))[0])
    # traj.obs at the step AFTER a reset has the fresh window in its tail
    # positions; directly check the state window right after a done step by
    # replaying: the final state is 2 steps past the last reset, so the two
    # oldest window slots still hold the initial observation.
    np.testing.assert_allclose(
        np.asarray(state2.env.window)[:, :2], init_obs, atol=1e-12, rtol=0
    )


def test_ppo_trains_on_stacked_env():
    from gym_fishing_tpu.agents.ppo import PPOConfig, make_train_state, train_step

    env, params = gft.make("fishing-may-obs-v1")
    wenv = stack_observations(env, k=4)
    cfg = PPOConfig(num_envs=32, num_steps=8, epochs=1, num_minibatches=2)
    key = jax.random.key(0)
    ts = make_train_state(wenv, cfg, key)
    bstate = batched_reset(wenv, params, cfg.num_envs)
    step = jax.jit(lambda t, b, k: train_step(wenv, params, cfg, t, b, k))
    ts2, bstate2, metrics = step(ts, bstate, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert bstate2.env.window.shape == (32, 4)


def test_dqn_trains_on_stacked_discrete_env():
    from gym_fishing_tpu.agents import DQNConfig
    from gym_fishing_tpu.agents.dqn import dqn_train

    env, params = gft.make("fishing-v0", sigma_m=0.05)
    wenv = stack_observations(env, k=3)
    cfg = DQNConfig(num_envs=16, buffer_size=512, batch_size=64)
    state, hist = dqn_train(wenv, cfg, steps=20, seed=0, env_params=params)
    assert state.buffer.obs.shape == (512, 4)  # 3-window + harvest feature
    assert np.isfinite(np.asarray(hist["loss"])).all()


def test_wrapper_rejects_bad_k_and_nested():
    env, params = gft.make("fishing-v1")
    with pytest.raises(ValueError, match="k must be"):
        stack_observations(env, k=0)
    w = stack_observations(env, k=2)
    with pytest.raises(ValueError, match="scalar-observation"):
        stack_observations(w, k=2)
