"""A2C learner tests: learning signal on the logistic env, discrete path,
determinism, and the sb3-style facade."""

import jax
import numpy as np

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.a2c import (
    A2CConfig,
    A2CPolicy,
    a2c_train,
    a2c_train_step,
    make_a2c_state,
)
from gym_fishing_tpu.batch import batched_reset


def test_a2c_learns_to_sustain_fishery():
    env, params = gft.make("fishing-v1", sigma=0.05)
    # A2C has no sample reuse (one gradient step per batch), so it needs more
    # iterations than the PPO equivalent of this test to leave the
    # harvest-and-collapse regime.
    cfg = A2CConfig(num_envs=256, num_steps=32, ent_coef=0.001, gae_lambda=0.95)
    ts, hist = a2c_train(env, cfg, seed=0, iterations=200, env_params=params)
    first = np.nanmean([h["episode_return"] for h in hist[:10]])
    last = np.nanmean([h["episode_return"] for h in hist[-10:]])
    assert last > first + 0.5, (first, last)


def test_a2c_discrete_env_trains():
    env, params = gft.make("fishing-v0", sigma=0.05)
    cfg = A2CConfig(num_envs=64, num_steps=16)
    ts, hist = a2c_train(env, cfg, seed=1, iterations=3, env_params=params)
    assert np.isfinite(hist[-1]["loss"])
    pol = A2CPolicy(env, ts)
    from gym_fishing_tpu.analysis import simulate_mdp

    df = simulate_mdp(env, pol, reps=2, params=params)
    assert len(df) == 2 * int(np.asarray(params.Tmax))


def test_a2c_train_step_deterministic():
    env, params = gft.make("fishing-v1", sigma=0.1)
    cfg = A2CConfig(num_envs=32, num_steps=8)
    key = jax.random.key(7)
    ts = make_a2c_state(env, cfg, key)
    bstate = batched_reset(env, params, cfg.num_envs)
    step = jax.jit(lambda t, b, k: a2c_train_step(env, params, cfg, t, b, k))
    ts1, _, m1 = step(ts, bstate, key)
    ts2, _, m2 = step(ts, bstate, key)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])


def test_a2c_facade_learn_predict_save_load(tmp_path):
    from gym_fishing_tpu.agents.sb3_like import A2C

    model = A2C("MlpPolicy", "fishing-v1", num_envs=32, num_steps=8, seed=0)
    model.learn(total_timesteps=32 * 8 * 2)
    assert model.num_timesteps == 32 * 8 * 2
    obs = np.zeros((1,), np.float32)
    action, _ = model.predict(obs)
    assert np.all(np.isfinite(action))

    path = str(tmp_path / "a2c_ckpt")
    model.save(path)
    loaded = A2C.load(path, env="fishing-v1", num_envs=32, num_steps=8)
    a1, _ = model.predict(obs)
    a2, _ = loaded.predict(obs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
