"""sb3-facade + domain-randomization tests."""

import jax
import jax.numpy as jnp
import numpy as np

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents import PPO
from gym_fishing_tpu.batch import (
    make_param_sampler,
    randomized_reset,
    randomized_rollout,
)


def test_ppo_facade_learn_predict_save_load(tmp_path):
    model = PPO("MlpPolicy", "fishing-v1", num_envs=64, num_steps=16,
                epochs=2, num_minibatches=2, seed=3)
    model.learn(total_timesteps=64 * 16 * 3)
    assert model.num_timesteps == 64 * 16 * 3
    assert len(model.history) == 3
    obs = np.zeros((5, 1), np.float32)
    action, state = model.predict(obs)
    assert action.shape == (5, 1)

    model.save(str(tmp_path / "ckpt"))
    loaded = PPO.load(str(tmp_path / "ckpt"), env="fishing-v1", num_envs=64,
                      num_steps=16, epochs=2, num_minibatches=2)
    assert loaded.num_timesteps == model.num_timesteps
    a1, _ = model.predict(obs)
    a2, _ = loaded.predict(obs)
    np.testing.assert_array_equal(a1, a2)


def test_ppo_facade_works_with_simulate():
    from gym_fishing_tpu.analysis import simulate_mdp

    model = PPO("MlpPolicy", "fishing-v0", num_envs=32, num_steps=8,
                epochs=1, num_minibatches=2)
    model.learn(total_timesteps=32 * 8)
    env, params = gft.make("fishing-v0", Tmax=20)
    df = simulate_mdp(env, model, reps=2, params=params)
    assert len(df) == 40


def test_randomized_rollout_per_episode_resampling():
    env, params = gft.make("fishing-v1", dtype=jnp.float64, sigma=0.0, Tmax=5)
    sampler = make_param_sampler(params, {"r": (0.1, 0.5), "K": (0.8, 1.5)})
    key = jax.random.key(0)
    B, T = 16, 12
    state, bparams = randomized_reset(env, sampler, B, key)
    assert bparams.r.shape == (B,)
    assert float(bparams.r.min()) >= 0.1 and float(bparams.r.max()) <= 0.5
    r_before = np.asarray(bparams.r)

    policy = lambda obs, k: jnp.full((B, 1), -0.97, jnp.float64)
    state, bparams, traj = jax.jit(
        lambda s, bp, k: randomized_rollout(env, sampler, policy, s, bp, k, T)
    )(state, bparams, key)
    # Tmax=5 -> at least two episode boundaries passed; params were resampled
    assert not np.allclose(np.asarray(bparams.r), r_before)
    assert float(bparams.r.min()) >= 0.1 and float(bparams.r.max()) <= 0.5
    # non-randomized fields untouched
    assert np.allclose(np.asarray(bparams.price), 1.0)
    done = np.asarray(traj.done)
    assert done[4].all() and done[9].all()


def test_randomized_dynamics_use_instance_params():
    env, params = gft.make("fishing-v1", dtype=jnp.float64, sigma=0.0, Tmax=100)
    sampler = make_param_sampler(params, {"r": (0.1, 0.6)})
    key = jax.random.key(1)
    B = 8
    state, bparams = randomized_reset(env, sampler, B, key)
    from gym_fishing_tpu.batch.randomized import randomized_step

    actions = jnp.full((B, 1), -1.0, jnp.float64)  # zero quota
    state2, _, out = randomized_step(env, sampler, bparams, state, actions, key)
    x = 0.75
    expected = x + np.asarray(bparams.r) * x * (1 - x / np.asarray(bparams.K))
    np.testing.assert_allclose(np.asarray(state2.env.stock), expected, atol=1e-12)


def test_sac_td3_facades_learn_predict_save_load(tmp_path):
    from gym_fishing_tpu.agents import SAC, TD3

    for cls, name in [(SAC, "sac"), (TD3, "td3")]:
        model = cls("MlpPolicy", "fishing-v1", seed=1,
                    num_envs=16, buffer_size=1024, batch_size=64)
        model.learn(total_timesteps=16 * 30)
        assert model.num_timesteps == 16 * 30
        obs = np.zeros((5, 1), np.float32)
        action, _ = model.predict(obs)
        assert action.shape == (5, 1)
        assert np.all((action >= -1.0) & (action <= 1.0))

        model.save(str(tmp_path / name))
        loaded = cls.load(str(tmp_path / name), env="fishing-v1",
                          num_envs=16, buffer_size=1024, batch_size=64)
        assert loaded.num_timesteps == model.num_timesteps
        a1, _ = model.predict(obs)
        a2, _ = loaded.predict(obs)
        np.testing.assert_array_equal(a1, a2)


def test_dqn_facade_learn_predict_save_load(tmp_path):
    from gym_fishing_tpu.agents import DQN

    model = DQN("MlpPolicy", "fishing-v0", seed=2,
                num_envs=16, buffer_size=1024, batch_size=64)
    model.learn(total_timesteps=16 * 30)
    obs = np.zeros((5, 1), np.float32)
    action, state = model.predict(obs)
    assert action.shape == (5,) and action.dtype == np.int32
    assert np.all((action >= 0) & (action < 3))
    # relative scheme: predict threads the carried harvest via the state slot
    assert state is not None

    model.save(str(tmp_path / "dqn"))
    loaded = DQN.load(str(tmp_path / "dqn"), env="fishing-v0",
                      num_envs=16, buffer_size=1024, batch_size=64)
    a1, _ = model.predict(obs)
    a2, _ = loaded.predict(obs)
    np.testing.assert_array_equal(a1, a2)
