"""Mesh/sharding tests on the 8-virtual-CPU-device backend (SURVEY.md §7.5):
sharded rollout == single-device rollout, sharded PPO step executes with
replicated params + env-sharded batch, checksum debug helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.ppo import PPOConfig, make_train_state, train_step
from gym_fishing_tpu.batch import batched_reset, rollout
from gym_fishing_tpu.shard import (
    env_sharding,
    make_mesh,
    replicate,
    shard_batch,
    state_checksum,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_rollout_matches_single_device(mesh):
    env, params = gft.make("fishing-v1", dtype=jnp.float64, sigma=0.1)
    B, T = 64, 20
    policy = lambda obs, k: jnp.full((B, 1), -0.9, params.dtype)
    key = jax.random.key(0)

    state = batched_reset(env, params, B)
    run = jax.jit(lambda s, k: rollout(env, params, policy, s, k, T))
    _, traj_single = run(state, key)

    state_sh = shard_batch(batched_reset(env, params, B), mesh)
    _, traj_sh = run(state_sh, key)
    np.testing.assert_allclose(
        np.asarray(traj_single.reward), np.asarray(traj_sh.reward), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(traj_single.obs), np.asarray(traj_sh.obs), atol=1e-12
    )


def test_sharded_ppo_train_step(mesh):
    env, params = gft.make("fishing-v1", sigma=0.05)
    cfg = PPOConfig(num_envs=64, num_steps=16, epochs=2, num_minibatches=2)
    key = jax.random.key(3)
    ts = make_train_state(env, cfg, key)
    ts = replicate(ts, mesh)
    bstate = shard_batch(batched_reset(env, params, cfg.num_envs), mesh)
    step = jax.jit(lambda t, b, k: train_step(env, params, cfg, t, b, k))
    ts2, b2, metrics = step(ts, bstate, key)
    assert np.isfinite(float(metrics["loss"]))
    # batch state stays sharded over the envs axis
    assert b2.env.stock.sharding.is_equivalent_to(env_sharding(mesh), ndim=1)
    # params identical to the unsharded step
    ts_ref = make_train_state(env, cfg, key)
    bstate_ref = batched_reset(env, params, cfg.num_envs)
    ts3, _, m3 = step(ts_ref, bstate_ref, key)
    for a, b in zip(jax.tree.leaves(ts2.params), jax.tree.leaves(ts3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_state_checksum(mesh):
    env, params = gft.make("fishing-v1", sigma=0.0)
    b = batched_reset(env, params, 16)
    c1 = float(state_checksum(b))
    c2 = float(state_checksum(shard_batch(b, mesh)))
    assert c1 == pytest.approx(c2, rel=1e-12)
