"""Sharded fused PPO step == single-device fused step (8-virtual-device mesh).

The fused kernels can't be auto-partitioned by GSPMD, so multi-chip runs go
through shard/fused_ppo.make_sharded_fused_train_step (explicit shard_map +
psum). On CPU the Mosaic interpreter's PRNG is deterministic (zero draws),
so at epochs=1, minibatches=1 — where minibatch composition can't differ —
the sharded step must reproduce the single-device fused train_step's params
and metrics exactly up to f32 reduction order.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents import ppo
from gym_fishing_tpu.batch import batched_reset
from gym_fishing_tpu.shard import make_mesh, replicate, shard_batch
from gym_fishing_tpu.shard.fused_ppo import make_sharded_fused_train_step


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_fused_step_matches_single_device(mesh):
    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(
        num_envs=1024, num_steps=16, epochs=1, num_minibatches=1, hidden=32,
        fused_update=True, fused_rollout=True,
    )
    key = jax.random.key(5)
    ts0 = ppo.make_train_state(env, cfg, key)

    # single device
    bstate = batched_reset(env, params, cfg.num_envs)
    single = jax.jit(
        lambda t, b, k: ppo.train_step(env, params, cfg, t, b, k)
    )
    ts_ref, bst_ref, m_ref = single(ts0, bstate, key)

    # sharded: same global state split over 8 devices. The sharded step
    # folds axis_index into the rollout seed, but on CPU the interpreter's
    # PRNG draws are zero regardless, so trajectories match exactly.
    step = jax.jit(make_sharded_fused_train_step(env, params, cfg, mesh))
    ts_sh = replicate(ts0, mesh)
    bst_sh = shard_batch(batched_reset(env, params, cfg.num_envs), mesh)
    ts2, bst2, m2 = step(ts_sh, bst_sh, key)

    # Adam normalizes gradient scale, so tiny-magnitude params see the f32
    # psum reduction-order noise directly: absolute tolerance ~1e-6.
    for a, b in zip(jax.tree.leaves(ts2.params), jax.tree.leaves(ts_ref.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-6
        )
    np.testing.assert_allclose(
        np.asarray(bst2.env.stock), np.asarray(bst_ref.env.stock),
        rtol=1e-6, atol=1e-7,
    )
    # pg_loss is a near-cancelling mean of clipped terms, so the f32
    # local-mean/pmean reduction-order noise shows up at ~1e-5 absolute
    for name in ("pg_loss", "v_loss", "approx_kl", "episode_return",
                 "mean_reward"):
        np.testing.assert_allclose(
            float(m2[name]), float(m_ref[name]), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_sharded_fused_step_multi_epoch_runs(mesh):
    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(
        num_envs=1024, num_steps=16, epochs=2, num_minibatches=2, hidden=32,
        fused_update=True, fused_rollout=True,
    )
    key = jax.random.key(9)
    ts = replicate(ppo.make_train_state(env, cfg, key), mesh)
    bst = shard_batch(batched_reset(env, params, cfg.num_envs), mesh)
    step = jax.jit(make_sharded_fused_train_step(env, params, cfg, mesh))
    for i in range(2):
        ts, bst, metrics = step(ts, bst, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    # params must be identical across devices (replicated update)
    p0 = jax.tree.leaves(ts.params)[0]
    assert p0.sharding.is_fully_replicated


def test_sharded_fused_requires_fused_update(mesh):
    env, params = gft.make("fishing-v1", dtype=jnp.float32)
    cfg = ppo.PPOConfig(num_envs=1024, num_steps=16, fused_update=False)
    with pytest.raises(NotImplementedError):
        make_sharded_fused_train_step(env, params, cfg, mesh)
    cfg2 = dataclasses.replace(cfg, fused_update=True, num_envs=1001)
    with pytest.raises(ValueError):
        make_sharded_fused_train_step(env, params, cfg2, mesh)
