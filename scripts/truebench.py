"""Trustworthy timings through the axon tunnel: chained deps + value fetch.

Through the remote-TPU tunnel, `jax.block_until_ready` on repeated identical
dispatches can return before real execution (lazy/replay semantics), and
device behavior changes after the first on-chip-PRNG kernel runs. The ONLY
robust methodology is: (a) CHAIN each iteration on the previous one's output
so no execution can be elided, (b) force a host VALUE FETCH of the final
result, (c) time the whole window. This script measures every hot path that
way. See BENCH_NOTES "Round 3b: measurement methodology correction".
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gym_fishing_tpu.agents import ppo, ppo_fused
from gym_fishing_tpu.batch.batch import batched_reset
from gym_fishing_tpu.kernels import make_scalars, pallas_rollout
from gym_fishing_tpu.registry.registry import make

B, T = 16384, 128


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def chain_time(step, state, iters=20, warmup=3):
    """state = step(state) chained; returns ms/iter, forcing a value fetch."""
    s = state
    for _ in range(warmup):
        s = step(s)
    fetch(s)
    s = state
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    fetch(s)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    env, env_params = make("fishing-v1", sigma=0.05)

    # 0. matmul control (device sanity: ~2 ms for f32 4096^3 on v5e)
    mm = jax.jit(lambda a: a @ a * 0.001 + 1.0)
    a0 = jax.random.normal(key, (4096, 4096), jnp.float32)
    print(f"matmul 4096^3 chained        : {chain_time(mm, a0):8.3f} ms")

    # 1. closed-form rollout kernel (stepping tier), chained via stock
    scal = make_scalars(env_params, 0.5, seed=0)
    t0s = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def step_kernel(stock):
        out = pallas_rollout(stock, t0s, scal, T, policy="escapement")
        return out.stock

    stock0 = jnp.full((B,), 0.75, jnp.float32)
    ms = chain_time(step_kernel, stock0)
    print(f"closed-form kernel rollout   : {ms:8.3f} ms "
          f"({B*T/ms*1e3/1e9:6.2f}B steps/s)")

    # 2. fused policy rollout, chained via bstate
    cfg = ppo.PPOConfig(
        num_envs=B, num_steps=T, fused_update=True, fused_rollout=True
    )
    ts = ppo.make_train_state(env, cfg, jax.random.PRNGKey(1))
    bstate0 = batched_reset(env, env_params, B)

    @jax.jit
    def roll_step(carry):
        bstate, k = carry
        k, k2 = jax.random.split(k)
        roll, bstate = ppo_fused.fused_rollout_collect(
            env, env_params, cfg, ts, bstate, k2
        )
        return (bstate, k)

    ms = chain_time(roll_step, (bstate0, key))
    print(f"fused policy rollout         : {ms:8.3f} ms "
          f"({B*T/ms*1e3/1e6:6.1f}M steps/s)")

    # 3. fused epoch scan (update phase), chained via ts
    pt = jax.random.normal(key, (8, B * T), jnp.float32) * 0.3

    @jax.jit
    def upd_step(ts):
        ts2, _ = ppo_fused.fused_epoch_scan(cfg, ts, pt, 1, 1, key)
        return ts2

    ms = chain_time(upd_step, ts)
    print(f"fused update (4ep x 8mb)     : {ms:8.3f} ms")

    # 4. full fused train step, chained via (ts, bstate, key)
    @jax.jit
    def train_fused(carry):
        ts, bstate, k = carry
        k, k2 = jax.random.split(k)
        ts, bstate, metrics = ppo.train_step(
            env, env_params, cfg, ts, bstate, k2
        )
        return (ts, bstate, k)

    ms = chain_time(train_fused, (ts, bstate0, key))
    print(f"FUSED-FULL train step        : {ms:8.3f} ms "
          f"({B*T/ms*1e3/1e6:6.1f}M steps/s)")

    # 5. XLA rollout + fused update
    cfg_x = ppo.PPOConfig(num_envs=B, num_steps=T, fused_update=True)

    @jax.jit
    def train_xla_fu(carry):
        ts, bstate, k = carry
        k, k2 = jax.random.split(k)
        ts, bstate, metrics = ppo.train_step(
            env, env_params, cfg_x, ts, bstate, k2
        )
        return (ts, bstate, k)

    ms = chain_time(train_xla_fu, (ts, bstate0, key))
    print(f"XLA-roll + fused-upd step    : {ms:8.3f} ms "
          f"({B*T/ms*1e3/1e6:6.1f}M steps/s)")

    # 6. pure XLA train step
    cfg_p = ppo.PPOConfig(num_envs=B, num_steps=T)

    @jax.jit
    def train_pure(carry):
        ts, bstate, k = carry
        k, k2 = jax.random.split(k)
        ts, bstate, metrics = ppo.train_step(
            env, env_params, cfg_p, ts, bstate, k2
        )
        return (ts, bstate, k)

    ms = chain_time(train_pure, (ts, bstate0, key))
    print(f"pure-XLA train step          : {ms:8.3f} ms "
          f"({B*T/ms*1e3/1e6:6.1f}M steps/s)")


if __name__ == "__main__":
    main()
