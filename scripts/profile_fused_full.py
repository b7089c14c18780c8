"""Phase breakdown of the fused-full PPO train step on the attached chip.

Times (a) the fused Pallas rollout alone, (b) the fused update epochs alone,
and (c) the whole train_step, at the benchmark config (B=16384, T=128,
4 epochs x 8 minibatches). Methodology: chained iterations + host value
fetch inside the timed window (see bench/throughput._sync — plain
block_until_ready is unreliable through the axon tunnel; BENCH_NOTES
"Round 3b").
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
from gym_fishing_tpu.registry.registry import make

B, T = 16384, 128
ITERS = 20


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def chain_time(step, state, iters=ITERS, warmup=3):
    s = state
    for _ in range(warmup):
        s = step(s)
    fetch(s)
    s = state
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    fetch(s)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    compute = sys.argv[1] if len(sys.argv) > 1 else "float32"
    env, env_params = make("fishing-v1", sigma=0.05)
    cfg = ppo.PPOConfig(
        num_envs=B, num_steps=T, fused_update=True, fused_rollout=True,
        compute_dtype=compute,
    )
    key = jax.random.PRNGKey(0)
    ts = ppo.make_train_state(env, cfg, jax.random.PRNGKey(1))
    bstate0 = batched_reset(env, env_params, B)

    interp = jax.default_backend() != "tpu"

    @jax.jit
    def roll_step(carry):
        bstate, k = carry
        k, k2 = jax.random.split(k)
        _, bstate = ppo_fused.fused_rollout_collect(
            env, env_params, cfg, ts, bstate, k2, interpret=interp
        )
        return (bstate, k)

    ms_roll = chain_time(roll_step, (bstate0, key))

    roll, _ = jax.jit(
        lambda ts, bstate, key: ppo_fused.fused_rollout_collect(
            env, env_params, cfg, ts, bstate, key, interpret=interp
        )
    )(ts, bstate0, key)
    packed_t = roll.packed_t

    @jax.jit
    def upd_step(ts):
        ts2, _ = ppo_fused.fused_epoch_scan(
            cfg, ts, packed_t, 1, 1, key, head="gaussian", interpret=interp
        )
        return ts2

    ms_upd = chain_time(upd_step, ts)

    @jax.jit
    def full_step(carry):
        ts, bstate, k = carry
        k, k2 = jax.random.split(k)
        ts, bstate, _ = ppo.train_step(env, env_params, cfg, ts, bstate, k2)
        return (ts, bstate, k)

    ms_full = chain_time(full_step, (ts, bstate0, key))

    steps = B * T
    print(f"rollout alone : {ms_roll:8.3f} ms  ({steps/ms_roll*1e3/1e6:7.1f}M steps/s)")
    print(f"update alone  : {ms_upd:8.3f} ms")
    print(f"full step     : {ms_full:8.3f} ms  ({steps/ms_full*1e3/1e6:7.1f}M steps/s)")
    print(f"roll+upd      : {ms_roll+ms_upd:8.3f} ms (overhead = "
          f"{ms_full-ms_roll-ms_upd:+.3f} ms)")


if __name__ == "__main__":
    main()
