"""One-session honest measurement sweep (chained + value-fetched timings).

Prints incrementally so partial results survive interruption.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

t_start = time.time()


def log(msg):
    print(f"[{time.time()-t_start:7.1f}s] {msg}", flush=True)


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def chain_time(step, state, iters=10, warmup=3):
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
    log("connecting to device...")
    x = jnp.ones((8, 128))
    fetch(x + 1)
    log("device up")

    from gym_fishing_tpu.agents import ppo, ppo_fused
    from gym_fishing_tpu.batch.batch import batched_reset
    from gym_fishing_tpu.kernels import make_scalars, pallas_rollout
    from gym_fishing_tpu.kernels.ppo_update_kernel import fused_minibatch_grad
    from gym_fishing_tpu.registry.registry import make
    from gym_fishing_tpu.bench.throughput import measure

    key = jax.random.PRNGKey(0)
    env, env_params = make("fishing-v1", sigma=0.05)

    # --- 1. update kernel standalone, one minibatch, f32 vs bf16 ---
    MB = 262144
    data = jax.random.normal(key, (8, MB), jnp.float32) * 0.3
    order = jnp.arange(MB // 2048, dtype=jnp.int32)
    H, D, A = 64, 1, 1
    ks = jax.random.split(key, 16)
    w = lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.3
    weights = [
        w(ks[1], (D, H)), w(ks[2], (H, 1)), w(ks[3], (H, H)), w(ks[4], (H, 1)),
        w(ks[5], (H, A)), w(ks[6], (A, 1)), w(ks[7], (A, 1)),
        w(ks[8], (D, H)), w(ks[9], (H, 1)), w(ks[10], (H, H)),
        w(ks[11], (H, 1)), w(ks[12], (H, 1)), w(ks[13], (1, 1)),
    ]
    scalars = jnp.array([0.2, 0.5, 1.0 / MB, 0.0, 1.0, 0.0, 0.0, 0.0],
                        jnp.float32)

    for compute in ("float32", "bfloat16"):
        @jax.jit
        def kstep(ws, compute=compute):
            g, met = fused_minibatch_grad(
                data, order, tuple(ws), scalars, obs_dim=D, act_dim=A,
                tile=2048, head="gaussian", compute=compute)
            return [wi - 1e-6 * gi for wi, gi in zip(ws, g)]

        ms = chain_time(kstep, weights)
        log(f"update kernel 1 mb ({compute}): {ms:.3f} ms -> x32 = "
            f"{32*ms:.2f} ms")

    # --- 2. fused epoch scan (full update phase) ---
    B, T = 16384, 128
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T, fused_update=True,
                        fused_rollout=True)
    ts0 = ppo.make_train_state(env, cfg, jax.random.PRNGKey(1))
    pt = jax.random.normal(key, (8, B * T), jnp.float32) * 0.3

    for compute in ("float32", "bfloat16"):
        cfg_c = ppo.PPOConfig(num_envs=B, num_steps=T, fused_update=True,
                              fused_rollout=True, compute_dtype=compute)

        @jax.jit
        def upd_step(ts, cfg_c=cfg_c):
            ts2, _ = ppo_fused.fused_epoch_scan(cfg_c, ts, pt, 1, 1, key)
            return ts2

        ms = chain_time(upd_step, ts0)
        log(f"epoch scan 4x8 ({compute}): {ms:.3f} ms")

    # --- 3. fused-full train step ---
    bstate0 = batched_reset(env, env_params, B)
    for compute in ("float32", "bfloat16"):
        cfg_c = ppo.PPOConfig(num_envs=B, num_steps=T, fused_update=True,
                              fused_rollout=True, compute_dtype=compute)

        @jax.jit
        def train_fused(carry, cfg_c=cfg_c):
            ts, bstate, k = carry
            k, k2 = jax.random.split(k)
            ts, bstate, metrics = ppo.train_step(
                env, env_params, cfg_c, ts, bstate, k2)
            return (ts, bstate, k)

        ms = chain_time(train_fused, (ts0, bstate0, key))
        log(f"FUSED-FULL train step ({compute}): {ms:.3f} ms "
            f"({B*T/ms*1e3/1e6:.1f}M steps/s)")

    # --- 4. honest stepping numbers at bench default shape for floors ---
    res = measure(num_envs=1 << 21, num_steps=512, iters=3, mode="pallas")
    log(f"pallas stepping B=2^21 T=512: {res['steps_per_s']/1e9:.3f}B steps/s")
    res = measure(num_envs=1 << 21, num_steps=512, iters=2, mode="xla")
    log(f"xla stepping    B=2^21 T=512: {res['steps_per_s']/1e9:.3f}B steps/s")

    log("DONE")


if __name__ == "__main__":
    main()
