#!/usr/bin/env python
"""Decompose PPO iteration cost on the attached chip (VERDICT round-1 item 4).

Times each phase of agents/ppo.py's train_step separately at the benchmark
config (B=16384, T=128) so update-phase optimization targets the measured
bottleneck, not a guess:

  rollout | GAE | packing | permutation | row-gather | one grad minibatch |
  adam apply | full epoch pass | full train_step at several epoch configs

Usage: python scripts/profile_ppo_update.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

from gym_fishing_tpu import registry
from gym_fishing_tpu.agents import ppo
from gym_fishing_tpu.batch import batched_reset


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T)
    env, env_params = registry.make("fishing-v1")
    key = jax.random.key(0)
    ts = ppo.make_train_state(env, cfg, key)
    bstate = batched_reset(env, env_params, B)
    N = B * T
    print(f"B={B} T={T} N={N} device={jax.devices()[0].platform}")

    if os.environ.get("PROFILE_SKIP_PARTS"):
        _train_step_configs(env, env_params, cfg, ts, bstate, key, N)
        return

    # --- rollout ---
    roll = jax.jit(lambda ts, bs, k: ppo.collect_rollout(env, env_params, cfg, ts, bs, k))
    dt, (bstate2, obs_last, traj, last_value) = timeit(roll, ts, bstate, key, iters=10)
    print(f"rollout            {dt*1e3:8.2f} ms")

    # --- GAE ---
    gae = jax.jit(lambda tr, lv: ppo.compute_gae(cfg, tr, lv))
    dt, (adv, ret) = timeit(gae, traj, last_value)
    print(f"GAE                {dt*1e3:8.2f} ms")

    # --- packing ---
    def pack(traj, adv, ret):
        def fl2(x):
            x = x.reshape((-1,) + x.shape[2:])
            return x[:, None] if x.ndim == 1 else x
        return jnp.concatenate(
            [fl2(traj.obs), fl2(traj.action.astype(jnp.float32)), fl2(traj.logp),
             fl2(traj.value), fl2(adv), fl2(ret)], axis=1)

    packj = jax.jit(pack)
    dt, packed = timeit(packj, traj, adv, ret)
    print(f"pack [N,{packed.shape[1]}]        {dt*1e3:8.2f} ms")

    # --- permutation generation ---
    permf = jax.jit(lambda k: jax.random.permutation(k, N))
    dt, perm = timeit(permf, key)
    print(f"random.permutation {dt*1e3:8.2f} ms")

    # --- row gather ---
    gatherf = jax.jit(lambda p, pm: jnp.take(p, pm, axis=0))
    dt, shuffled = timeit(gatherf, packed, perm)
    print(f"row-gather         {dt*1e3:8.2f} ms")

    # --- one grad minibatch (jax.grad XLA path) ---
    mb_size = N // cfg.num_minibatches
    mb = shuffled[:mb_size]
    obs_dim = traj.obs.shape[-1]

    def unpack(mb):
        return (mb[:, :obs_dim], mb[:, obs_dim:obs_dim + 1],
                mb[:, obs_dim + 1], mb[:, obs_dim + 2], mb[:, obs_dim + 3],
                mb[:, obs_dim + 4])

    def grad_mb(ts, mb):
        gf = jax.value_and_grad(
            lambda p: ppo.ppo_loss(ts.apply_fn, p, cfg, unpack(mb), True),
            has_aux=True)
        (loss, m), grads = gf(ts.params)
        return grads

    gradj = jax.jit(grad_mb)
    dt, grads = timeit(gradj, ts, mb)
    print(f"grad minibatch ({mb_size})  {dt*1e3:8.2f} ms   (x{cfg.num_minibatches} = {dt*cfg.num_minibatches*1e3:.2f} ms/epoch)")

    # --- adam apply alone ---
    adamj = jax.jit(lambda ts, g: ts.apply_gradients(grads=g))
    dt, _ = timeit(adamj, ts, grads)
    print(f"adam apply         {dt*1e3:8.2f} ms   (x{cfg.num_minibatches} = {dt*cfg.num_minibatches*1e3:.2f} ms/epoch)")

    # --- full epoch (scan over minibatches, grad+adam) ---
    def epoch(ts, shuffled):
        mbs = shuffled.reshape((cfg.num_minibatches, mb_size, shuffled.shape[1]))

        def minibatch(ts, mb):
            gf = jax.value_and_grad(
                lambda p: ppo.ppo_loss(ts.apply_fn, p, cfg, unpack(mb), True),
                has_aux=True)
            (loss, m), grads = gf(ts.params)
            return ts.apply_gradients(grads=grads), loss

        ts, losses = jax.lax.scan(minibatch, ts, mbs)
        return ts

    epochj = jax.jit(epoch)
    dt, _ = timeit(epochj, ts, shuffled, iters=10)
    print(f"epoch (grad+adam)  {dt*1e3:8.2f} ms")

    _train_step_configs(env, env_params, cfg, ts, bstate, key, N)


def _train_step_configs(env, env_params, cfg, ts, bstate, key, N):
    """Time full train_step at selected modes/configs.

    PROFILE_MODES / PROFILE_CONFIGS select subsets so each invocation fits
    the remote-AOT compile budget (cache persists across invocations).
    """
    import dataclasses
    all_modes = {
        "xla": ("xla  ", dict()),
        "fused": ("fused", dict(fused_update=True)),
        "full": ("full ", dict(fused_update=True, fused_rollout=True)),
    }
    sel = os.environ.get("PROFILE_MODES", "xla,fused,full").split(",")
    csel = os.environ.get("PROFILE_CONFIGS", "1x1,2x2,4x8").split(",")
    configs = [tuple(int(v) for v in c.split("x")) for c in csel]
    for tag, kw in (all_modes[m] for m in sel):
        for (e, m) in configs:
            c = dataclasses.replace(cfg, epochs=e, num_minibatches=m, **kw)
            stepj = jax.jit(lambda ts, bs, k, c=c: ppo.train_step(env, env_params, c, ts, bs, k))
            dt, _ = timeit(stepj, ts, bstate, key, iters=5, warmup=1)
            print(f"train_step {tag} e{e}xm{m}  {dt*1e3:8.2f} ms   {N/dt/1e6:8.1f} M steps/s", flush=True)


if __name__ == "__main__":
    main()
