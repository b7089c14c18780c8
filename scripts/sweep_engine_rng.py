"""XLA-engine RNG-implementation sweep (threefry2x32 vs rbg).

The general lax.scan engine's per-step cost is dominated by the threefry
noise draw (~20-30 VPU ops per normal vs ~20 flops of env math). JAX's
'rbg' key implementation lowers to XLA RngBitGenerator (TPU hardware RNG
path) with identical counter-based splitting semantics at the API level;
this script measures the engine with each key impl at the bench default.
Chained+fetched methodology (BENCH_NOTES "Round 3b").

The engine itself is key-impl-agnostic: every draw flows from the caller's
key, so passing `jax.random.key(seed, impl="rbg")` switches the whole
rollout. Trajectories are NOT bitwise comparable across impls (different
streams), but both are valid counter-based PRNGs; exactness tests pin
semantics via injected noise, not key equality (SURVEY.md §7.4).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np
import jax
import jax.numpy as jnp

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.policies import escapement
from gym_fishing_tpu.batch import batched_reset, batched_step


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    B = int(os.environ.get("B", 1 << 21))
    T = int(os.environ.get("T", 512))
    iters = 5
    env, params = gft.make("fishing-v1", sigma=0.05)
    pol = escapement(env, params)

    for impl in ("threefry2x32", "rbg"):
        def run(state, key):
            obs0 = jax.vmap(env.get_obs, in_axes=(None, 0))(params, state.env)

            def body(carry, k):
                st, obs = carry
                st, ts = batched_step(env, params, st, pol.act(obs), k,
                                      autoreset=True)
                return (st, ts.obs), ts.reward.sum()

            keys = jax.random.split(key, T)
            (state2, _), rew = jax.lax.scan(body, (state, obs0), keys)
            return state2, rew.sum()

        runj = jax.jit(run, donate_argnums=(0,))
        state = batched_reset(env, params, B)
        key = jax.random.key(0, impl=impl)
        for _ in range(3):
            key, sub = jax.random.split(key)
            out = runj(state, sub)
            state = out[0]
        fetch(out[1])
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            out = runj(state, sub)
            state = out[0]
        fetch(out[1])
        dt = time.perf_counter() - t0
        sps = B * T * iters / dt
        print(f"{impl:>12}: {sps/1e9:6.3f} B steps/s "
              f"({dt/iters*1e3:7.1f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
