"""Sweep the fused PPO update kernel's tile size on the chip.

One epoch = a full pass over N = B*T = 2.1M samples. At tile=2048 that is
1024 sequential grid programs; if the epoch is grid-step-overhead-bound
(DMA + program switch dominating the 7 small matmuls), bigger tiles should
win roughly linearly until the per-tile matmul time dominates. Methodology:
chained iterations (weights updated from the produced grads) + host fetch.
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
ITERS = 10


def main():
    env, env_params = make("fishing-v1", sigma=0.05)
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T, fused_update=True,
                        fused_rollout=True)
    ts = ppo.make_train_state(env, cfg, jax.random.PRNGKey(1))
    bstate0 = batched_reset(env, env_params, B)
    interp = jax.default_backend() != "tpu"
    roll, _ = jax.jit(
        lambda ts, bstate, key: ppo_fused.fused_rollout_collect(
            env, env_params, cfg, ts, bstate, key, interpret=interp
        )
    )(ts, bstate0, jax.random.PRNGKey(0))
    packed_t = jax.block_until_ready(roll.packed_t)
    n = packed_t.shape[1]

    for tile in (2048, 4096, 8192, 16384):
        ntiles = n // tile

        @jax.jit
        def step(params, tile=tile, ntiles=ntiles):
            grads, _ = ppo_fused.fused_grad(
                params, packed_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
                obs_dim=1, act_dim=1, tile=tile,
                tile_order=jnp.arange(ntiles, dtype=jnp.int32),
                interpret=interp,
            )
            return jax.tree_util.tree_map(
                lambda w, g: w - 1e-12 * g, params, grads
            )

        try:
            p = ts.params
            for _ in range(3):
                p = step(p)
            float(np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[0])
            p = ts.params
            t0 = time.perf_counter()
            for _ in range(ITERS):
                p = step(p)
            float(np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[0])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"tile={tile:6d} grid={ntiles:5d}: {ms:7.3f} ms/full-pass "
                  f"(x4 epochs = {4*ms:6.2f} ms)")
        except Exception as e:
            print(f"tile={tile:6d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
