"""Sweep envs_per_block for the fused policy-rollout kernel on the chip.

Round-4 re-analysis (VERDICT r3 #2): at E=1024 the kernel is NOT
latency-bound — the two merged [128,128]@[128,1024] matmuls per step total
137 GFLOP per 16384x128 rollout, and the measured 3.35 ms is ~82% of the
f32 MXU rate, i.e. the phase sits near the f32 matmul-throughput roofline.
That also explains this sweep's shape: E 512->1024 only buys the residual
per-program overhead, and wider blocks can't help. The >=2048 TPU-compile
crash is VMEM oversubscription, by arithmetic: the (8, T=128, E) packed
output block is 8 MiB at E=2048, double-buffered 16 MiB, plus 2 MiB of
rew/done scratch > the ~16 MiB/core VMEM — the remote tpu_compile_helper
dies instead of erroring. The implemented roofline lever is
compute="bfloat16" on the two hidden matmuls (native-rate MXU, f32
accumulation) — see policy_rollout_kernel.py and BENCH_NOTES "Round 4".
Methodology: chained iterations + host value fetch (BENCH_NOTES "Round 3b").
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
from gym_fishing_tpu.kernels.policy_rollout_kernel import pallas_policy_rollout
from gym_fishing_tpu.registry.registry import make

B, T = 16384, 128
ITERS = 20


def main():
    env, env_params = make("fishing-v1", sigma=0.05)
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T)
    ts = ppo.make_train_state(env, cfg, jax.random.PRNGKey(1))
    bstate0 = batched_reset(env, env_params, B)
    weights = ppo_fused.kernel_weights(ts.params, "gaussian")
    scalars = ppo_fused.rollout_scalars(env_params, 0.0)
    interp = jax.default_backend() != "tpu"

    for eblk in (512, 1024, 2048, 4096):
        @jax.jit
        def step(carry, eblk=eblk):
            stock, t, hv, ret, ln = carry
            roll = pallas_policy_rollout(
                stock, t, hv, ret, ln, weights, scalars,
                num_steps=T, envs_per_block=eblk,
                growth="logistic", noise_form="additive",
                scheme="continuous", interpret=interp,
            )
            return (roll.stock, roll.t, roll.harvest, roll.ep_ret, roll.ep_len)

        carry = (
            bstate0.env.stock.astype(jnp.float32), bstate0.env.t,
            bstate0.env.harvest.astype(jnp.float32),
            bstate0.episode_return.astype(jnp.float32),
            bstate0.episode_length,
        )
        try:
            s = carry
            for _ in range(3):
                s = step(s)
            float(np.asarray(s[0])[0])
            s = carry
            t0 = time.perf_counter()
            for _ in range(ITERS):
                s = step(s)
            float(np.asarray(s[0])[0])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"E={eblk:5d} grid={B//eblk:3d}: {ms:7.3f} ms "
                  f"({B*T/ms*1e3/1e6:7.1f}M steps/s)")
        except Exception as e:
            print(f"E={eblk:5d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
