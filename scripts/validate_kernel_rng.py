#!/usr/bin/env python
"""Hardware-gated statistical validation of the Pallas kernel's on-chip RNG
(VERDICT r1 next-step #3 / SURVEY §7.4 statistical validation).

The kernel replaces threefry with the TPU per-core PRNG + Box-Muller, so
noisy trajectories can only match the XLA engine *distributionally*. The
Mosaic interpreter's PRNG returns zero bits on CPU, so this MUST run on a
real TPU; on CPU it prints SKIP and exits 0 (exit 2 with --require-tpu).

Checks, at matched (B, T, sigma) with the same escapement policy, no resets:

1. final-stock distribution: KS distance kernel-vs-engine, mean within
   combined standard errors, std ratio;
2. per-env summed-reward distribution: same;
3. independence across envs: the std of per-tile (8x128 block) means must be
   ~ sigma_pop/sqrt(1024); a seed-fold bug that replays one stream across
   lanes/blocks inflates it by orders of magnitude (this is the check that
   would catch the "correlated-stream bug" a marginal KS test can miss);
4. lognormal-noise variant (ricker) repeats check 1;
5. categorical sampling (policy-rollout kernel, discrete env): at step 0 all
   envs share the same observation, so the kernel's inverse-CDF sampler must
   reproduce the policy's softmax probabilities — empirical class
   frequencies within 6 binomial SEs;
6-9. Gaussian policy head (continuous env): step-0 marginals, action-stream
   block independence, and whole-trajectory KS (final stock + in-flight
   return) vs the XLA collect_rollout;
10-12. categorical/relative path (fishing-v0): action-stream block
   independence and the same whole-trajectory KS pair — catches
   action-draw/process-noise stream reuse the step-0 marginals can't see.

Prints one JSON line (driver-recordable) and PASS/FAIL; exit 1 on FAIL.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ks_distance(a, b) -> float:
    import numpy as np

    a = np.sort(np.asarray(a, np.float64))
    b = np.sort(np.asarray(b, np.float64))
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / a.size
    cb = np.searchsorted(b, grid, side="right") / b.size
    return float(np.abs(ca - cb).max())


def engine_rollout(env, params, S, B, T, seed):
    """XLA engine: escapement-policy rollout, final stocks + summed rewards."""
    import jax
    import jax.numpy as jnp

    from gym_fishing_tpu.batch import batched_reset, batched_step

    state = batched_reset(env, params, B)

    def body(carry, k):
        st = carry
        q = jnp.maximum(st.env.stock - S, 0.0)
        a = jnp.clip(q / (params.K * params.action_scale) - 1.0, -1.0, 1.0)[:, None]
        st, ts = batched_step(env, params, st, a, k, autoreset=True)
        return st, ts.reward

    keys = jax.random.split(jax.random.key(seed), T)
    state, rews = jax.lax.scan(body, state, keys)
    return state.env.stock, rews.sum(0)


def kernel_rollout(env, params, S, B, T, seed):
    from gym_fishing_tpu.kernels import make_scalars, pallas_rollout
    import jax.numpy as jnp

    out = pallas_rollout(
        jnp.full((B,), float(params.init_state), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        make_scalars(params, S, seed=seed),
        T,
        growth=env.config.growth,
        noise_form=env.config.noise_form,
        policy="escapement",
    )
    return out.stock, out.reward


def compare(name, kern, eng, B, checks, ks_tol=0.02):
    import numpy as np

    kern = np.asarray(kern, np.float64)
    eng = np.asarray(eng, np.float64)
    d = ks_distance(kern, eng)
    se = math.sqrt(kern.var() / B + eng.var() / B)
    mean_gap_se = abs(kern.mean() - eng.mean()) / max(se, 1e-12)
    std_ratio = float(kern.std() / max(eng.std(), 1e-12))
    ok = d < ks_tol and mean_gap_se < 6.0 and 0.95 < std_ratio < 1.05
    checks[name] = {
        "ks": round(d, 5),
        "mean_kernel": round(float(kern.mean()), 6),
        "mean_engine": round(float(eng.mean()), 6),
        "mean_gap_se": round(mean_gap_se, 2),
        "std_ratio": round(std_ratio, 4),
        "ok": bool(ok),
    }
    return ok


def block_independence(stocks, B, checks, tile=8 * 128,
                       name="block_independence"):
    """Std of per-tile means must be ~ population std / sqrt(tile)."""
    import numpy as np

    s = np.asarray(stocks, np.float64).reshape(B // tile, tile)
    block_means_std = float(s.mean(axis=1).std())
    expected = float(s.std() / math.sqrt(tile))
    ratio = block_means_std / max(expected, 1e-12)
    ok = ratio < 3.0  # a replayed stream inflates this by ~sqrt(tile) ~ 32x
    checks[name] = {
        "block_means_std": round(block_means_std, 6),
        "iid_expectation": round(expected, 6),
        "ratio": round(ratio, 2),
        "ok": bool(ok),
    }
    return ok


def gaussian_policy_sampling(B, T, checks, seed=999):
    """Policy-rollout kernel's Gaussian head vs the XLA collect_rollout.

    (VERDICT r2 weak #5.) Three layers:
    - step-0 action marginals: all envs share obs0, so the kernel's sampled
      actions must have mean = MLP mean(obs0) (within 6 SE) and
      std = exp(log_std) (ratio within 2%);
    - step-0 action block independence: std of per-(8x128)-tile means must
      be ~ sigma_pop/sqrt(1024) — a replayed stream across lanes/blocks
      inflates it by ~32x;
    - whole-trajectory distributions: KS on final stock and on the in-flight
      episode return vs the XLA collect_rollout at matched (B, T, sigma) —
      a std-scale or stream-correlation bug anywhere in the T-step loop
      shifts these.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.agents import ppo, ppo_fused
    from gym_fishing_tpu.batch import batched_reset

    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T, hidden=64)
    ts = ppo.make_train_state(env, cfg, jax.random.key(5))
    # a non-degenerate policy: shrink log_std to 0.25 so episodes survive
    # long enough for the trajectory distributions to be informative
    new_params = dict(ts.params)
    new_params["params"] = dict(ts.params["params"])
    new_params["params"]["log_std"] = jnp.full(
        (1,), float(np.log(0.25)), jnp.float32
    )
    ts = ts.replace(params=new_params)
    bstate = batched_reset(env, params, B)
    roll, kb = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, jax.random.key(seed), interpret=False
    )

    # --- step-0 marginals ---
    acts0 = np.asarray(roll.packed_t[1, :B], np.float64)
    obs0 = jnp.full(
        (1, 1), float(params.init_state) / float(params.K) - 1.0, jnp.float32
    )
    (mean0, log_std), _ = ts.apply_fn(ts.params, obs0)
    mean0 = float(np.asarray(mean0).reshape(()))
    std0 = float(np.exp(np.asarray(log_std).reshape(())))
    se = std0 / math.sqrt(B)
    mean_gap_se = abs(acts0.mean() - mean0) / se
    std_ratio = float(acts0.std() / std0)
    ok = mean_gap_se < 6.0 and 0.98 < std_ratio < 1.02
    checks["gaussian_action_marginals_step0"] = {
        "mean_kernel": round(float(acts0.mean()), 6),
        "mean_mlp": round(mean0, 6),
        "mean_gap_se": round(float(mean_gap_se), 2),
        "std_kernel": round(float(acts0.std()), 6),
        "std_policy": round(std0, 6),
        "std_ratio": round(std_ratio, 4),
        "ok": bool(ok),
    }

    # --- step-0 action stream independence across lanes/blocks ---
    ok &= block_independence(
        acts0, B, checks, name="gaussian_action_block_independence"
    )

    # --- trajectory distributions vs the XLA path ---
    xb, _, xtraj, _ = ppo.collect_rollout(
        env, params, cfg, ts, batched_reset(env, params, B),
        jax.random.key(seed + 1),
    )
    ok &= compare("gaussian_final_stock", kb.env.stock, xb.env.stock, B,
                  checks)
    ok &= compare("gaussian_inflight_return", kb.episode_return,
                  xb.episode_return, B, checks)
    return ok


def categorical_sampling(B, checks, seed=777):
    """Kernel inverse-CDF sampler vs the policy softmax at a shared obs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.agents import ppo, ppo_fused
    from gym_fishing_tpu.batch import batched_reset

    env, params = gft.make("fishing-v0", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(num_envs=B, num_steps=4, hidden=64)
    ts = ppo.make_train_state(env, cfg, jax.random.key(3))
    bstate = batched_reset(env, params, B)
    roll, _ = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, jax.random.key(seed), interpret=False
    )
    acts = np.asarray(roll.packed_t[1, :B])        # step-0 actions (time-major)
    obs0 = jnp.full((1, 1), float(params.init_state) / float(params.K) - 1.0,
                    jnp.float32)
    (logits,), _ = ts.apply_fn(ts.params, obs0)
    probs = np.asarray(jax.nn.softmax(logits[0]), np.float64)
    ok = True
    freqs = []
    for k, p in enumerate(probs):
        f = float((acts == k).mean())
        se = math.sqrt(max(p * (1 - p), 1e-12) / B)
        ok &= abs(f - p) < 6.0 * se
        freqs.append(round(f, 5))
    checks["categorical_sampling"] = {
        "empirical": freqs,
        "softmax": [round(float(p), 5) for p in probs],
        "ok": bool(ok),
    }
    return ok


def categorical_trajectory(B, T, checks, seed=555):
    """Whole-trajectory validation of the DISCRETE (fishing-v0, relative
    decode) fused-rollout path — the categorical analog of checks 8-9
    (VERDICT r3 weak #7). A stream-reuse bug between the kernel's
    action-uniform draw and the process-noise Box-Muller pair would leave
    step-0 marginals (check 5) intact but correlate actions with noise,
    shifting the trajectory distributions vs the XLA engine (which uses
    independent threefry streams). Three layers, matched (B, T, sigma):

    - step-0 action-stream block independence across lanes/blocks;
    - KS on final stock vs ppo.collect_rollout;
    - KS on the in-flight episode return vs ppo.collect_rollout.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.agents import ppo, ppo_fused
    from gym_fishing_tpu.batch import batched_reset

    env, params = gft.make("fishing-v0", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T, hidden=64)
    ts = ppo.make_train_state(env, cfg, jax.random.key(7))
    bstate = batched_reset(env, params, B)
    roll, kb = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, jax.random.key(seed), interpret=False
    )

    acts0 = np.asarray(roll.packed_t[1, :B], np.float64)
    ok = block_independence(
        acts0, B, checks, name="categorical_action_block_independence"
    )

    xb, _, _, _ = ppo.collect_rollout(
        env, params, cfg, ts, batched_reset(env, params, B),
        jax.random.key(seed + 1),
    )
    ok &= compare("categorical_final_stock", kb.env.stock, xb.env.stock, B,
                  checks)
    ok &= compare("categorical_inflight_return", kb.episode_return,
                  xb.episode_return, B, checks)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--require-tpu", action="store_true")
    ap.add_argument("-B", type=int, default=1 << 17)
    ap.add_argument("-T", type=int, default=74)  # < Tmax=100: no auto-resets
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax

    if not any(d.platform == "tpu" for d in jax.devices()):
        print(json.dumps({"kernel_rng_validation": "SKIP", "reason": "no TPU "
                          "(Mosaic interpreter PRNG is all-zeros on CPU)"}))
        return 2 if args.require_tpu else 0

    import gym_fishing_tpu as gft

    B, T, S = args.B, args.T, 0.5
    checks = {}
    ok = True

    # 1+2+3: logistic, additive noise
    env, params = gft.make("fishing-v1", sigma=0.05, Tmax=100)
    ex, er = engine_rollout(env, params, S, B, T, seed=0)
    kx, kr = kernel_rollout(env, params, S, B, T, seed=12345)
    ok &= compare("final_stock_additive", kx, ex, B, checks)
    ok &= compare("summed_reward_additive", kr, er, B, checks)
    ok &= block_independence(kx, B, checks)

    # 4: ricker, lognormal noise
    env2, params2 = gft.make(
        "fishing-ricker-v1", sigma=0.05, Tmax=100, noise_form="lognormal"
    )
    ex2, _ = engine_rollout(env2, params2, S, B, T, seed=1)
    kx2, _ = kernel_rollout(env2, params2, S, B, T, seed=54321)
    ok &= compare("final_stock_lognormal_ricker", kx2, ex2, B, checks)

    # 5: categorical sampler of the policy-rollout kernel
    ok &= categorical_sampling(B, checks)

    # 6: Gaussian head of the policy-rollout kernel (marginals, stream
    # independence, whole-trajectory KS vs the XLA collect_rollout)
    ok &= gaussian_policy_sampling(B, T, checks)

    # 10-12: discrete/relative path whole-trajectory checks (the categorical
    # analog of 8-9; catches action-draw/process-noise stream reuse)
    ok &= categorical_trajectory(B, T, checks)

    print(json.dumps({
        "kernel_rng_validation": "PASS" if ok else "FAIL",
        "B": B, "T": T, "sigma": 0.05,
        "checks": checks,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
