#!/usr/bin/env python
"""Hardware-gated end-to-end validation of the fully-fused PPO path.

The fused kernels change two things relative to the XLA train_step that the
z=0 parity tests cannot see: the rollout/action-sampling RNG (on-chip PRNG +
Box-Muller instead of threefry) and the minibatch composition (tile-granular
zero-copy shuffle instead of a full row permutation). The proof that neither
hurts LEARNING is a real training run: fused-full PPO at the benchmark config
must reach the same closed-form-optimal neighborhood the XLA path reaches
(BENCH_NOTES: XLA PPO 7.40 after 300 iters; escapement 7.72, DP optimum
V* = 7.68 at sigma=0.05).

The Mosaic interpreter's PRNG is zero on CPU (training would be degenerate),
so this MUST run on a real TPU; on CPU it prints SKIP and exits 0 (exit 2
with --require-tpu). Prints one JSON line and PASS/FAIL; exit 1 on FAIL.

--agreement (VERDICT r3 #8) additionally trains the pure-XLA path with the
same config/seed and asserts the two episode-return curves agree at EVERY
checkpoint (10-iter window means every 30 iters, |fused - XLA| <= tol),
not just at the end — so an RNG or shuffle regression that merely SLOWS
learning (same final plateau, different path) is caught. At B=16384 the
metric is an average over 16k envs, so despite fully different RNG streams
the curves match to ~0.01 when healthy (BENCH_NOTES round-3 table); the
default tol of 0.25 is ~25x that, trips only on a real learning change.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--require-tpu", action="store_true")
    ap.add_argument("--num-envs", type=int, default=16384)
    ap.add_argument("--num-steps", type=int, default=128)
    # calibration (measured on v5e, 2026-08-20, seed 0): the XLA path and the
    # fused-full path track each other at every 40-iter checkpoint
    # (1.90 -> 7.54 over 400 iters, final10 7.543 fused vs 7.546 XLA); both
    # are only at ~6.4-6.9 by iter 200, so 200/7.0 would fail EVERY path.
    ap.add_argument("--iterations", type=int, default=300)
    ap.add_argument("--threshold", type=float, default=7.0,
                    help="min final episode return (escapement=7.72)")
    ap.add_argument("--compute", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute_dtype for the fused path (bfloat16 "
                         "validates the mixed-precision kernels' learning)")
    ap.add_argument("--agreement", action="store_true",
                    help="also train the pure-XLA path and assert "
                         "per-checkpoint agreement of the learning curves")
    ap.add_argument("--agreement-tol", type=float, default=0.25)
    ap.add_argument("--chain-shortening", action="store_true",
                    help="enable rollout_pregen_noise + rollout_fold_obs on "
                         "the fused path (round-5 ablation flags)")
    ap.add_argument("--fused-adam", action="store_true",
                    help="run the in-kernel clip+Adam on the fused path")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax

    if not any(d.platform == "tpu" for d in jax.devices()):
        print("SKIP: no TPU attached (kernel PRNG is zero under interpret)")
        return 2 if args.require_tpu else 0

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.agents import ppo

    import numpy as np

    env, params = gft.make("fishing-v1", sigma=0.05)

    def run_path(fused_update: bool, fused_rollout: bool):
        cfg = ppo.PPOConfig(
            num_envs=args.num_envs, num_steps=args.num_steps,
            fused_update=fused_update, fused_rollout=fused_rollout,
            compute_dtype=args.compute if fused_update else "float32",
            rollout_pregen_noise=args.chain_shortening and fused_rollout,
            rollout_fold_obs=args.chain_shortening and fused_rollout,
            fused_adam=args.fused_adam and fused_update,
        )
        t0 = time.perf_counter()
        ts, history = ppo.train(
            env, cfg, seed=0, iterations=args.iterations, env_params=params
        )
        wall = time.perf_counter() - t0
        rets = np.asarray([h["episode_return"] for h in history], np.float64)
        rets = np.where(np.isfinite(rets), rets, np.nan)
        return rets, wall

    def checkpoints(rets, every=30, window=10):
        """Mean episode return over [c-window, c) for c = every, 2*every..."""
        out = []
        for c in range(every, rets.size + 1, every):
            out.append(float(np.nanmean(rets[c - window:c])))
        return out

    rets, wall = run_path(fused_update=True, fused_rollout=True)
    valid = rets[np.isfinite(rets)]
    final = float(np.mean(valid[-10:]))
    first = float(valid[0]) if valid.size else float("nan")
    steps = args.iterations * args.num_envs * args.num_steps
    ok = final >= args.threshold
    line = {
        "metric": "fused-full PPO episode return (fishing-v1, sigma=0.05)",
        "first_iter": round(first, 3),
        "final": round(final, 3),
        "threshold": args.threshold,
        "escapement_baseline": 7.72,
        "dp_optimum": 7.68,
        "iterations": args.iterations,
        "env_steps": steps,
        "wall_s_incl_compile": round(wall, 1),
    }

    if args.agreement:
        xla_rets, xla_wall = run_path(fused_update=False, fused_rollout=False)
        cp_f = checkpoints(rets)
        cp_x = checkpoints(xla_rets)
        gaps = [abs(a - b) for a, b in zip(cp_f, cp_x)]
        agree = all(g <= args.agreement_tol for g in gaps)
        ok = ok and agree
        line["agreement"] = {
            "checkpoint_every": 30,
            "fused": [round(v, 3) for v in cp_f],
            "xla": [round(v, 3) for v in cp_x],
            "max_gap": round(max(gaps), 4) if gaps else None,
            "tol": args.agreement_tol,
            "xla_wall_s": round(xla_wall, 1),
            "ok": agree,
        }

    line["pass"] = ok
    print(json.dumps(line))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
