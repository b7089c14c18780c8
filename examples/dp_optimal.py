#!/usr/bin/env python
"""Solve the fishing MDP exactly by dynamic programming and compare the
optimal policy against the closed-form baselines and (optionally) a PPO run.

This is the Boettiger-lab evaluation loop the reference envs were built for:
RL results are judged against the true DP optimum of the discretized MDP.

    python examples/dp_optimal.py --env fishing-v1 --sigma 0.05 --gamma 0.995
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="fishing-v1")
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--gamma", type=float, default=0.995)
    ap.add_argument("--n-states", type=int, default=257)
    ap.add_argument("--n-quotas", type=int, default=129)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--out", default=None, help="write policy-function plot here")
    args = ap.parse_args()

    import numpy as np

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.agents import dp, escapement, msy
    from gym_fishing_tpu.analysis import simulate_mdp

    env, params = gft.make(args.env, sigma=args.sigma)
    pol_dp = dp(env, params, gamma=args.gamma,
                n_states=args.n_states, n_quotas=args.n_quotas)
    sol = pol_dp.solution
    print(f"value iteration: {int(sol.iterations)} sweeps, "
          f"residual {float(sol.residual):.2e}")
    print(f"V(init={float(np.asarray(params.init_state)):.2f}) = "
          f"{np.interp(float(np.asarray(params.init_state)), np.asarray(sol.grid), np.asarray(sol.V)):.3f}")

    from gym_fishing_tpu.agents import policy_evaluation

    x0 = float(np.asarray(params.init_state))
    mdp = None
    for name, pol in [("dp", pol_dp), ("msy", msy(env, params)),
                      ("escapement", escapement(env, params))]:
        df = simulate_mdp(env, pol, reps=args.reps, params=params)
        ret = df.groupby("rep").reward.sum()
        V_pi, mdp = policy_evaluation(
            env, pol.quota, params, gamma=args.gamma,
            n_states=args.n_states, n_quotas=args.n_quotas, mdp=mdp,
        )
        v0 = np.interp(x0, np.asarray(mdp.grid), np.asarray(V_pi))
        print(f"{name:12s} mean return {ret.mean():8.3f}  (sd {ret.std():.3f})"
              f"   exact discounted value V^pi({x0:.2f}) = {v0:.3f}")

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        grid = np.asarray(sol.grid)
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(grid, np.asarray(sol.policy_quota), label="DP optimal quota")
        ax.plot(grid, np.maximum(grid - 0.5, 0.0), "--", label="escapement K/2")
        ax.set_xlabel("stock")
        ax.set_ylabel("quota")
        ax.legend()
        fig.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
