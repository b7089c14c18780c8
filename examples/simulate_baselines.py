#!/usr/bin/env python
"""Reference-parity analysis script: roll the closed-form policies on every
registered env and write tidy CSVs + plots (reference: simulate/plot usage in
gym_fishing README/notebooks; reconstructed).

    python examples/simulate_baselines.py --out results/
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.agents import escapement, msy
    from gym_fishing_tpu.analysis import plot_mdp, simulate_mdp, write_csv

    os.makedirs(args.out, exist_ok=True)
    for env_id in gft.registered_ids():
        env, params = gft.make(env_id)
        for name, pol_cls in [("msy", msy), ("escapement", escapement)]:
            pol = pol_cls(env, params)
            df = simulate_mdp(env, pol, reps=args.reps, params=params)
            base = os.path.join(args.out, f"{env_id}_{name}")
            write_csv(df, base + ".csv")
            plot_mdp(df, base + ".png")
            ret = df.groupby("rep").reward.sum().mean()
            print(f"{env_id:28s} {name:10s} mean return {ret:8.3f}")


if __name__ == "__main__":
    main()
