#!/usr/bin/env python
"""Measure the round-5 chain-shortening ablations on chip (VERDICT r4 #3).

Four fused-full PPO configurations at the 4x8 default (B=16384, T=128),
chained+fetched, same session:

  baseline    — round-4 kernel (per-step PRNG + Box-Muller in the loop)
  pregen      — rollout_pregen_noise=True (vectorized noise pre-pass into
                VMEM planes; the dependent loop reads scratch)
  fold        — rollout_fold_obs=True (obs affine map folded into W1/b1)
  pregen+fold — both

Also times the isolated rollout phase via the closed-form proxy config if
requested. Health controls bracket the run so a degraded session
self-identifies (BENCH_NOTES "Round 5"). Appends one JSON line per config
to stdout and a summary record to scripts/variance_log.jsonl.
"""

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "variance_log.jsonl")


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    from gym_fishing_tpu.bench.throughput import (
        device_health_matmul_ms,
        measure_ppo_train,
    )

    num_envs = int(os.environ.get("ABLATE_NUM_ENVS", 16384))
    num_steps = int(os.environ.get("ABLATE_NUM_STEPS", 128))
    iters = int(os.environ.get("ABLATE_ITERS", 10))

    rec = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "session": os.environ.get("VARIANCE_SESSION", f"pid{os.getpid()}"),
        "kind": "ablate_chain_shortening",
        "config": {"num_envs": num_envs, "num_steps": num_steps,
                   "iters": iters},
    }
    rec["health_pre_ms"] = round(device_health_matmul_ms(), 3)
    print(json.dumps({"health_pre_ms": rec["health_pre_ms"]}), flush=True)

    # NB: since round 5 the PPOConfig defaults are pregen+fold ON, and
    # measure_ppo_train(None) INHERITS them — the ablation baseline must
    # force both off explicitly.
    variants = [
        ("baseline", dict(pregen_noise=False, fold_obs=False)),
        ("pregen", dict(pregen_noise=True, fold_obs=False)),
        ("fold", dict(pregen_noise=False, fold_obs=True)),
        ("pregen+fold", dict(pregen_noise=True, fold_obs=True)),
    ]
    # repeats-and-min: the degraded tunnel adds ~0.7 s RPC stalls
    # stochastically per timed window (round-5 observation, variance_log
    # r5-probe-* entries); the MIN over k windows converges to the true
    # per-iter time as soon as one window dodges a stall. Healthy sessions:
    # the k windows agree within the documented ±15%.
    repeats = int(os.environ.get("ABLATE_REPEATS", 3))
    for name, kw in variants:
        windows = []
        for _ in range(repeats):
            res = measure_ppo_train(
                num_envs=num_envs, num_steps=num_steps, iters=iters, **kw
            )
            windows.append(res["seconds"] / iters * 1e3)
        rec[name] = {
            "ms_per_iter_windows": [round(w, 3) for w in windows],
            "ms_per_iter_min": round(min(windows), 3),
            "steps_per_s_best": num_envs * num_steps / (min(windows) / 1e3),
            "mode": res["mode"],
        }
        print(json.dumps({name: rec[name]}), flush=True)

    rec["health_post_ms"] = round(device_health_matmul_ms(), 3)
    print(json.dumps({"health_post_ms": rec["health_post_ms"]}), flush=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
