#!/usr/bin/env python
"""Headline benchmark: batched fishing-v1 env-steps/s on the available chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

vs_baseline is measured against the driver's 50M env-steps/s/chip target
(the reference itself publishes no numbers — BASELINE.md).

Options (env vars): BENCH_NUM_ENVS, BENCH_NUM_STEPS, BENCH_ITERS, BENCH_ENV.
"""

import json
import os


def main() -> None:
    # amortize remote/AOT compiles across bench invocations
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 1 << 21))
    num_steps = int(os.environ.get("BENCH_NUM_STEPS", 512))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    env_id = os.environ.get("BENCH_ENV", "fishing-v1")
    mode = os.environ.get("BENCH_MODE", "pallas")  # pallas | xla

    from gym_fishing_tpu.bench.throughput import measure

    try:
        res = measure(
            env_id=env_id, num_envs=num_envs, num_steps=num_steps, iters=iters,
            mode=mode,
        )
    except Exception:
        if mode != "xla":  # pallas unavailable (e.g. CPU-only) -> XLA path
            res = measure(
                env_id=env_id, num_envs=num_envs, num_steps=num_steps,
                iters=iters, mode="xla",
            )
        else:
            raise
    print(
        json.dumps(
            {
                "metric": f"env-steps/s per chip ({env_id} batched)",
                "value": res["steps_per_s"],
                "unit": "steps/s",
                "vs_baseline": res["vs_baseline"],
            }
        )
    )


if __name__ == "__main__":
    main()
