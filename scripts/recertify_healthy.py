#!/usr/bin/env python
"""Re-certify the headline numbers in a HEALTHY tunnel session.

Round 5's degraded-all-round tunnel left two numbers extrapolated rather
than measured (BENCH_NOTES "Round 5c"): the healthy default fused-full PPO
iteration with chain-shortening (expected ~15.1 ms) and the healthy full
fast stack (bf16 + fused_adam + chain-shortening, expected ~14 ms ≈ 150 M
steps/s). This script refuses to run unless the health control is actually
healthy, then measures both plus the big-config stepping tiers, and appends
the record to scripts/variance_log.jsonl.

    timeout 2400 python scripts/recertify_healthy.py   # exits 3 if degraded
"""

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.environ.get(
    "VARIANCE_LOG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "variance_log.jsonl"),
)
HEALTHY_MS = 20.0


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    from gym_fishing_tpu.bench.throughput import (
        device_health_matmul_ms,
        measure,
        measure_ppo_train,
    )

    pre = round(min(device_health_matmul_ms(), device_health_matmul_ms()), 3)
    if pre > HEALTHY_MS:
        print(json.dumps({"skip": "tunnel degraded", "health_ms": pre}))
        return 3

    rec = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "session": os.environ.get("VARIANCE_SESSION", f"pid{os.getpid()}"),
        "kind": "recertify_healthy",
        "health_pre_ms": pre,
    }
    print(json.dumps({"health_pre_ms": pre}), flush=True)

    for name, kw in [
        ("ppo_default", dict()),
        ("ppo_fast_stack", dict(compute_dtype="bfloat16", fused_adam=True)),
    ]:
        ws = []
        for _ in range(3):
            r = measure_ppo_train(num_envs=16384, num_steps=128, iters=10,
                                  warmup=1, **kw)
            ws.append(r["seconds"] / 10 * 1e3)
        rec[name] = {
            "ms_per_iter_windows": [round(w, 3) for w in ws],
            "ms_per_iter_min": round(min(ws), 3),
            "steps_per_s_best": 16384 * 128 / (min(ws) / 1e3),
            "mode": r["mode"],
        }
        print(json.dumps({name: rec[name]}), flush=True)

    pal = measure(num_envs=1 << 21, num_steps=512, iters=3, warmup=1,
                  mode="pallas")
    rec["pallas_steps_per_s"] = pal["steps_per_s"]
    xla = measure(num_envs=1 << 21, num_steps=512, iters=3, warmup=1,
                  mode="xla")
    rec["xla_steps_per_s"] = xla["steps_per_s"]
    rec["health_post_ms"] = round(device_health_matmul_ms(), 3)
    print(json.dumps({k: rec[k] for k in
                      ("pallas_steps_per_s", "xla_steps_per_s",
                       "health_post_ms")}), flush=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
