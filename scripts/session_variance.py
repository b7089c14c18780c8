#!/usr/bin/env python
"""One session-variance sample: health controls + a short big-config bench.

VERDICT r4 #6: r03 vs r04 recorded 7.0 B vs 13.3-13.8 B pallas steps/s for
identical code — a 2x SESSION-level spread (axon tunnel attach sessions vary;
same-session repeats are tight, ±15%). Floors must be derived from the
observed minimum of HEALTHY sessions, so this script measures one sample per
process invocation (a fresh process = a fresh tunnel attach session) and
appends a JSON line to scripts/variance_log.jsonl:

    {"ts": ..., "session": ..., "kind": "bench",
     "health_pre_ms": ..., "health_post_ms": ...,
     "pallas_steps_per_s": ..., "xla_steps_per_s": ...}

Run it N times (sequentially — ONE tpu client at a time) across the round:

    for i in 1 2 3; do timeout 900 python scripts/session_variance.py; done

BENCH_NOTES "Round 5" aggregates the log into the variance table.
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


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    import jax

    from gym_fishing_tpu.bench.throughput import (
        device_health_matmul_ms,
        measure,
    )

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    rec = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "session": os.environ.get("VARIANCE_SESSION", f"pid{os.getpid()}"),
        "kind": "bench",
        "on_tpu": on_tpu,
    }
    rec["health_pre_ms"] = round(device_health_matmul_ms(), 3)
    # bench-default big config, short window (2 iters keeps a degraded
    # session from eating the round; the chained+fetched methodology makes
    # even 2 iters honest)
    num_envs = int(os.environ.get("VARIANCE_NUM_ENVS", 1 << 21))
    num_steps = int(os.environ.get("VARIANCE_NUM_STEPS", 512))
    iters = int(os.environ.get("VARIANCE_ITERS", 2))
    try:
        pal = measure(num_envs=num_envs, num_steps=num_steps, iters=iters,
                      warmup=1, mode="pallas")
        rec["pallas_steps_per_s"] = pal["steps_per_s"]
    except Exception:
        # no compiled-Pallas tier off-TPU (the Mosaic kernel is the point of
        # this sample on hardware; the XLA row below still measures) — keep
        # the harness smoke-testable on CPU
        if on_tpu:
            raise
        rec["pallas_steps_per_s"] = measure(
            num_envs=num_envs, num_steps=num_steps, iters=iters, warmup=1,
            mode="xla",
        )["steps_per_s"]
    xla = measure(num_envs=num_envs, num_steps=num_steps, iters=iters,
                  warmup=1, mode="xla")
    rec["xla_steps_per_s"] = xla["steps_per_s"]
    rec["health_post_ms"] = round(device_health_matmul_ms(), 3)
    rec["config"] = {"num_envs": num_envs, "num_steps": num_steps,
                     "iters": iters}
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
