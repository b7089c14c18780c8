"""Round-4 honest re-measurement of every claim struck by the round-3b
methodology correction (VERDICT r3 item 1).

All timings: chained deps + host value fetch (scripts/truebench.py
discipline). Covers, in order:

1. XLA lax.scan engine at the bench default (B=2^21, T=512) — closes
   README's "re-measure pending" row and recalibrates the xla bench floor.
2. Pallas closed-form kernel at BOTH configs (B=16384/T=128 and
   B=2^21/T=512) plus an intermediate, quantifying the per-call dispatch
   amortization behind the 1.35 B vs 7-8 B ambiguity (VERDICT Weak #3).
3. Per-growth-model kernel table at the bench default (replaces the
   inflated round-2 table).
4. sin+cos Box-Muller pairing ablation (pair feeds 2 steps vs fresh pair
   per step, second normal discarded) — re-validates or refutes DESIGN.md's
   "transcendental-bound" narrative under the honest methodology.

Prints incrementally; paste results into BENCH_NOTES "Round 4".
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np
import jax
import jax.numpy as jnp

t_start = time.time()


def log(msg):
    print(f"[{time.time()-t_start:7.1f}s] {msg}", flush=True)


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def chain_time(step, state, iters=5, warmup=3):
    s = state
    for _ in range(warmup):
        s = step(s)
    fetch(s)
    s = state
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    fetch(s)
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def kernel_steps_per_s(B, T, growth="logistic", noise_form="additive",
                       ablate=False, iters=5):
    from gym_fishing_tpu.kernels import make_scalars, pallas_rollout
    from gym_fishing_tpu.registry.registry import make

    env_id = "fishing-v1"
    env, params = make(env_id, sigma=0.05) if growth == "logistic" else make(
        env_id, sigma=0.05, growth=growth)
    scal = make_scalars(params, 0.5, seed=0)
    t0s = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def step(stock):
        out = pallas_rollout(
            stock, t0s, scal, T, growth=growth, noise_form=noise_form,
            policy="escapement", ablate_no_pairing=ablate,
        )
        return out.stock

    stock0 = jnp.full((B,), 0.75, jnp.float32)
    ms = chain_time(step, stock0, iters=iters)
    return B * T / ms * 1e3, ms


def main():
    log("connecting to device...")
    fetch(jnp.ones((8, 128)) + 1)
    dev = jax.devices()[0]
    log(f"device up: {dev.device_kind}")

    from gym_fishing_tpu.bench.throughput import measure

    results = {}

    # ---- 1. XLA engine at the bench default ----
    log("1. XLA lax.scan engine, B=2^21 T=512 (bench default)...")
    r = measure(env_id="fishing-v1", num_envs=1 << 21, num_steps=512,
                iters=5, mode="xla")
    results["xla_default"] = r["steps_per_s"]
    log(f"   XLA engine: {r['steps_per_s']/1e9:.3f} B steps/s "
        f"({r['steps_per_s']/50e6:.1f}x target)")

    # ---- 2. Pallas kernel, config sweep (dispatch amortization) ----
    log("2. Pallas kernel config sweep...")
    for (B, T) in [(16384, 128), (1 << 18, 512), (1 << 21, 512)]:
        sps, ms = kernel_steps_per_s(B, T)
        results[f"pallas_B{B}_T{T}"] = sps
        log(f"   pallas B={B:>8} T={T:>4}: {ms:8.3f} ms/call -> "
            f"{sps/1e9:6.3f} B steps/s")

    # ---- 3. per-growth-model table at bench default ----
    log("3. per-growth-model kernel table (B=2^21, T=512)...")
    for g in ("logistic", "ricker", "beverton_holt", "allen", "myers", "may"):
        nf = "additive" if g in ("logistic", "allen", "may") else "lognormal"
        sps, ms = kernel_steps_per_s(1 << 21, 512, growth=g, noise_form=nf)
        results[f"growth_{g}"] = sps
        log(f"   {g:<14} ({nf:<9}): {sps/1e9:6.3f} B steps/s ({ms:7.2f} ms)")

    # ---- 4. sin/cos pairing ablation ----
    log("4. Box-Muller pairing ablation (B=2^21, T=512, logistic)...")
    sps_pair, ms_pair = kernel_steps_per_s(1 << 21, 512, ablate=False)
    sps_nopair, ms_nopair = kernel_steps_per_s(1 << 21, 512, ablate=True)
    results["pairing_on"] = sps_pair
    results["pairing_off"] = sps_nopair
    log(f"   paired (1 pair / 2 steps): {sps_pair/1e9:6.3f} B steps/s "
        f"({ms_pair:.2f} ms)")
    log(f"   ablated (1 pair / step)  : {sps_nopair/1e9:6.3f} B steps/s "
        f"({ms_nopair:.2f} ms)")
    log(f"   pairing speedup: {sps_pair/sps_nopair:.2f}x")

    import json
    log("RESULTS " + json.dumps(results))


if __name__ == "__main__":
    main()
