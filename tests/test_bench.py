"""Bench-harness code-path tests (tiny shapes, CPU): the measure() machinery
must produce sane numbers and the trajectory-storing variant must work."""

import gym_fishing_tpu  # noqa: F401
from gym_fishing_tpu.bench.throughput import BASELINE_STEPS_PER_S, measure
from gym_fishing_tpu.bench.profiling import time_fn

import jax
import jax.numpy as jnp


def test_measure_xla_tiny():
    res = measure(num_envs=64, num_steps=8, iters=2, warmup=1, mode="xla")
    assert res["steps_per_s"] > 0
    assert res["vs_baseline"] == res["steps_per_s"] / BASELINE_STEPS_PER_S
    assert res["mode"] == "xla"


def test_measure_store_trajectory():
    res = measure(num_envs=32, num_steps=8, iters=1, warmup=1, store_trajectory=True)
    assert res["steps_per_s"] > 0


def test_weak_scaling_functional_on_virtual_mesh():
    """weak_scaling runs on the 8-virtual-device mesh and returns a sane
    curve (functional check only: virtual devices share 2 physical cores, so
    efficiency here measures core contention, not interconnect — see
    BENCH_NOTES.md 'Scaling')."""
    from gym_fishing_tpu.bench.scaling import weak_scaling

    res = weak_scaling(
        envs_per_device=64, num_steps=8, iters=2, device_counts=[1, 2, 4, 8]
    )
    assert set(res["throughput"]) == {1, 2, 4, 8}
    assert all(v > 0 for v in res["throughput"].values())
    assert res["efficiency"][1] == 1.0
    assert all(0 < e <= 1.5 for e in res["efficiency"].values())


def test_time_fn():
    f = jax.jit(lambda x: (x * 2).sum())
    out = time_fn(f, jnp.ones(128), iters=3, warmup=1)
    assert out["seconds_per_call"] > 0 and out["iters"] == 3


def test_measure_ppo_train_fast_tier_tiny():
    """The bench fast tier (bfloat16 + fused_adam plumbing) exercises the
    same code path bench.py records as ppo_bf16_steps_per_s; fused='off'
    keeps it runnable on CPU."""
    from gym_fishing_tpu.bench.throughput import measure_ppo_train

    res = measure_ppo_train(
        num_envs=64, num_steps=8, iters=1, warmup=1, fused="off",
        compute_dtype="bfloat16",
    )
    assert res["steps_per_s"] > 0
    assert res["compute_dtype"] == "bfloat16"
    assert res["mode"] == "ppo-off"


def test_bench_floor_skip_requires_both_ends_degraded():
    """The regression-gate skip predicate (VERDICT r4 #1): a healthy health
    control at EITHER end of the run keeps the perf floors armed; only a
    run degraded at both ends skips them."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench._floors_skipped(500.0, 300.0) is True     # r04-style sick run
    assert not bench._floors_skipped(500.0, 2.1)           # transient pre blip
    assert not bench._floors_skipped(2.1, 500.0)           # degraded at exit
    assert not bench._floors_skipped(2.1, 2.0)             # healthy
    assert not bench._floors_skipped(None, None)           # CPU run
    assert not bench._floors_skipped(500.0, None)


def test_measure_ppo_train_inherits_chain_shortening_defaults():
    """Regression pin for the round-5 bench bug: measure-side False defaults
    silently overrode PPOConfig's chain-shortening defaults, so the bench
    artifact measured a non-default configuration while labeling it default.
    The knobs must default to None (= inherit) and the PPOConfig defaults
    must be the round-5 decision (pregen+fold ON, vector_gae OFF)."""
    import inspect

    from gym_fishing_tpu.bench.throughput import measure_ppo_train
    from gym_fishing_tpu.agents.ppo import PPOConfig

    sig = inspect.signature(measure_ppo_train)
    for p in ("pregen_noise", "fold_obs", "vector_gae"):
        assert sig.parameters[p].default is None, p
    cfg = PPOConfig()
    assert cfg.rollout_pregen_noise and cfg.rollout_fold_obs
    assert not cfg.rollout_vector_gae


def test_measure_rng_impl_rbg_tiny():
    res = measure(num_envs=64, num_steps=8, iters=2, warmup=1, mode="xla",
                  rng_impl="rbg")
    assert res["steps_per_s"] > 0
    assert res["rng_impl"] == "rbg"
