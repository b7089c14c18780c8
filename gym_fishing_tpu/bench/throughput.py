"""Throughput + scaling benchmarks (SURVEY.md §6 / BASELINE.md north star).

Headline metric: batched fishing-v1 env-steps/s on one chip — a jitted
lax.scan rollout (policy + step + auto-reset fused on device). Timing
methodology (corrected round 3, see _sync): every timed loop chains each
iteration on the previous one's outputs AND fetches a host value at the end
of the window — `block_until_ready` alone is NOT sufficient through a
remote-TPU tunnel. The reference publishes no numbers (BASELINE.json
"published": {}); the target is the driver's 50M env-steps/s/chip.
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp

import gym_fishing_tpu as gft
from gym_fishing_tpu.agents.policies import escapement
from gym_fishing_tpu.batch import batched_reset, batched_step
from gym_fishing_tpu.batch import rollout as traj_rollout
from gym_fishing_tpu.shard import shard_batch

BASELINE_STEPS_PER_S = 50_000_000.0  # BASELINE.json target (>= 50M steps/s/chip)


def _sync(out) -> float:
    """Force REAL completion of `out`: fetch one scalar value to the host.

    Through a remote-TPU tunnel (axon), `jax.block_until_ready` can return
    before the computation actually executes (lazy dispatch), which inflated
    round-1/2 stepping headlines ~15x (BENCH_NOTES "Round 3b"). A host value
    fetch of a leaf cannot be elided: it bounds the whole dependency chain.
    Timed loops must (a) chain each iteration on the previous one's outputs
    and (b) call _sync on the final output inside the timed window.
    """
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def device_health_matmul_ms(iters: int = 5) -> float:
    """Chained 4096^3 f32 matmul ms/iter — the device/tunnel health control.

    Healthy v5e: ~2 ms. The axon tunnel can degrade by orders of magnitude
    (round 4 recorded 876 ms/iter after a client was killed mid-RPC), which
    tanks every benchmark number without any code change. bench.py embeds
    this in its JSON line so a degraded artifact is self-identifying.
    """
    import numpy as np

    x = jnp.ones((4096, 4096), jnp.float32)
    # 1/4096 renormalization keeps chained values at exactly 1.0 (ones @ ones
    # = 4096 everywhere): the previous *0.001+1.0 scaling grew
    # superexponentially and hit f32 inf by ~the 6th chained call, so the
    # control was timing inf arithmetic (ADVICE r4). Matmul cost is
    # value-independent on TPU, but bounded values keep the control honest.
    f = jax.jit(lambda a: (a @ a) * (1.0 / 4096.0))
    s = f(x)
    float(np.asarray(s).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(s)
    float(np.asarray(s).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def measure(
    env_id: str = "fishing-v1",
    num_envs: int = 1 << 20,
    num_steps: int = 64,
    iters: int = 10,
    warmup: int = 3,
    sigma: float = 0.05,
    mesh=None,
    store_trajectory: bool = False,
    mode: str = "xla",
    rng_impl: str = "threefry2x32",
) -> dict:
    """Time the fused rollout; returns steps/s and vs-baseline ratio.

    ``store_trajectory=False`` (default): reward is sum-reduced on device —
    pure stepping throughput. ``True``: full [T, B] trajectory buffers are
    materialized (the learner-feeding variant).

    ``mode="pallas"``: the hand-written VMEM-resident rollout kernel
    (kernels/rollout_kernel.py) — same dynamics + auto-reset + escapement
    policy, state stays on-chip for all num_steps.

    ``rng_impl``: key implementation for the XLA engine ("threefry2x32" |
    "rbg"). The engine is key-impl-agnostic (all draws flow from the
    caller's key), and "rbg" lowers the per-step noise draw to the XLA
    RngBitGenerator hardware path — measured 2.15x on the engine (3.26 ->
    7.0 B steps/s at the bench default, BENCH_NOTES "Round 4"); key
    SPLITTING still uses threefry-quality derivation under impl "rbg".
    """
    if mode == "pallas":
        return _measure_pallas(env_id, num_envs, num_steps, iters, warmup, sigma)
    env, params = gft.make(env_id, sigma=sigma)
    pol = escapement(env, params)

    if store_trajectory:

        def run(state, key):
            return traj_rollout(
                env, params, lambda o, _k: pol.act(o), state, key, num_steps
            )

    else:

        def run(state, key):
            obs0 = jax.vmap(env.get_obs, in_axes=(None, 0))(params, state.env)

            def body(carry, k):
                st, obs = carry
                st, ts = batched_step(env, params, st, pol.act(obs), k, autoreset=True)
                return (st, ts.obs), ts.reward.sum()

            keys = jax.random.split(key, num_steps)
            (state2, _), rew = jax.lax.scan(body, (state, obs0), keys)
            return state2, rew.sum()

    run = jax.jit(run, donate_argnums=(0,))

    state = batched_reset(env, params, num_envs)
    if mesh is not None:
        state = shard_batch(state, mesh)

    key = jax.random.key(0, impl=rng_impl)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        out = run(state, sub)
        state = out[0]
    _sync(out[1])

    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        out = run(state, sub)
        state = out[0]
    _sync(out[1])
    dt = time.perf_counter() - t0

    total = num_envs * num_steps * iters
    steps_per_s = total / dt
    return {
        "env_id": env_id,
        "mode": "xla",
        "rng_impl": rng_impl,
        "num_envs": num_envs,
        "num_steps": num_steps,
        "iters": iters,
        "seconds": dt,
        "steps_per_s": steps_per_s,
        "vs_baseline": steps_per_s / BASELINE_STEPS_PER_S,
    }


def _measure_pallas(env_id, num_envs, num_steps, iters, warmup, sigma) -> dict:
    from gym_fishing_tpu.agents.policies import escapement as esc_pol
    from gym_fishing_tpu.kernels import make_scalars, pallas_rollout

    env, params = gft.make(env_id, sigma=sigma)
    pol = esc_pol(env, params)
    scalars = make_scalars(params, float(pol.x_star), seed=1)
    growth = env.config.growth
    noise_form = env.config.noise_form

    stock = jnp.full((num_envs,), float(params.init_state), jnp.float32)
    t = jnp.zeros((num_envs,), jnp.int32)

    def run(stock, t, ep):
        out = pallas_rollout(
            stock, t, scalars, num_steps, growth=growth, noise_form=noise_form,
            ep_ret=ep,
        )
        return out.stock, out.t, out.ep_ret

    ep = jnp.zeros((num_envs,), jnp.float32)
    for _ in range(warmup):
        stock, t, ep = run(stock, t, ep)
    _sync(ep)

    t0 = time.perf_counter()
    for _ in range(iters):
        stock, t, ep = run(stock, t, ep)
    _sync(ep)
    dt = time.perf_counter() - t0

    total = num_envs * num_steps * iters
    steps_per_s = total / dt
    return {
        "env_id": env_id,
        "mode": "pallas",
        "num_envs": num_envs,
        "num_steps": num_steps,
        "iters": iters,
        "seconds": dt,
        "steps_per_s": steps_per_s,
        "vs_baseline": steps_per_s / BASELINE_STEPS_PER_S,
    }


def measure_ppo_train(
    num_envs: int = 16384,
    num_steps: int = 128,
    iters: int = 10,
    warmup: int = 3,
    sigma: float = 0.05,
    fused: str = "full",   # "full" | "update" | "off"
    fused_adam: bool = False,
    compute_dtype: str = "float32",
    pregen_noise: bool = None,
    fold_obs: bool = None,
    vector_gae: bool = None,
) -> dict:
    """Time the full PPO train step (rollout + GAE + 4x8 minibatch SGD).

    This is the number that actually met the 50M north star (BENCH_NOTES
    update-phase table); benched here so bench.py can gate it against a
    regression floor (VERDICT r2 #3). fused="full" additionally exercises a
    REAL (non-interpreted) pallas_policy_rollout on TPU — the execution-side
    tripwire companion to tests/test_tpu_lowering.py.

    The chain-shortening knobs (pregen_noise / fold_obs / vector_gae)
    default to None = INHERIT the PPOConfig defaults (pregen+fold ON since
    round 5) — a False measure-side default would silently ablate the
    production configuration (the round-5 bench dry-run did exactly that;
    the returned "rollout_flags" field makes the effective config explicit).
    Pass True/False explicitly for A/B ablation runs.
    """
    from functools import partial

    from gym_fishing_tpu.agents import ppo

    env, params = gft.make("fishing-v1", sigma=sigma)
    overrides = {
        k: v for k, v in (
            ("rollout_pregen_noise", pregen_noise),
            ("rollout_fold_obs", fold_obs),
            ("rollout_vector_gae", vector_gae),
        ) if v is not None
    }
    cfg = ppo.PPOConfig(
        num_envs=num_envs,
        num_steps=num_steps,
        fused_update=fused in ("full", "update"),
        fused_rollout=fused == "full",
        fused_adam=fused_adam,
        compute_dtype=compute_dtype,
        **overrides,
    )
    key = jax.random.key(0)
    ts = ppo.make_train_state(env, cfg, key)
    bstate = batched_reset(env, params, num_envs)
    step = jax.jit(partial(ppo.train_step, env, params, cfg))

    for i in range(warmup):
        ts, bstate, metrics = step(ts, bstate, jax.random.fold_in(key, i))
    _sync(metrics)

    # async dispatch, one value fetch at the end: a training loop doesn't
    # sync on metrics every iteration (a per-iter fetch bills the tunnel
    # round-trip to the device), but the final fetch is mandatory — the
    # iterations chain through ts/bstate, so fetching the last metrics
    # bounds the real execution of the whole window (see _sync).
    t0 = time.perf_counter()
    for i in range(iters):
        ts, bstate, metrics = step(ts, bstate, jax.random.fold_in(key, 100 + i))
    _sync(metrics)
    dt = time.perf_counter() - t0

    total = num_envs * num_steps * iters
    steps_per_s = total / dt
    return {
        # the chain-shortening suffixes/flags are only meaningful when the
        # fused rollout actually runs (they are kernel options)
        "mode": f"ppo-{fused}" + ("+adam" if fused_adam else "")
        + ("+pregen" if cfg.fused_rollout and cfg.rollout_pregen_noise
           else "")
        + ("+fold" if cfg.fused_rollout and cfg.rollout_fold_obs else "")
        + ("+vgae" if cfg.fused_rollout and cfg.rollout_vector_gae else ""),
        "rollout_flags": {
            "pregen_noise": cfg.fused_rollout and cfg.rollout_pregen_noise,
            "fold_obs": cfg.fused_rollout and cfg.rollout_fold_obs,
            "vector_gae": cfg.fused_rollout and cfg.rollout_vector_gae,
        },
        "compute_dtype": cfg.compute_dtype,
        "num_envs": num_envs,
        "num_steps": num_steps,
        "epochs": cfg.epochs,
        "num_minibatches": cfg.num_minibatches,
        "iters": iters,
        "seconds": dt,
        "steps_per_s": steps_per_s,
        "vs_baseline": steps_per_s / BASELINE_STEPS_PER_S,
    }
