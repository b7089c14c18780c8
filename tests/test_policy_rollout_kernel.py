"""Fused policy-rollout kernel == the XLA rollout path at z=0.

On CPU the Mosaic interpreter's PRNG yields zero bits, so the kernel's
uniform draws are exactly 1.0 and its Box-Muller draws exactly 0 — the
rollout becomes deterministic: Gaussian action = mean; categorical action =
#{cdf_k < 1.0} = n_actions - 1 (the last class). A pure JAX reference loop
with the same deterministic choices and process noise xi = 0 must then
reproduce every packed row (obs, action, logp, value, advantage, return),
the final env state and the in-kernel episode stats. This pins the whole
wiring: obs scaling, the MLP forward, all three decode schemes (incl. the
relative scheme's carried-harvest state), growth/noise/reward/collapse
dynamics, auto-reset, and the in-kernel GAE reverse pass
(agents/ppo.compute_gae semantics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_fishing_tpu import registry
from gym_fishing_tpu.agents import ppo, ppo_fused
from gym_fishing_tpu.batch import batched_reset
from gym_fishing_tpu.batch.batch import batched_step_xi
from gym_fishing_tpu.core.types import EnvState

LOG_2PI = 1.8378770664093453


def _reference_rollout_z0(env, params, ts, bstate, T, gamma, lam):
    """Pure-JAX rollout with the interpreter's deterministic draws:
    Gaussian action = mean (z = 0); categorical action = last class (u = 1);
    process noise xi = 0."""
    B = bstate.episode_return.shape[0]
    f32 = jnp.float32
    continuous = env.config.scheme == "continuous"
    state = bstate.env
    cur_ret = bstate.episode_return.astype(f32)
    cur_len = bstate.episode_length
    if continuous:
        log_std = ts.params["params"]["log_std"][0]
    reset_state = env.reset(params)

    rows = {k: [] for k in ("obs", "act", "logp", "value", "rew", "done")}
    nd = sr = sl = srw = 0.0
    zeros = jnp.zeros((B,), params.dtype)
    for _ in range(T):
        obs = jax.vmap(env.get_obs, in_axes=(None, 0))(params, state)
        obs = obs.astype(f32)
        dist, value = ts.apply_fn(ts.params, obs)
        if continuous:
            action = dist[0]                            # z = 0 -> mean
            logp = jnp.full((B,), -log_std - 0.5 * LOG_2PI, f32)
            act_row = action[:, 0]
            env_action = action.astype(params.dtype)
        else:
            A = env.config.n_actions
            env_action = jnp.full((B,), A - 1, jnp.int32)   # u = 1 -> last
            logp = jax.nn.log_softmax(dist[0])[:, A - 1]
            act_row = env_action.astype(f32)
        state2, ts_env = batched_step_xi(
            env, params, state, env_action, zeros, zeros
        )
        rew = ts_env.reward.astype(f32)
        done = ts_env.done
        ep_ret_now = cur_ret + rew
        ep_len_now = cur_len + 1
        done_f = done.astype(f32)
        nd += float(done_f.sum())
        sr += float((ep_ret_now * done_f).sum())
        sl += float((ep_len_now.astype(f32) * done_f).sum())
        srw += float(rew.sum())
        rows["obs"].append(obs[:, 0])
        rows["act"].append(act_row)
        rows["logp"].append(logp)
        rows["value"].append(value)
        rows["rew"].append(rew)
        rows["done"].append(done_f)
        # auto-reset
        state = jax.tree.map(
            lambda new, init: jnp.where(
                done.reshape(done.shape + (1,) * (new.ndim - 1)), init, new
            ),
            state2,
            jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
                         reset_state),
        )
        cur_ret = jnp.where(done, 0.0, ep_ret_now)
        cur_len = jnp.where(done, 0, ep_len_now)

    rows = {k: jnp.stack(v) for k, v in rows.items()}     # [T, B]
    obs_T = jax.vmap(env.get_obs, in_axes=(None, 0))(params, state)
    _, value_T = ts.apply_fn(ts.params, obs_T.astype(f32))
    # GAE (agents/ppo.compute_gae semantics)
    adv = jnp.zeros_like(rows["value"])
    gae = jnp.zeros((B,), f32)
    next_value = value_T
    for t in range(T - 1, -1, -1):
        nonterm = 1.0 - rows["done"][t]
        delta = rows["rew"][t] + gamma * next_value * nonterm - rows["value"][t]
        gae = delta + gamma * lam * nonterm * gae
        adv = adv.at[t].set(gae)
        next_value = rows["value"][t]
    ret = adv + rows["value"]
    packed_t = jnp.stack(
        [rows[k].reshape(-1) for k in ("obs", "act", "logp", "value")]
        + [adv.reshape(-1), ret.reshape(-1)]
    )
    stats = np.array([nd, sr, sl, srw], np.float32)
    return packed_t, state, cur_ret, cur_len, stats


@pytest.mark.parametrize(
    "env_id,overrides",
    [
        ("fishing-v1", dict(sigma=0.05, Tmax=5)),
        ("fishing-ricker-v1", dict(sigma=0.1, Tmax=6, cost=0.1, r_drift=0.01)),
        ("fishing-may-v1", dict(sigma=0.0, Tmax=7, collapse_penalty=1.0)),
        # discrete: relative scheme (carried-harvest decode, n_actions=3)
        ("fishing-v0", dict(sigma=0.05, Tmax=5)),
        # discrete: proportional grid decode (n_actions>3 switches scheme)
        ("fishing-v0", dict(n_actions=8, sigma=0.1, Tmax=6, cost=0.05)),
        # obs-noise variant: exercises the obs_noise=True kernel path's
        # wiring (eta = 0 under the interpreter, so the z=0 reference with
        # noise-free get_obs still matches exactly)
        ("fishing-may-obs-v1", dict(Tmax=6)),
        # model-uncertainty mixture: scalar model_idx selects the growth
        # (3 = allen) via the kernel's slot-21 where-select chain
        ("fishing-mixture-v1", dict(model_idx=3, sigma=0.05, Tmax=5)),
    ],
)
def test_policy_rollout_kernel_matches_reference_z0(env_id, overrides):
    _run_z0_parity(env_id, overrides)


def _run_z0_parity(env_id, overrides, num_steps=8, **cfg_extra):
    env, params = registry.make(env_id, dtype=jnp.float32, **overrides)
    cfg = ppo.PPOConfig(
        num_envs=256, num_steps=num_steps, hidden=32, **cfg_extra
    )
    key = jax.random.key(0)
    ts = ppo.make_train_state(env, cfg, key)
    # jitter params so towers differ; keep log_std real
    ts = ts.replace(
        params=jax.tree.map(
            lambda x: x + 0.03 * jnp.cos(jnp.arange(x.size, dtype=jnp.float32)
                                         ).reshape(x.shape),
            ts.params,
        )
    )
    bstate = batched_reset(env, params, cfg.num_envs)
    # desynchronize instances so auto-reset hits different steps per env
    bstate = bstate.replace(
        env=EnvState(
            stock=bstate.env.stock
            * (0.5 + jnp.linspace(0, 1, cfg.num_envs, dtype=jnp.float32)),
            # vary carried harvest too (exercises the relative scheme's
            # harvest-state input into the kernel)
            harvest=bstate.env.harvest
            * (0.5 + jnp.linspace(0, 1.5, cfg.num_envs, dtype=jnp.float32)),
            t=(jnp.arange(cfg.num_envs) % int(params.Tmax)).astype(jnp.int32),
        ),
        episode_length=(jnp.arange(cfg.num_envs) % int(params.Tmax)).astype(
            jnp.int32
        ),
    )

    T = cfg.num_steps
    ref_packed, ref_state, ref_ret, ref_len, ref_stats = (
        _reference_rollout_z0(env, params, ts, bstate, T, cfg.gamma,
                              cfg.gae_lambda)
    )

    roll, new_bstate = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, key, interpret=True
    )

    names = ("obs", "action", "logp", "value", "advantage", "return")
    for r, name in enumerate(names):
        np.testing.assert_allclose(
            np.asarray(roll.packed_t[r]), np.asarray(ref_packed[r]),
            rtol=2e-5, atol=1e-5, err_msg=f"packed row {name} ({env_id})",
        )
    np.testing.assert_allclose(
        np.asarray(new_bstate.env.stock), np.asarray(ref_state.stock),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(new_bstate.env.t), np.asarray(ref_state.t)
    )
    np.testing.assert_allclose(
        np.asarray(new_bstate.episode_return), np.asarray(ref_ret),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(new_bstate.episode_length), np.asarray(ref_len)
    )
    np.testing.assert_allclose(
        np.asarray(roll.stats), ref_stats, rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize(
    "pregen,fold", [(True, False), (False, True), (True, True)]
)
@pytest.mark.parametrize(
    "env_id,overrides",
    [
        ("fishing-v1", dict(sigma=0.05, Tmax=5)),          # gaussian head
        ("fishing-v0", dict(sigma=0.05, Tmax=5)),          # relative decode
        ("fishing-may-obs-v1", dict(Tmax=6)),              # obs-noise path
    ],
)
def test_policy_rollout_chain_shortening_matches_z0(env_id, overrides,
                                                    pregen, fold):
    """The chain-shortening options (VERDICT r4 #3: pre-generated noise
    planes, obs-affine fold into W1/b1) preserve kernel semantics: under the
    interpreter's zero-bit PRNG the pre-generated draws are the same
    deterministic values (z = 0, u = 1, nf = 1), and the fold is exact up to
    ~1-ulp f32 rounding — so the same z=0 reference must match."""
    _run_z0_parity(
        env_id, overrides,
        rollout_pregen_noise=pregen, rollout_fold_obs=fold,
    )


@pytest.mark.parametrize(
    "env_id,overrides",
    [
        ("fishing-v1", dict(sigma=0.05, Tmax=5)),          # gaussian head
        ("fishing-v0", dict(sigma=0.05, Tmax=5)),          # frequent resets
        ("fishing-ricker-v1", dict(sigma=0.1, Tmax=6, cost=0.1)),
    ],
)
def test_policy_rollout_vector_gae_matches_z0(env_id, overrides):
    """The log-depth doubling GAE (rollout_vector_gae) computes the same
    advantages/returns as the sequential reverse pass — the recurrence is an
    associative composition of affine maps, so only f32 reassociation
    (~1 ulp) separates them from the z=0 reference. num_steps=8 is not a
    power-of-2 edge but the doubling loop handles any T; resets inside the
    window exercise the nonterm masking."""
    _run_z0_parity(env_id, overrides, rollout_vector_gae=True)


def test_policy_rollout_vector_gae_odd_T():
    """Doubling-scan GAE at a non-power-of-2 horizon (T=12): the k=1,2,4,8
    rounds must handle the ragged final shift (identity padding) exactly."""
    _run_z0_parity(
        "fishing-v1", dict(sigma=0.05, Tmax=5), num_steps=12,
        rollout_vector_gae=True,
    )


def test_fused_rollout_train_step_smoke():
    """Full fused pipeline (rollout + update kernels) trains and stays
    finite on CPU (interpret mode)."""
    env, params = registry.make("fishing-v1", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(
        num_envs=128, num_steps=16, epochs=2, num_minibatches=2, hidden=32,
        fused_update=True, fused_rollout=True,
    )
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    bstate = batched_reset(env, params, cfg.num_envs)
    step = jax.jit(
        lambda ts, bs, k: ppo.train_step(env, params, cfg, ts, bs, k)
    )
    for i in range(2):
        ts, bstate, metrics = step(ts, bstate, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    assert all(
        np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(ts.params)
    )


def test_fused_rollout_train_step_smoke_discrete():
    """Full fused pipeline on a discrete env (categorical head end to end)."""
    env, params = registry.make("fishing-v0", dtype=jnp.float32, sigma=0.05)
    cfg = ppo.PPOConfig(
        num_envs=128, num_steps=16, epochs=2, num_minibatches=2, hidden=32,
        ent_coef=0.01, fused_update=True, fused_rollout=True,
    )
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    bstate = batched_reset(env, params, cfg.num_envs)
    step = jax.jit(
        lambda ts, bs, k: ppo.train_step(env, params, cfg, ts, bs, k)
    )
    for i in range(2):
        ts, bstate, metrics = step(ts, bstate, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(ts.params)
    )


def test_fused_rollout_requires_fused_update():
    env, params = registry.make("fishing-v1", dtype=jnp.float32)
    cfg = ppo.PPOConfig(
        num_envs=128, num_steps=16, fused_rollout=True, fused_update=False
    )
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    bstate = batched_reset(env, params, cfg.num_envs)
    with pytest.raises(NotImplementedError):
        ppo.train_step(env, params, cfg, ts, bstate, jax.random.key(0))


def test_fused_rollout_train_step_smoke_mixture():
    """Full fused pipeline on the model-uncertainty mixture env (the last
    variant the fused path used to guard out — VERDICT r2 weak #4)."""
    env, params = registry.make(
        "fishing-mixture-v1", dtype=jnp.float32, model_idx=1, sigma=0.05
    )
    cfg = ppo.PPOConfig(
        num_envs=128, num_steps=16, epochs=2, num_minibatches=2, hidden=32,
        fused_update=True, fused_rollout=True,
    )
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    bstate = batched_reset(env, params, cfg.num_envs)
    step = jax.jit(
        lambda ts, bs, k: ppo.train_step(env, params, cfg, ts, bs, k)
    )
    for i in range(2):
        ts, bstate, metrics = step(ts, bstate, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(ts.params)
    )


def test_fused_rollout_rejects_traced_sigma_m():
    """Passing env params as a traced jit argument cannot decide the static
    obs-noise kernel path — must raise, not silently train noise-free."""
    env, params = registry.make("fishing-may-obs-v1", dtype=jnp.float32)
    cfg = ppo.PPOConfig(
        num_envs=128, num_steps=8, hidden=32,
        fused_update=True, fused_rollout=True,
    )
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    bstate = batched_reset(env, params, cfg.num_envs)
    step = jax.jit(lambda p, ts, bs, k: ppo.train_step(env, p, cfg, ts, bs, k))
    with pytest.raises(NotImplementedError, match="sigma_m"):
        step(params, ts, bstate, jax.random.key(0))


def test_rollout_scalars_traced_safe():
    """rollout_scalars must build under jit from traced params."""
    _, params = registry.make("fishing-v1", dtype=jnp.float32)

    @jax.jit
    def build(p):
        return ppo_fused.rollout_scalars(p, jnp.float32(3.0))

    s = build(params)
    assert s.shape[0] == 22
    np.testing.assert_allclose(float(s[1]), float(params.K))


def test_policy_rollout_kernel_bf16_close_to_f32():
    """compute="bfloat16" runs the two hidden matmuls with bf16 inputs
    (f32 MXU accumulation) — the rollout phase's roofline lever (BENCH_NOTES
    Round 4). Must track the f32 kernel closely at z=0 (values/means shift
    by bf16 input rounding only; dynamics/GAE math stays f32)."""
    env, params = registry.make("fishing-v1", dtype=jnp.float32, sigma=0.0,
                                Tmax=10)
    cfg = ppo.PPOConfig(num_envs=256, num_steps=8, hidden=32)
    cfg_bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    ts = ppo.make_train_state(env, cfg, jax.random.key(2))
    bstate = batched_reset(env, params, cfg.num_envs)
    roll_f32, _ = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, jax.random.key(3), interpret=True
    )
    roll_bf, _ = ppo_fused.fused_rollout_collect(
        env, params, cfg_bf, ts, bstate, jax.random.key(3), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(roll_bf.packed_t), np.asarray(roll_f32.packed_t),
        rtol=0.05, atol=0.02,
    )


@pytest.mark.parametrize("env_id", ["fishing-v1", "fishing-v0"])
def test_policy_rollout_kernel_blocks_per_program_matches(env_id):
    """blocks_per_program=2 interleaves two independent env columns per grid
    program (the ILP lever for the latency-bound rollout body — BENCH_NOTES
    Round 4). At z=0 the packed buffer and end state must match the
    single-column kernel exactly (env ordering is preserved: program i,
    column c covers envs [i*C*E + c*E, i*C*E + (c+1)*E))."""
    env, params = registry.make(env_id, dtype=jnp.float32, sigma=0.05,
                                Tmax=5)
    cfg = ppo.PPOConfig(num_envs=512, num_steps=8, hidden=32)
    ts = ppo.make_train_state(env, cfg, jax.random.key(4))
    bstate = batched_reset(env, params, cfg.num_envs)
    bstate = bstate.replace(
        env=EnvState(
            stock=bstate.env.stock
            * (0.5 + jnp.linspace(0, 1, cfg.num_envs, dtype=jnp.float32)),
            harvest=bstate.env.harvest,
            t=(jnp.arange(cfg.num_envs) % 5).astype(jnp.int32),
        )
    )
    head = "gaussian" if env.config.scheme == "continuous" else "categorical"
    weights = ppo_fused.kernel_weights(ts.params, head)
    scal = ppo_fused.rollout_scalars(params, jnp.float32(3))

    from gym_fishing_tpu.kernels.policy_rollout_kernel import (
        pallas_policy_rollout,
    )

    def run(bpp):
        return pallas_policy_rollout(
            bstate.env.stock.astype(jnp.float32), bstate.env.t,
            bstate.env.harvest.astype(jnp.float32),
            bstate.episode_return.astype(jnp.float32),
            bstate.episode_length,
            weights, scal, num_steps=cfg.num_steps, envs_per_block=128,
            growth=env.config.growth, noise_form=env.config.noise_form,
            scheme=env.config.scheme, n_actions=env.config.n_actions,
            interpret=True, blocks_per_program=bpp,
        )

    one = run(1)
    two = run(2)
    np.testing.assert_allclose(
        np.asarray(two.packed_t), np.asarray(one.packed_t),
        rtol=1e-6, atol=1e-7,
    )
    for a, b in zip(two, one):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_hlo_interpret_tier_matches_mosaic_interpreter():
    """interpret="hlo" (generic-interpreter tier, multi-process-safe) must
    reproduce the Mosaic interpreter bitwise on CPU: both yield zero PRNG
    bits, and all other math is the same f32 program. Guards the portable
    stand-ins in kernels/rollout_kernel._random_bits/_uniform_from_bits."""
    env, params = registry.make("fishing-v1", dtype=jnp.float32, sigma=0.05,
                                Tmax=6)
    cfg = ppo.PPOConfig(num_envs=256, num_steps=8, hidden=32)
    ts = ppo.make_train_state(env, cfg, jax.random.key(6))
    bstate = batched_reset(env, params, cfg.num_envs)
    roll_m, bm = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, jax.random.key(7), interpret=True
    )
    roll_h, bh = ppo_fused.fused_rollout_collect(
        env, params, cfg, ts, bstate, jax.random.key(7), interpret="hlo"
    )
    np.testing.assert_allclose(
        np.asarray(roll_h.packed_t), np.asarray(roll_m.packed_t),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(bh.env.stock), np.asarray(bm.env.stock),
        rtol=1e-7, atol=1e-8,
    )
    # the update kernel under "hlo" (no PRNG; plain program equivalence)
    from gym_fishing_tpu.kernels.ppo_update_kernel import fused_minibatch_grad

    weights = ppo_fused.kernel_weights(ts.params, "gaussian")
    n, tile = 2048, 256
    order = jnp.arange(n // tile, dtype=jnp.int32)
    scal = jnp.zeros((8,), jnp.float32).at[2].set(1.0 / n).at[4].set(1.0)
    gm, mm = fused_minibatch_grad(
        roll_m.packed_t[:, :n], order, weights, scal, obs_dim=1, act_dim=1,
        tile=tile, head="gaussian", interpret=True,
    )
    gh, mh = fused_minibatch_grad(
        roll_h.packed_t[:, :n], order, weights, scal, obs_dim=1, act_dim=1,
        tile=tile, head="gaussian", interpret="hlo",
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        gh, gm,
    )
