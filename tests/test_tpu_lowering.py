"""TPU-lowering tripwire for every Pallas kernel (VERDICT r2 next-step #8).

Round 2 shipped a kernel whose BlockSpecs the Mosaic TPU lowering rejects —
and a 231-test green suite never noticed, because every fused-path test
derives interpret=True off-TPU and the Mosaic interpreter has no tiling
rules. This module closes that hole WITHOUT needing a chip:
`jax.export.export(fn, platforms=["tpu"])` runs the real Pallas->Mosaic
lowering pipeline (including the (8, 128) block-tiling legality checks that
caught round 2's (1, E)-block bug) on any host and raises on violation.

It covers the full static configuration matrix actually reachable from the
public API: every (growth, noise_form, scheme, policy/head, obs_noise)
combination each kernel dispatches on, plus the update kernel's two heads.
A new kernel (or a new static branch of an existing one) must be added here.

This is a lowering gate, not an execution gate: Mosaic's final machine-code
compile still happens on-device (bench.py exercises one real
pallas_policy_rollout call on TPU for that). Reference: the reference has no
compiled code at all (SURVEY.md §2.2); this guards the rebuild's own perf
tier.
"""

import jax
import jax.numpy as jnp
import pytest

from gym_fishing_tpu import registry
from gym_fishing_tpu.agents import ppo, ppo_fused
from gym_fishing_tpu.kernels import make_scalars, pallas_rollout
from gym_fishing_tpu.kernels.policy_rollout_kernel import (
    pallas_policy_rollout,
)
from gym_fishing_tpu.kernels.ppo_update_kernel import fused_minibatch_grad


def _export_tpu(fn, *args, **kwargs):
    """Lower `fn(*args, **kwargs)` for the TPU platform (no execution).

    x64 is disabled for the trace: the suite's conftest enables it for the
    float64 oracle-exactness tests, but TPU programs run x64-off, and weak
    f64 Python scalars would otherwise inject casts Mosaic refuses.
    """
    with jax.enable_x64(False):
        return jax.export.export(jax.jit(fn), platforms=["tpu"])(
            *args, **kwargs
        )


B = 1024
T = 8


def _weights(env_id="fishing-v1", hidden=32):
    env, _ = registry.make(env_id, dtype=jnp.float32)
    head = "gaussian" if env.config.scheme == "continuous" else "categorical"
    cfg = ppo.PPOConfig(num_envs=B, num_steps=T, hidden=hidden)
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    return env, ppo_fused.kernel_weights(ts.params, head)


@pytest.mark.parametrize(
    "growth,noise_form,policy",
    [
        ("logistic", "additive", "escapement"),
        ("ricker", "lognormal", "constant_mortality"),
        ("may", "additive", "escapement"),
        ("beverton_holt", "additive", "constant"),
        ("allen", "lognormal", "escapement"),
        ("myers", "additive", "constant_mortality"),
        ("mixture", "additive", "escapement"),
    ],
)
def test_closed_form_rollout_kernel_lowers_for_tpu(growth, noise_form, policy):
    env, params = registry.make("fishing-v1", dtype=jnp.float32)
    scal = make_scalars(params, 0.5, seed=7)
    _export_tpu(
        lambda x, t, s: pallas_rollout(
            x, t, s, T, rows_per_block=8, growth=growth,
            noise_form=noise_form, policy=policy
        ),
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
    )


@pytest.mark.parametrize("scheme", ["proportional", "relative"])
def test_closed_form_rollout_kernel_discrete_schemes_lower_for_tpu(scheme):
    _, params = registry.make("fishing-v0", dtype=jnp.float32)
    scal = make_scalars(params, 0.5, seed=7)
    _export_tpu(
        lambda x, t, s: pallas_rollout(
            x, t, s, T, rows_per_block=8, policy="escapement", scheme=scheme
        ),
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
    )


@pytest.mark.parametrize("obs_noise", [False, True])
def test_closed_form_rollout_kernel_obs_noise_lowers_for_tpu(obs_noise):
    _, params = registry.make("fishing-may-obs-v1", dtype=jnp.float32)
    scal = make_scalars(params, 0.5, seed=7)
    _export_tpu(
        lambda x, t, s: pallas_rollout(
            x, t, s, T, rows_per_block=8, growth="may", policy="escapement",
            obs_noise=obs_noise
        ),
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
    )


@pytest.mark.parametrize(
    "env_id,scheme_kw,obs_noise",
    [
        ("fishing-v1", {}, False),                      # Gaussian head
        ("fishing-may-obs-v1", {}, True),               # Gaussian + obs noise
        ("fishing-v0", {}, False),                      # categorical/relative
        ("fishing-v0", dict(n_actions=8), False),       # categorical/proport.
        ("fishing-mixture-v1", dict(model_idx=2), False),  # mixture select
    ],
)
def test_policy_rollout_kernel_lowers_for_tpu(env_id, scheme_kw, obs_noise):
    env, params = registry.make(env_id, dtype=jnp.float32, **scheme_kw)
    _, weights = _weights(env_id)
    scal = ppo_fused.rollout_scalars(params, jnp.float32(7))

    def run(x, t, hv, er, el, scal, *w):
        return pallas_policy_rollout(
            x, t, hv, er, el, tuple(w), scal,
            num_steps=T, envs_per_block=256,
            growth=env.config.growth, noise_form=env.config.noise_form,
            scheme=env.config.scheme, n_actions=env.config.n_actions,
            obs_noise=obs_noise,
        )

    _export_tpu(
        run,
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 0.0125, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
        *_weights(env_id)[1],
    )


@pytest.mark.parametrize("head,env_id", [
    ("gaussian", "fishing-v1"), ("categorical", "fishing-v0"),
])
def test_update_kernel_lowers_for_tpu(head, env_id):
    _, weights = _weights(env_id)
    n = 4096
    tile = 512
    data = jnp.zeros((8, n), jnp.float32)
    order = jnp.arange(n // tile, dtype=jnp.int32)
    scalars = jnp.zeros((8,), jnp.float32).at[2].set(1.0 / n).at[4].set(1.0)
    act_dim = 1 if head == "gaussian" else 3

    def run(data, order, scalars, *w):
        return fused_minibatch_grad(
            data, order, tuple(w), scalars, obs_dim=1, act_dim=act_dim,
            tile=tile, head=head,
        )

    _export_tpu(run, data, order, scalars, *weights)


@pytest.mark.parametrize("head,env_id", [
    ("gaussian", "fishing-v1"), ("categorical", "fishing-v0"),
])
def test_adam_update_kernel_lowers_for_tpu(head, env_id):
    from gym_fishing_tpu.kernels.ppo_update_kernel import (
        ADAM_NUM_SCALARS,
        fused_minibatch_grad_adam,
        merge_weights,
    )

    _, weights = _weights(env_id)
    merged = merge_weights(weights)
    zeros = tuple(jnp.zeros_like(w) for w in merged)
    n = 4096
    tile = 512
    data = jnp.zeros((8, n), jnp.float32)
    order = jnp.arange(n // tile, dtype=jnp.int32)
    scalars = (
        jnp.zeros((ADAM_NUM_SCALARS,), jnp.float32)
        .at[2].set(1.0 / n).at[4].set(1.0)
        .at[8].set(3e-4).at[9].set(0.1).at[10].set(0.001)
    )
    act_dim = 1 if head == "gaussian" else 3

    def run(data, order, scalars, w, m, v):
        return fused_minibatch_grad_adam(
            data, order, w, m, v, scalars, obs_dim=1, act_dim=act_dim,
            tile=tile, head=head,
        )

    _export_tpu(run, data, order, scalars, merged, zeros, zeros)


def test_policy_rollout_kernel_bf16_lowers_for_tpu():
    env, params = registry.make("fishing-v1", dtype=jnp.float32)
    _, weights = _weights("fishing-v1")
    scal = ppo_fused.rollout_scalars(params, jnp.float32(7))

    def run(x, t, hv, er, el, scal, *w):
        return pallas_policy_rollout(
            x, t, hv, er, el, tuple(w), scal,
            num_steps=T, envs_per_block=256,
            growth=env.config.growth, noise_form=env.config.noise_form,
            scheme=env.config.scheme, n_actions=env.config.n_actions,
            compute="bfloat16",
        )

    _export_tpu(
        run,
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 0.0125, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
        *weights,
    )


@pytest.mark.parametrize(
    "env_id,obs_noise,pregen,fold",
    [
        ("fishing-v1", False, True, False),       # pregen, gaussian
        ("fishing-v1", False, False, True),       # fold only
        ("fishing-v1", False, True, True),        # both
        ("fishing-may-obs-v1", True, True, True), # obs-noise nf plane
        ("fishing-v0", False, True, True),        # categorical uniform plane
    ],
)
def test_policy_rollout_kernel_chain_shortening_lowers_for_tpu(
    env_id, obs_noise, pregen, fold
):
    """The chain-shortening variants (VERDICT r4 #3) must lower for TPU:
    the [T, C*E] vectorized noise pre-pass and the folded input layer use
    Mosaic-only primitives (prng_random_bits on a 2D shape, bitcast), so
    CPU interpret coverage alone cannot prove they compile."""
    env, params = registry.make(env_id, dtype=jnp.float32)
    _, weights = _weights(env_id)
    scal = ppo_fused.rollout_scalars(params, jnp.float32(7))

    def run(x, t, hv, er, el, scal, *w):
        return pallas_policy_rollout(
            x, t, hv, er, el, tuple(w), scal,
            num_steps=T, envs_per_block=256,
            growth=env.config.growth, noise_form=env.config.noise_form,
            scheme=env.config.scheme, n_actions=env.config.n_actions,
            obs_noise=obs_noise, pregen_noise=pregen, fold_obs=fold,
        )

    _export_tpu(
        run,
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 0.0125, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
        *weights,
    )


def test_policy_rollout_kernel_vector_gae_lowers_for_tpu():
    """The log-depth GAE doubling scan (concats + whole-plane reads/writes
    on [T, C*E] VMEM refs) must lower for TPU."""
    env, params = registry.make("fishing-v1", dtype=jnp.float32)
    _, weights = _weights("fishing-v1")
    scal = ppo_fused.rollout_scalars(params, jnp.float32(7))

    def run(x, t, hv, er, el, scal, *w):
        return pallas_policy_rollout(
            x, t, hv, er, el, tuple(w), scal,
            num_steps=T, envs_per_block=256,
            growth=env.config.growth, noise_form=env.config.noise_form,
            scheme=env.config.scheme, n_actions=env.config.n_actions,
            pregen_noise=True, fold_obs=True, vector_gae=True,
        )

    _export_tpu(
        run,
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 0.0125, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
        *weights,
    )


def test_policy_rollout_kernel_blocks_per_program_lowers_for_tpu():
    env, params = registry.make("fishing-v1", dtype=jnp.float32)
    _, weights = _weights("fishing-v1")
    scal = ppo_fused.rollout_scalars(params, jnp.float32(7))

    def run(x, t, hv, er, el, scal, *w):
        return pallas_policy_rollout(
            x, t, hv, er, el, tuple(w), scal,
            num_steps=T, envs_per_block=128, blocks_per_program=2,
            growth=env.config.growth, noise_form=env.config.noise_form,
            scheme=env.config.scheme, n_actions=env.config.n_actions,
        )

    _export_tpu(
        run,
        jnp.full((B,), 0.75, jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 0.0125, jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        scal,
        *weights,
    )
