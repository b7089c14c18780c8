"""Fused PPO-update kernel == jax.grad of agents/ppo.ppo_loss.

The hand-derived backward in kernels/ppo_update_kernel.py must reproduce the
autodiff gradient of the exact clipped-surrogate loss the XLA path uses —
policy tower, value tower, log_std, every clip branch — or fused training
would silently optimize a different objective. Runs the kernel in Mosaic
interpret mode on CPU (no PRNG involved, so interpretation is exact modulo
f32 summation order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_fishing_tpu import registry
from gym_fishing_tpu.agents import ppo, ppo_fused


def _setup(ent_coef=0.0, seed=0, n=256):
    env, env_params = registry.make("fishing-v1")
    cfg = ppo.PPOConfig(hidden=64, ent_coef=ent_coef)
    keys = jax.random.split(jax.random.key(seed), 10)
    ts = ppo.make_train_state(env, cfg, keys[0])
    # jitter every parameter so no gradient path is trivially zero
    params = jax.tree.map(
        lambda x, k: x + 0.05 * jax.random.normal(k, x.shape, x.dtype),
        ts.params,
        jax.tree.map(
            lambda _, k: k,
            ts.params,
            jax.tree.unflatten(
                jax.tree.structure(ts.params),
                list(jax.random.split(keys[1],
                                      len(jax.tree.leaves(ts.params)))),
            ),
        ),
    )
    params["params"]["log_std"] = jnp.array([-0.4], jnp.float32)

    obs = 0.7 * jax.random.normal(keys[2], (n, 1), jnp.float32)
    dist, value = ts.apply_fn(params, obs)
    action = dist[0] + jnp.exp(params["params"]["log_std"]) * jax.random.normal(
        keys[3], (n, 1), jnp.float32
    )
    logp = ppo._normal_logp(action, dist[0], params["params"]["log_std"])
    # realistic ratios: old_logp near current logp, spread enough that some
    # samples land on every clip branch
    old_logp = logp + 0.3 * jax.random.normal(keys[4], (n,), jnp.float32)
    old_value = value + 0.3 * jax.random.normal(keys[5], (n,), jnp.float32)
    adv = jax.random.normal(keys[6], (n,), jnp.float32)
    ret = value + jax.random.normal(keys[7], (n,), jnp.float32)
    batch = (obs, action, old_logp, old_value, adv, ret)
    packed = jnp.concatenate(
        [obs, action, old_logp[:, None], old_value[:, None], adv[:, None],
         ret[:, None]],
        axis=1,
    ).astype(jnp.float32)
    return cfg, ts, params, batch, packed


def _setup_categorical(ent_coef=0.0, seed=0, n=256):
    """Discrete-env (fishing-v0, n_actions=3) analog of _setup: the packed
    action field is one f32 column holding the sampled class index."""
    env, env_params = registry.make("fishing-v0")
    cfg = ppo.PPOConfig(hidden=64, ent_coef=ent_coef)
    keys = jax.random.split(jax.random.key(seed), 10)
    ts = ppo.make_train_state(env, cfg, keys[0])
    params = jax.tree.map(
        lambda x, k: x + 0.05 * jax.random.normal(k, x.shape, x.dtype),
        ts.params,
        jax.tree.unflatten(
            jax.tree.structure(ts.params),
            list(jax.random.split(keys[1], len(jax.tree.leaves(ts.params)))),
        ),
    )
    obs = 0.7 * jax.random.normal(keys[2], (n, 1), jnp.float32)
    (logits,), value = ts.apply_fn(params, obs)
    action = jax.random.categorical(keys[3], logits)
    logp = jax.nn.log_softmax(logits)[jnp.arange(n), action]
    old_logp = logp + 0.3 * jax.random.normal(keys[4], (n,), jnp.float32)
    old_value = value + 0.3 * jax.random.normal(keys[5], (n,), jnp.float32)
    adv = jax.random.normal(keys[6], (n,), jnp.float32)
    ret = value + jax.random.normal(keys[7], (n,), jnp.float32)
    batch = (obs, action.astype(jnp.int32), old_logp, old_value, adv, ret)
    packed = jnp.concatenate(
        [obs, action[:, None].astype(jnp.float32), old_logp[:, None],
         old_value[:, None], adv[:, None], ret[:, None]],
        axis=1,
    ).astype(jnp.float32)
    return cfg, ts, params, batch, packed, env.config.n_actions


@pytest.mark.parametrize("ent_coef", [0.0, 0.01])
def test_fused_grad_matches_jax_grad_categorical(ent_coef):
    """Categorical head: kernel gradient == jax.grad of the discrete
    ppo_loss, including the data-dependent entropy term's gradient."""
    cfg, ts, params, batch, packed, n_actions = _setup_categorical(
        ent_coef=ent_coef
    )

    (loss, metrics), ref_grads = jax.value_and_grad(
        lambda p: ppo.ppo_loss(ts.apply_fn, p, cfg, batch, False),
        has_aux=True,
    )(params)

    mb_t = ppo_fused.pack_feature_major(packed)
    grads, met = ppo_fused.fused_grad(
        params, mb_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
        obs_dim=1, act_dim=n_actions, tile=128, head="categorical",
        interpret=True,
    )

    flat_ref = jax.tree.leaves_with_path(ref_grads)
    flat_got = {jax.tree_util.keystr(k): v
                for k, v in jax.tree.leaves_with_path(grads)}
    assert len(flat_ref) == len(flat_got)
    for k, ref in flat_ref:
        got = flat_got[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(k)}",
        )

    for name in ("loss", "pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(met[name]), float(metrics[name]), rtol=2e-4, atol=2e-6,
            err_msg=f"metric mismatch at {name}",
        )


def test_fused_train_step_matches_xla_path_discrete():
    """Full train_step parity on a discrete env at epochs=1, minibatches=1."""
    import dataclasses

    from gym_fishing_tpu.batch import batched_reset

    env, env_params = registry.make("fishing-v0")
    base = ppo.PPOConfig(
        num_envs=32, num_steps=16, epochs=1, num_minibatches=1, hidden=32,
        ent_coef=0.01,
    )
    key = jax.random.key(7)
    ts0 = ppo.make_train_state(env, base, key)
    bstate = batched_reset(env, env_params, base.num_envs)

    outs = {}
    for fused in (False, True):
        cfg = dataclasses.replace(base, fused_update=fused)
        ts, _, metrics = jax.jit(
            lambda ts, bs, k, cfg=cfg: ppo.train_step(
                env, env_params, cfg, ts, bs, k
            )
        )(ts0, bstate, key)
        outs[fused] = (ts.params, metrics)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        outs[False][0], outs[True][0],
    )
    for name in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(outs[True][1][name]), float(outs[False][1][name]),
            rtol=1e-3, atol=1e-6,
        )


@pytest.mark.parametrize("ent_coef", [0.0, 0.01])
def test_fused_grad_matches_jax_grad(ent_coef):
    cfg, ts, params, batch, packed = _setup(ent_coef=ent_coef)

    (loss, metrics), ref_grads = jax.value_and_grad(
        lambda p: ppo.ppo_loss(ts.apply_fn, p, cfg, batch, True),
        has_aux=True,
    )(params)

    mb_t = ppo_fused.pack_feature_major(packed)
    grads, met = ppo_fused.fused_grad(
        params, mb_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
        obs_dim=1, act_dim=1, tile=128, interpret=True,
    )

    flat_ref = jax.tree.leaves_with_path(ref_grads)
    flat_got = {jax.tree_util.keystr(k): v
                for k, v in jax.tree.leaves_with_path(grads)}
    assert len(flat_ref) == len(flat_got)
    for k, ref in flat_ref:
        got = flat_got[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(k)}",
        )

    for name in ("loss", "pg_loss", "v_loss", "entropy", "approx_kl"):
        np.testing.assert_allclose(
            float(met[name]), float(metrics[name]), rtol=2e-4, atol=2e-6,
            err_msg=f"metric mismatch at {name}",
        )


def test_fused_grad_tile_order_subset():
    """tile_order names a strict subset: gradient == jax.grad over exactly
    those tiles' samples (zero-copy minibatch indexing)."""
    cfg, ts, params, batch, packed = _setup(seed=5, n=512)
    tile = 128
    order = jnp.array([3, 0], jnp.int32)          # tiles 3 and 0 of 4
    rows = jnp.concatenate(
        [packed[3 * tile:4 * tile], packed[0 * tile:1 * tile]], axis=0
    )
    sub_batch = (
        rows[:, :1], rows[:, 1:2], rows[:, 2], rows[:, 3], rows[:, 4],
        rows[:, 5],
    )
    (_, ref_metrics), ref_grads = jax.value_and_grad(
        lambda p: ppo.ppo_loss(ts.apply_fn, p, cfg, sub_batch, True),
        has_aux=True,
    )(params)

    adv = rows[:, 4]
    stats = (adv.mean(), 1.0 / (adv.std() + 1e-8))
    grads, met = ppo_fused.fused_grad(
        params, ppo_fused.pack_feature_major(packed), cfg.clip_eps,
        cfg.vf_coef, cfg.ent_coef, obs_dim=1, act_dim=1, tile=tile,
        tile_order=order, adv_stats=stats, interpret=True,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        grads, ref_grads,
    )
    np.testing.assert_allclose(
        float(met["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )


def test_fused_train_step_matches_xla_path():
    """At epochs=1, minibatches=1 the fused path and the XLA path run the
    same gradient over the same samples (visit order aside) — resulting
    params must agree to f32 accumulation tolerance."""
    import dataclasses

    from gym_fishing_tpu.batch import batched_reset

    env, env_params = registry.make("fishing-v1")
    base = ppo.PPOConfig(
        num_envs=32, num_steps=16, epochs=1, num_minibatches=1, hidden=32
    )
    key = jax.random.key(7)
    ts0 = ppo.make_train_state(env, base, key)
    bstate = batched_reset(env, env_params, base.num_envs)

    outs = {}
    for fused in (False, True):
        cfg = dataclasses.replace(base, fused_update=fused)
        ts, _, metrics = jax.jit(
            lambda ts, bs, k, cfg=cfg: ppo.train_step(
                env, env_params, cfg, ts, bs, k
            )
        )(ts0, bstate, key)
        outs[fused] = (ts.params, metrics)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        ),
        outs[False][0], outs[True][0],
    )
    for name in ("pg_loss", "v_loss", "approx_kl"):
        np.testing.assert_allclose(
            float(outs[True][1][name]), float(outs[False][1][name]),
            rtol=1e-3, atol=1e-6,
        )


def test_fused_train_step_multi_epoch_smoke():
    """Fused multi-epoch/minibatch training runs and stays finite on CPU."""
    from gym_fishing_tpu.batch import batched_reset

    env, env_params = registry.make("fishing-v1")
    cfg = ppo.PPOConfig(
        num_envs=32, num_steps=16, epochs=2, num_minibatches=2, hidden=32,
        fused_update=True,
    )
    key = jax.random.key(11)
    ts = ppo.make_train_state(env, cfg, key)
    bstate = batched_reset(env, env_params, cfg.num_envs)
    step = jax.jit(
        lambda ts, bs, k: ppo.train_step(env, env_params, cfg, ts, bs, k)
    )
    for i in range(2):
        ts, bstate, metrics = step(ts, bstate, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(ts.params)
    )


def test_affine_shuffle_is_a_permutation():
    """shuffle='affine' must produce a true bijection of [0, N)."""
    import dataclasses

    from gym_fishing_tpu.batch import batched_reset

    env, env_params = registry.make("fishing-v1")
    cfg = ppo.PPOConfig(
        num_envs=16, num_steps=16, epochs=1, num_minibatches=2, hidden=32,
        shuffle="affine",
    )
    # run a step to exercise the code path end to end
    key = jax.random.key(3)
    ts = ppo.make_train_state(env, cfg, key)
    bstate = batched_reset(env, env_params, cfg.num_envs)
    ts, _, metrics = jax.jit(
        lambda ts, bs, k: ppo.train_step(env, env_params, cfg, ts, bs, k)
    )(ts, bstate, key)
    assert np.isfinite(float(metrics["loss"]))

    # check bijectivity directly on the construction it uses
    n = 1 << 12
    for seed in range(3):
        ka, kb = jax.random.split(jax.random.key(seed))
        a = jax.random.randint(ka, (), 0, n // 2).astype(jnp.uint32) * 2 + 1
        b = jax.random.randint(kb, (), 0, n).astype(jnp.uint32)
        i = jax.lax.iota(jnp.uint32, n)
        perm = np.asarray((a * i + b) & jnp.uint32(n - 1))
        assert len(np.unique(perm)) == n


def test_fused_grad_multi_tile_accumulation():
    """Grid accumulation across tiles == one-shot gradient over all samples."""
    cfg, ts, params, batch, packed = _setup(seed=3, n=512)
    mb_t = ppo_fused.pack_feature_major(packed)
    g1, m1 = ppo_fused.fused_grad(
        params, mb_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
        obs_dim=1, act_dim=1, tile=512, interpret=True,
    )
    g4, m4 = ppo_fused.fused_grad(
        params, mb_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
        obs_dim=1, act_dim=1, tile=128, interpret=True,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g1, g4,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5)


def test_fused_grad_bfloat16_close_to_f32():
    """Opt-in mixed precision (compute="bfloat16"): bf16 inputs on the three
    [2H]-contraction matmuls, f32 accumulation/elementwise. Gradients must
    track the exact f32 kernel to bf16-input accuracy (~1e-2 relative) —
    direction-preserving, validated for learning quality on hardware
    (BENCH_NOTES round 3)."""
    cfg, ts, params, batch, packed = _setup(seed=5, n=512)
    mb_t = ppo_fused.pack_feature_major(packed)
    g32, m32 = ppo_fused.fused_grad(
        params, mb_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
        obs_dim=1, act_dim=1, tile=128, interpret=True,
    )
    g16, m16 = ppo_fused.fused_grad(
        params, mb_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
        obs_dim=1, act_dim=1, tile=128, compute="bfloat16", interpret=True,
    )
    # cosine similarity of the full gradient vector: direction preserved
    a = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g32)])
    b = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g16)])
    cos = float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    assert cos > 0.999, cos
    # loss metric computed from the bf16 forward stays close
    np.testing.assert_allclose(
        float(m16["loss"]), float(m32["loss"]), rtol=2e-2, atol=2e-3
    )


def test_fused_adam_matches_optax_path():
    """fused_epoch_scan_adam (in-kernel clip+Adam, VERDICT r3 #3) ==
    fused_epoch_scan (optax clip_by_global_norm + adam) at the same tile
    permutation: resulting params, Adam moments, count and metrics agree
    to f32 accumulation tolerance over a multi-epoch run."""
    import dataclasses

    cfg, ts, params, _batch, packed = _setup(ent_coef=0.01, seed=3, n=512)
    cfg = dataclasses.replace(cfg, epochs=2, num_minibatches=2)
    ts = ts.replace(params=params)
    packed_t = ppo_fused.pack_feature_major(packed)
    k = jax.random.key(42)

    ts_opt, m_opt = ppo_fused.fused_epoch_scan(
        cfg, ts, packed_t, 1, 1, k, head="gaussian", interpret=True
    )
    ts_adam, m_adam = ppo_fused.fused_epoch_scan_adam(
        cfg, ts, packed_t, 1, 1, k, head="gaussian", interpret=True
    )

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        ts_adam.params, ts_opt.params,
    )
    adam_opt = ppo_fused._find_adam_state(ts_opt.opt_state)
    adam_new = ppo_fused._find_adam_state(ts_adam.opt_state)
    assert int(adam_new.count) == int(adam_opt.count) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        adam_new.mu, adam_opt.mu,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-7
        ),
        adam_new.nu, adam_opt.nu,
    )
    for name in ("pg_loss", "v_loss", "approx_kl", "loss"):
        np.testing.assert_allclose(
            np.asarray(m_adam[name]), np.asarray(m_opt[name]),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )


def test_fused_adam_matches_optax_path_categorical():
    """Categorical head: no log_std parameter — it must be excluded from the
    global norm and left untouched by the in-kernel update."""
    import dataclasses

    cfg, ts, params, _b, packed, n_actions = _setup_categorical(
        ent_coef=0.01, seed=5, n=512
    )
    cfg = dataclasses.replace(cfg, epochs=2, num_minibatches=2)
    ts = ts.replace(params=params)
    packed_t = ppo_fused.pack_feature_major(packed)
    k = jax.random.key(43)

    ts_opt, _ = ppo_fused.fused_epoch_scan(
        cfg, ts, packed_t, 1, n_actions, k, head="categorical",
        interpret=True,
    )
    ts_adam, _ = ppo_fused.fused_epoch_scan_adam(
        cfg, ts, packed_t, 1, n_actions, k, head="categorical",
        interpret=True,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        ts_adam.params, ts_opt.params,
    )


def test_fused_adam_matches_optax_path_anneal_lr():
    """anneal_lr: the in-kernel path evaluates optax.linear_schedule from
    the carried Adam count and advances the chain's ScaleByScheduleState,
    so mixed fused/optax usage continues the schedule seamlessly."""
    import dataclasses

    from gym_fishing_tpu.registry import make as _make

    env, _ = _make("fishing-v1")
    cfg0, ts0, params, _batch, packed = _setup(ent_coef=0.0, seed=9, n=512)
    cfg = dataclasses.replace(
        cfg0, epochs=2, num_minibatches=2, anneal_lr=True, total_iterations=2
    )
    # rebuild the train state with the SCHEDULED optimizer
    ts = ppo.make_train_state(env, cfg, jax.random.key(0))
    ts = ts.replace(params=params)
    packed_t = ppo_fused.pack_feature_major(packed)
    k = jax.random.key(44)

    ts_opt, _ = ppo_fused.fused_epoch_scan(
        cfg, ts, packed_t, 1, 1, k, head="gaussian", interpret=True
    )
    ts_adam, _ = ppo_fused.fused_epoch_scan_adam(
        cfg, ts, packed_t, 1, 1, k, head="gaussian", interpret=True
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        ),
        ts_adam.params, ts_opt.params,
    )
    # schedule count advanced identically
    import optax

    def sched_counts(s):
        return [
            int(x.count) for x in jax.tree_util.tree_leaves(
                s, is_leaf=lambda y: isinstance(y, optax.ScaleByScheduleState)
            )
            if isinstance(x, optax.ScaleByScheduleState)
        ]

    assert sched_counts(ts_adam.opt_state) == sched_counts(ts_opt.opt_state)


def test_train_step_fused_adam_matches_fused_optax():
    """End-to-end: train_step(fused_update) with and without fused_adam
    produces the same params/metrics (same key => same rollout + shuffle)."""
    import dataclasses

    from gym_fishing_tpu.batch import batched_reset

    env, env_params = registry.make("fishing-v1")
    base = ppo.PPOConfig(
        num_envs=32, num_steps=16, epochs=2, num_minibatches=2, hidden=32,
        fused_update=True,
    )
    key = jax.random.key(17)
    ts0 = ppo.make_train_state(env, base, key)
    bstate = batched_reset(env, env_params, base.num_envs)

    outs = {}
    for fused_adam in (False, True):
        cfg = dataclasses.replace(base, fused_adam=fused_adam)
        ts, bstate2, metrics = jax.jit(
            lambda ts, bs, k, cfg=cfg: ppo.train_step(
                env, env_params, cfg, ts, bs, k
            )
        )(ts0, bstate, key)
        ts, bstate2, metrics = jax.jit(
            lambda ts, bs, k, cfg=cfg: ppo.train_step(
                env, env_params, cfg, ts, bs, k
            )
        )(ts, bstate2, jax.random.key(18))
        outs[fused_adam] = (ts, metrics)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-6
        ),
        outs[True][0].params, outs[False][0].params,
    )
    assert int(outs[True][0].step) == int(outs[False][0].step) == 8
    for name in ("pg_loss", "v_loss", "loss"):
        np.testing.assert_allclose(
            np.asarray(outs[True][1][name]), np.asarray(outs[False][1][name]),
            rtol=2e-4, atol=1e-5, err_msg=name,
        )
