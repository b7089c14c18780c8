"""Glue between the flax ActorCritic pytree and the Pallas fused-update kernel.

kernels/ppo_update_kernel.py wants feature-major weight layouts ([H,1] biases,
feature-major [C_PAD, N] sample matrices); flax stores [in, out] kernels and
1-D biases. The arrays are tiny (~17k floats) so the relayout is free — the
point is that the [N, hidden] activations never exist in HBM at all.

Used by agents/ppo.train_step when PPOConfig.fused_update=True; validated
against jax.grad of agents/ppo.ppo_loss in tests/test_update_kernel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gym_fishing_tpu.kernels.ppo_update_kernel import (
    ADAM_B1,
    ADAM_B2,
    ADAM_NUM_SCALARS,
    C_PAD,
    NUM_SCALARS,
    PPOGrads,
    fused_minibatch_grad,
    fused_minibatch_grad_adam,
    merge_weights,
    unmerge_weights,
)

LOG_2PI_E = 2.837877066409345  # log(2*pi*e)


def rollout_scalars(params, seed) -> jax.Array:
    """EnvParams -> the policy-rollout kernel's scalar vector (traced-safe).

    Same layout as kernels/rollout_kernel.make_scalars, with slot 3 carrying
    the continuous decode constant (action_scale); slot 18 (n_actions) is a
    placeholder — the policy kernel's n_actions is static. Unlike
    make_scalars this accepts traced params (jnp.stack, no float()).
    """
    vals = [
        params.r, params.K, params.sigma, params.action_scale, params.price,
        params.Tmax, params.init_state, seed, params.A, params.B, params.C,
        params.theta, params.a, params.b, params.q, params.collapse_penalty,
        params.r_drift, params.cost, 0.0, params.sigma_m,
        params.init_harvest, params.model_idx,
    ]
    return jnp.stack(
        [jnp.asarray(v, jnp.float32).reshape(()) for v in vals]
    )


def fused_epoch_scan(cfg, ts, packed_t, obs_dim, act_dim, k_perm,
                     head: str = "gaussian", interpret: bool = False,
                     axis_name=None):
    """cfg.epochs x cfg.num_minibatches fused-gradient updates over packed_t.

    The shared core of the fused update path: zero-copy tile-shuffled
    minibatches (see kernels/ppo_update_kernel.fused_minibatch_grad), exact
    per-minibatch advantage statistics from per-tile partial sums, optax
    apply. With `axis_name` (inside shard_map over a device mesh), packed_t
    is the device-local shard: advantage statistics and gradients/metrics are
    psum/pmean-reduced across the axis, so every device applies the identical
    global-minibatch update and replicated params stay in sync — the fused
    analog of the XLA path's GSPMD gradient all-reduce (SURVEY.md §2.4).

    Returns (ts, metrics) with metrics stacked [epochs, num_minibatches].
    """
    batch_local = packed_t.shape[1]
    mb_local = batch_local // cfg.num_minibatches
    tile = next(
        (t for t in (2048, 1024, 512, 256, 128) if mb_local % t == 0), None
    )
    if tile is None:
        raise ValueError(
            f"fused_update needs local minibatch size {mb_local} "
            "divisible by 128"
        )
    num_tiles = batch_local // tile
    tiles_per_mb = mb_local // tile
    na = act_dim if head == "gaussian" else 1   # packed action columns
    adv_tiles = packed_t[obs_dim + na + 2].reshape(num_tiles, tile)
    tile_sum = adv_tiles.sum(axis=1)
    tile_sumsq = (adv_tiles * adv_tiles).sum(axis=1)

    def epoch(ts, ep_key):
        tile_perm = jax.random.permutation(ep_key, num_tiles)

        def minibatch(ts, i):
            order = jax.lax.dynamic_slice(
                tile_perm, (i * tiles_per_mb,), (tiles_per_mb,)
            )
            s = jnp.take(tile_sum, order).sum()
            ss = jnp.take(tile_sumsq, order).sum()
            n = jnp.float32(mb_local)
            if axis_name is not None:
                s, ss, n = jax.lax.psum((s, ss, n), axis_name)
            mu = s / n
            var = ss / n - mu * mu
            inv_std = 1.0 / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-8)
            grads, metrics = fused_grad(
                ts.params, packed_t, cfg.clip_eps, cfg.vf_coef, cfg.ent_coef,
                obs_dim=obs_dim, act_dim=act_dim, tile=tile,
                tile_order=order, adv_stats=(mu, inv_std), head=head,
                compute=cfg.compute_dtype, interpret=interpret,
            )
            if axis_name is not None:
                # mean over equal-size local shards == the global-minibatch
                # gradient (adv stats above are already global)
                grads = jax.lax.pmean(grads, axis_name)
                metrics = jax.lax.pmean(metrics, axis_name)
            ts = ts.apply_gradients(grads=grads)
            return ts, metrics

        return jax.lax.scan(minibatch, ts, jnp.arange(cfg.num_minibatches))

    return jax.lax.scan(epoch, ts, jax.random.split(k_perm, cfg.epochs))


def _find_adam_state(opt_state):
    """Locate the single ScaleByAdamState inside an optax chain state."""
    import optax

    hits = [
        s for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    if len(hits) != 1:
        raise NotImplementedError(
            "fused_adam expects exactly one ScaleByAdamState in the "
            f"optimizer chain, found {len(hits)}"
        )
    return hits[0]


def _replace_adam_state(opt_state, new_adam, n_updates: int = 0):
    """Swap in the new ScaleByAdamState; advance any schedule counts.

    With anneal_lr the optax chain also carries a ScaleByScheduleState
    whose count drives the lr schedule — it must advance by the number of
    fused updates so a later optax-path apply continues the schedule."""
    import optax

    def sub(s):
        if isinstance(s, optax.ScaleByAdamState):
            return new_adam
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=s.count + n_updates)
        return s

    return jax.tree_util.tree_map(
        sub, opt_state,
        is_leaf=lambda x: isinstance(
            x, (optax.ScaleByAdamState, optax.ScaleByScheduleState)
        ),
    )


def fused_epoch_scan_adam(cfg, ts, packed_t, obs_dim, act_dim, k_perm,
                          head: str = "gaussian", interpret: bool = False):
    """fused_epoch_scan with the optimizer fused INTO the kernel.

    Single-device only (the sharded path must pmean gradients before the
    update, so it keeps optax — shard/fused_ppo.py). Each minibatch is ONE
    pallas launch computing gradient + global-norm clip + Adam
    (kernels/ppo_update_kernel.fused_minibatch_grad_adam); the scan carries
    the merged weights and Adam moments, and optax state is read once
    before and written back once after — removing the 32 per-minibatch
    optax applies and grads->pytree relayouts (VERDICT r3 #3).

    Semantics match optax.chain(clip_by_global_norm, adam(lr, eps=1e-5)),
    including anneal_lr's linear schedule (lr is a per-launch scalar, so
    the schedule is evaluated host-side from the carried Adam count —
    exactly optax.linear_schedule(lr, 0, total_updates)); validated
    against the optax path in tests/test_update_kernel.py.

    Metric approximation (ADVICE r4): for the gaussian head, the reported
    ``entropy`` (and hence the ``loss`` metric) is computed from log_std
    frozen at train-step entry, while the optax path recomputes it from the
    evolving params each minibatch — so when ent_coef > 0 these two METRICS
    drift slightly within a train step. The params/optimizer math is
    unaffected (the kernel differentiates the true entropy term), so parity
    tests on the metrics should use a relaxed tolerance when ent_coef > 0.
    """
    batch_local = packed_t.shape[1]
    mb_local = batch_local // cfg.num_minibatches
    tile = next(
        (t for t in (2048, 1024, 512, 256, 128) if mb_local % t == 0), None
    )
    if tile is None:
        raise ValueError(
            f"fused_update needs local minibatch size {mb_local} "
            "divisible by 128"
        )
    num_tiles = batch_local // tile
    tiles_per_mb = mb_local // tile
    na = act_dim if head == "gaussian" else 1
    adv_tiles = packed_t[obs_dim + na + 2].reshape(num_tiles, tile)
    tile_sum = adv_tiles.sum(axis=1)
    tile_sumsq = (adv_tiles * adv_tiles).sum(axis=1)

    adam = _find_adam_state(ts.opt_state)
    merged_w = merge_weights(kernel_weights(ts.params, head))
    merged_m = merge_weights(kernel_weights(adam.mu, head))
    merged_v = merge_weights(kernel_weights(adam.nu, head))
    count0 = adam.count

    base = jnp.stack([
        jnp.float32(cfg.clip_eps), jnp.float32(cfg.vf_coef),
        jnp.float32(1.0 / mb_local), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(cfg.ent_coef),
    ])

    log_std0 = ts.params["params"].get("log_std")  # entropy metric (gaussian)

    def epoch(carry, ep_key):
        w, m, v, count = carry
        tile_perm = jax.random.permutation(ep_key, num_tiles)

        def minibatch(carry, i):
            w, m, v, count = carry
            order = jax.lax.dynamic_slice(
                tile_perm, (i * tiles_per_mb,), (tiles_per_mb,)
            )
            s = jnp.take(tile_sum, order).sum()
            ss = jnp.take(tile_sumsq, order).sum()
            n = jnp.float32(mb_local)
            mu = s / n
            var = ss / n - mu * mu
            inv_std = 1.0 / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-8)
            count1 = count + 1
            tf = count1.astype(jnp.float32)
            bc1 = 1.0 - jnp.power(jnp.float32(ADAM_B1), tf)
            bc2 = 1.0 - jnp.power(jnp.float32(ADAM_B2), tf)
            if cfg.anneal_lr:
                # optax.linear_schedule(lr, 0, total_updates), evaluated at
                # the PRE-increment count — matching scale_by_schedule's
                # "use count, then increment" order in the optax chain
                total_updates = (
                    cfg.total_iterations * cfg.epochs * cfg.num_minibatches
                )
                frac = jnp.clip(
                    count.astype(jnp.float32) / jnp.float32(total_updates),
                    0.0, 1.0,
                )
                lr = jnp.float32(cfg.lr) * (1.0 - frac)
            else:
                lr = jnp.float32(cfg.lr)
            scalars = jnp.zeros((ADAM_NUM_SCALARS,), jnp.float32)
            scalars = scalars.at[0:6].set(base)
            scalars = scalars.at[3].set(mu)
            scalars = scalars.at[4].set(inv_std)
            scalars = scalars.at[8].set(lr)
            scalars = scalars.at[9].set(bc1)
            scalars = scalars.at[10].set(bc2)
            w, m, v, met = fused_minibatch_grad_adam(
                packed_t, order, w, m, v, scalars, obs_dim=obs_dim,
                act_dim=act_dim, tile=tile, head=head,
                compute=cfg.compute_dtype, max_grad_norm=cfg.max_grad_norm,
                interpret=interpret,
            )
            inv_n = 1.0 / n
            pg_loss = met[0] * inv_n
            v_loss = met[1] * inv_n
            if head == "gaussian":
                entropy = jnp.sum(log_std0 + 0.5 * LOG_2PI_E)
            else:
                entropy = met[3] * inv_n
            metrics = {
                "pg_loss": pg_loss,
                "v_loss": v_loss,
                "entropy": entropy,
                "approx_kl": met[2] * inv_n,
                "loss": pg_loss + cfg.vf_coef * v_loss
                - cfg.ent_coef * entropy,
            }
            return (w, m, v, count1), metrics

        return jax.lax.scan(
            minibatch, (w, m, v, count), jnp.arange(cfg.num_minibatches)
        )

    (merged_w, merged_m, merged_v, count), metrics = jax.lax.scan(
        epoch, (merged_w, merged_m, merged_v, count0),
        jax.random.split(k_perm, cfg.epochs),
    )

    h = ts.params["params"]["pi_d1"]["kernel"].shape[1]
    a = (
        ts.params["params"]["pi_mean"]["kernel"].shape[1]
        if head == "gaussian"
        else ts.params["params"]["pi_logits"]["kernel"].shape[1]
    )

    def to_params(merged, include_log_std: bool):
        (w1p, b1p, w2p, b2p, wm, bm, ls, w1v, b1v, w2v, b2v, wv, bv) = (
            unmerge_weights(merged, h, a)
        )
        row = lambda x: x.reshape(-1)
        pi_head = "pi_mean" if head == "gaussian" else "pi_logits"
        tree = {
            "params": {
                "pi_d1": {"kernel": w1p, "bias": row(b1p)},
                "pi_d2": {"kernel": w2p, "bias": row(b2p)},
                pi_head: {"kernel": wm, "bias": row(bm)},
                "v_d1": {"kernel": w1v, "bias": row(b1v)},
                "v_d2": {"kernel": w2v, "bias": row(b2v)},
                "v_out": {"kernel": wv, "bias": row(bv)},
            }
        }
        if include_log_std:
            tree["params"]["log_std"] = row(ls)
        return tree

    has_log_std = head == "gaussian"
    import optax

    new_adam = optax.ScaleByAdamState(
        count=count,
        mu=to_params(merged_m, has_log_std),
        nu=to_params(merged_v, has_log_std),
    )
    n_updates = cfg.epochs * cfg.num_minibatches
    ts = ts.replace(
        params=to_params(merged_w, has_log_std),
        opt_state=_replace_adam_state(ts.opt_state, new_adam, n_updates),
        step=ts.step + n_updates,
    )
    return ts, metrics


def fused_rollout_collect(env, env_params, cfg, ts, bstate, key,
                          interpret: bool = False):
    """Run the fused policy-rollout kernel and rebuild the BatchState.

    Returns (PolicyRollout, next BatchState). The kernel replaces
    collect_rollout + compute_gae + packing for the continuous scheme; its
    packed_t output feeds fused_grad directly.
    """
    from gym_fishing_tpu.batch import BatchState
    from gym_fishing_tpu.core.types import EnvState
    from gym_fishing_tpu.kernels.policy_rollout_kernel import (
        pallas_policy_rollout,
    )

    num_envs = bstate.episode_return.shape[0]
    eblk = next((e for e in (1024, 512, 256, 128) if num_envs % e == 0), None)
    if eblk is None:
        raise ValueError(
            f"fused_rollout needs num_envs {num_envs} divisible by 128"
        )
    scheme = env.config.scheme
    head = "gaussian" if scheme == "continuous" else "categorical"
    # obs_noise is a STATIC kernel switch (it changes the in-kernel RNG draw
    # pattern), so sigma_m must be concrete here. Under `train` it is: the
    # env params ride the jit closure as constants. A traced sigma_m means
    # the caller jitted params as an argument — refuse loudly rather than
    # silently train noise-free (VERDICT r2 weak #4).
    sm = env_params.sigma_m
    if isinstance(sm, jax.core.Tracer):
        raise NotImplementedError(
            "fused_rollout needs a concrete (non-traced) sigma_m to decide "
            "the obs-noise kernel path; close env_params over the jit "
            "instead of passing them as a traced argument"
        )
    obs_noise = float(sm) > 0.0
    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
    scalars = rollout_scalars(env_params, seed.astype(jnp.float32))
    roll = pallas_policy_rollout(
        bstate.env.stock.astype(jnp.float32),
        bstate.env.t,
        bstate.env.harvest.astype(jnp.float32),
        bstate.episode_return.astype(jnp.float32),
        bstate.episode_length,
        kernel_weights(ts.params, head),
        scalars,
        num_steps=cfg.num_steps,
        envs_per_block=eblk,
        growth=env.config.growth,
        noise_form=env.config.noise_form,
        gamma=cfg.gamma,
        gae_lambda=cfg.gae_lambda,
        scheme=scheme,
        n_actions=env.config.n_actions,
        obs_noise=obs_noise,
        interpret=interpret,
        compute=cfg.compute_dtype,
        pregen_noise=cfg.rollout_pregen_noise,
        fold_obs=cfg.rollout_fold_obs,
        vector_gae=cfg.rollout_vector_gae,
    )
    dtype = env_params.dtype
    new_bstate = BatchState(
        env=EnvState(
            stock=roll.stock.astype(dtype),
            harvest=roll.harvest.astype(dtype),
            t=roll.t,
        ),
        episode_return=roll.ep_ret.astype(dtype),
        episode_length=roll.ep_len,
    )
    return roll, new_bstate


def kernel_weights(params, head: str = "gaussian") -> tuple:
    """Flax ActorCritic param pytree -> kernel-layout weight tuple.

    head="categorical" maps the discrete ActorCritic (pi_logits head, no
    log_std parameter): the kernel's log_std slot receives a zeros [A, 1]
    placeholder it never reads on the categorical path.
    """
    p = params["params"]
    col = lambda v: v.reshape(-1, 1).astype(jnp.float32)
    pi_head = p["pi_mean"] if head == "gaussian" else p["pi_logits"]
    log_std = (
        col(p["log_std"]) if head == "gaussian"
        else jnp.zeros((pi_head["bias"].shape[0], 1), jnp.float32)
    )
    return (
        p["pi_d1"]["kernel"].astype(jnp.float32),
        col(p["pi_d1"]["bias"]),
        p["pi_d2"]["kernel"].astype(jnp.float32),
        col(p["pi_d2"]["bias"]),
        pi_head["kernel"].astype(jnp.float32),
        col(pi_head["bias"]),
        log_std,
        p["v_d1"]["kernel"].astype(jnp.float32),
        col(p["v_d1"]["bias"]),
        p["v_d2"]["kernel"].astype(jnp.float32),
        col(p["v_d2"]["bias"]),
        p["v_out"]["kernel"].astype(jnp.float32),
        col(p["v_out"]["bias"]),
    )


def grads_pytree(g: PPOGrads, params, ent_coef: float,
                 head: str = "gaussian"):
    """Kernel-layout gradients -> flax param pytree (same treedef as params).

    Gaussian: the entropy term of the loss, -ent_coef*mean(sum_a(log_std+c)),
    is data-independent; its gradient (-ent_coef per action dim) is added
    here rather than in the kernel. Categorical: entropy is data-dependent
    and its gradient is already folded into dWm/dbm inside the kernel; there
    is no log_std parameter.
    """
    row = lambda v: v.reshape(-1)
    pi_head = "pi_mean" if head == "gaussian" else "pi_logits"
    tree = {
        "params": {
            "pi_d1": {"kernel": g.dW1p, "bias": row(g.db1p)},
            "pi_d2": {"kernel": g.dW2p, "bias": row(g.db2p)},
            pi_head: {"kernel": g.dWm, "bias": row(g.dbm)},
            "v_d1": {"kernel": g.dW1v, "bias": row(g.db1v)},
            "v_d2": {"kernel": g.dW2v, "bias": row(g.db2v)},
            "v_out": {"kernel": g.dWv, "bias": row(g.dbv)},
        }
    }
    if head == "gaussian":
        tree["params"]["log_std"] = row(g.dlog_std) - ent_coef
    return tree


def pack_feature_major(mb: jax.Array) -> jax.Array:
    """[N, C] sample-major minibatch -> feature-major [C', N], C' padded to
    the f32 sublane count (8) so tiles map onto VMEM with zero waste."""
    n, c = mb.shape
    cpad = -(-c // 8) * 8
    out = mb.T
    if c < cpad:
        out = jnp.concatenate(
            [out, jnp.zeros((cpad - c, n), out.dtype)], axis=0
        )
    return out


def fused_grad(
    params,
    data_t: jax.Array,     # [C_PAD, N] feature-major packed samples
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    obs_dim: int,
    act_dim: int,
    tile: int = 2048,
    tile_order=None,       # (G,) i32 tile indices forming the minibatch
    adv_stats=None,        # (mu, inv_std) over the minibatch, if known
    head: str = "gaussian",
    compute: str = "float32",
    interpret: bool = False,
):
    """Full PPO minibatch gradient + metrics via the fused kernel.

    Returns (grads pytree matching `params`, metrics dict) — the same
    quantities jax.value_and_grad(ppo_loss) produces, computed in one fused
    pass. With `tile_order` the minibatch is the named tiles of `data_t`
    (zero-copy shuffling — see fused_minibatch_grad); without it the whole
    buffer is the minibatch. Advantage-normalization statistics carry no
    parameter gradient, so computing them outside the kernel is exact; pass
    `adv_stats` when the caller can compute them cheaply (per-tile partial
    sums), else they are computed here over the full buffer.

    head="categorical": `act_dim` is n_actions (the logits width); the
    packed action field is ONE column holding the f32-encoded class index.
    """
    n = data_t.shape[1]
    na = act_dim if head == "gaussian" else 1
    if tile_order is None:
        assert n % tile == 0
        tile_order = jnp.arange(n // tile, dtype=jnp.int32)
    n_mb = tile_order.shape[0] * tile
    if adv_stats is None:
        assert n_mb == n, "adv_stats required when tile_order subsets the data"
        adv = data_t[obs_dim + na + 2, :]
        adv_mu = adv.mean()
        adv_inv_std = 1.0 / (adv.std() + 1e-8)
    else:
        adv_mu, adv_inv_std = adv_stats
    n = n_mb
    scalars = jnp.stack(
        [
            jnp.float32(clip_eps),
            jnp.float32(vf_coef),
            jnp.float32(1.0 / n),
            jnp.asarray(adv_mu, jnp.float32),
            jnp.asarray(adv_inv_std, jnp.float32),
            jnp.float32(ent_coef),
            jnp.float32(0.0),
            jnp.float32(0.0),
        ]
    )
    assert scalars.shape[0] == NUM_SCALARS
    weights = kernel_weights(params, head)
    g, met = fused_minibatch_grad(
        data_t, tile_order, weights, scalars, obs_dim=obs_dim,
        act_dim=act_dim, tile=min(tile, data_t.shape[1]), head=head,
        compute=compute, interpret=interpret,
    )
    grads = grads_pytree(g, params, ent_coef, head)
    if head == "gaussian":
        log_std = params["params"]["log_std"]
        entropy = jnp.sum(log_std + 0.5 * LOG_2PI_E)
    else:
        entropy = met[3] / n                 # data-dependent, summed in-kernel
    pg_loss = met[0] / n
    v_loss = met[1] / n
    metrics = {
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": entropy,
        "approx_kl": met[2] / n,
        "loss": pg_loss + vf_coef * v_loss - ent_coef * entropy,
    }
    return grads, metrics
