"""Pallas TPU fused PPO-update kernel — minibatch gradient in one pass.

The XLA update path (agents/ppo.py train_step) is the measured ceiling of the
full training loop: each epoch is a full pass over N = num_envs*num_steps
samples through jax.value_and_grad of the actor-critic loss, materializing
every [N, hidden] activation in HBM for the backward pass plus dozens of small
kernels (log-prob, ratio, clip, reductions, Adam). For the tiny fisheries MLP
(obs_dim~1, hidden 64) the arithmetic is trivial — the epoch is pure HBM
traffic and per-kernel overhead.

This kernel computes the COMPLETE clipped-PPO minibatch gradient (policy +
value towers + log_std) in a single fused pass: the packed sample matrix is
streamed through VMEM tile by tile, the forward activations live only in
VMEM/registers, the hand-derived backward runs immediately on the same tile,
and per-parameter gradient accumulators persist in the (revisited) output
blocks across grid steps. HBM traffic per minibatch drops from
O(N·hidden · #activations) to exactly one read of the [C, N] sample matrix.

Network (must match agents/ppo.ActorCritic; both action heads):
    h1 = tanh(x W1 + b1); h2 = tanh(h1 W2 + b2)
    pi_out = h2 Wm + bm (Gaussian mean, or categorical logits);
    value = h2v Wv + bv;   log_std: free param (Gaussian head only)
Loss (must match agents/ppo.ppo_loss):
    ratio = exp(logp - old_logp), adv_n = (adv - mu)/(std + 1e-8)
    pg = -mean(min(ratio*adv_n, clip(ratio, 1±eps)*adv_n))
    v_clip = old_v + clip(v - old_v, ±eps)
    vl = 0.5*mean(max((v-ret)^2, (v_clip-ret)^2))
    total = pg + vf_coef*vl - ent_coef*ent
(adv mu/std are precomputed per minibatch on the XLA side — they carry no
parameter gradient, so the split is exact.)

The hand-derived VJP is validated against jax.grad of ppo_loss to float32
tolerance in tests/test_update_kernel.py.

Data layout: samples ride FEATURE-MAJOR, data[C_PAD, N] f32 — each field is a
row, so a tile is (C_PAD=8 sublanes) x (TILE lanes): perfect f32 tiling with
zero padding waste, and both the first-layer matmul x@W1 ([D,TILE] contracted
on D) and its dW1 ([D,TILE]x[TILE,H]) need no in-kernel transposes.

Reference: the reference trains via external sb3 PPO (SURVEY.md §3.5,
reconstructed — /root/reference is empty); the clipped-surrogate semantics
here mirror agents/ppo.ppo_loss, not any reference code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
C_PAD = 8          # default padded feature rows (obs[1], act[1], 4 scalars)
SUBLANES = 8       # feature rows must pad to a multiple of the f32 sublane
NUM_SCALARS = 8
LOG_2PI = 1.8378770664093453

# scalar vector layout (SMEM):
# 0:clip_eps 1:vf_coef 2:inv_n (1/minibatch) 3:adv_mu 4:adv_inv_std 5:ent_coef


class PPOGrads(NamedTuple):
    """Gradient buffers in kernel layout (see fused_minibatch_grad)."""

    dW1p: jax.Array   # [D, H]
    db1p: jax.Array   # [H, 1]
    dW2p: jax.Array   # [H, H]
    db2p: jax.Array   # [H, 1]
    dWm: jax.Array    # [H, A]
    dbm: jax.Array    # [A, 1]
    dlog_std: jax.Array  # [A, 1]
    dW1v: jax.Array   # [D, H]
    db1v: jax.Array   # [H, 1]
    dW2v: jax.Array   # [H, H]
    db2v: jax.Array   # [H, 1]
    dWv: jax.Array    # [H, 1]
    dbv: jax.Array    # [1, 1]


def _ppo_grad_kernel(
    order_ref,                    # scalar-prefetch (G,) i32 tile visit order
    scal_ref,                     # SMEM (1, NUM_SCALARS) f32
    data_ref,                     # VMEM (C_PAD, TILE) f32
    w1p_ref, b1p_ref, w2p_ref, b2p_ref, wm_ref, bm_ref, ls_ref,
    w1v_ref, b1v_ref, w2v_ref, b2v_ref, wv_ref, bv_ref,
    # outputs (accumulated across the grid):
    dw1p_ref, db1p_ref, dw2p_ref, db2p_ref, dwm_ref, dbm_ref, dls_ref,
    dw1v_ref, db1v_ref, dw2v_ref, db2v_ref, dwv_ref, dbv_ref,
    met_ref,                      # SMEM (1, 4): pg_sum, v_sum, kl_sum, ent_sum
    *,
    obs_dim: int,
    act_dim: int,
    head: str,                    # "gaussian" (continuous) | "categorical"
):
    eps = scal_ref[0, 0]
    vf_coef = scal_ref[0, 1]
    inv_n = scal_ref[0, 2]
    adv_mu = scal_ref[0, 3]
    adv_inv_std = scal_ref[0, 4]

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _zero():
        for ref in (dw1p_ref, db1p_ref, dw2p_ref, db2p_ref, dwm_ref, dbm_ref,
                    dls_ref, dw1v_ref, db1v_ref, dw2v_ref, db2v_ref, dwv_ref,
                    dbv_ref):
            ref[:] = jnp.zeros_like(ref)
        met_ref[0, 0] = 0.0
        met_ref[0, 1] = 0.0
        met_ref[0, 2] = 0.0
        met_ref[0, 3] = 0.0

    # act_dim: gaussian -> action dimensionality (packed as that many
    # columns); categorical -> n_actions (logits width; packed as ONE index
    # column).
    D, A = obs_dim, act_dim
    na = act_dim if head == "gaussian" else 1
    x = data_ref[0:D, :]                       # [D, TILE]
    act = data_ref[D:D + na, :]                # [na, TILE]
    old_logp = data_ref[D + na:D + na + 1, :]  # [1, TILE]
    old_v = data_ref[D + na + 1:D + na + 2, :]
    adv = data_ref[D + na + 2:D + na + 3, :]
    ret = data_ref[D + na + 3:D + na + 4, :]

    f32 = jnp.float32

    def fwd(w1, b1, w2, b2):
        # feature-major: h = tanh(W^T x + b), shapes [H, TILE]
        p1 = jax.lax.dot_general(
            w1[:], x, (((0,), (0,)), ((), ())), preferred_element_type=f32
        ) + b1[:]
        h1 = jnp.tanh(p1)
        p2 = jax.lax.dot_general(
            w2[:], h1, (((0,), (0,)), ((), ())), preferred_element_type=f32
        ) + b2[:]
        return h1, jnp.tanh(p2)

    h1p, h2p = fwd(w1p_ref, b1p_ref, w2p_ref, b2p_ref)
    h1v, h2v = fwd(w1v_ref, b1v_ref, w2v_ref, b2v_ref)

    pi_out = jax.lax.dot_general(
        wm_ref[:], h2p, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ) + bm_ref[:]                              # [A, TILE] mean or logits
    value = jax.lax.dot_general(
        wv_ref[:], h2v, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ) + bv_ref[:]                              # [1, TILE]

    if head == "gaussian":
        log_std = ls_ref[:]                    # [A, 1]
        inv_var = jnp.exp(-2.0 * log_std)      # broadcasts over lanes
        diff = act - pi_out                    # [A, TILE]
        logp = jnp.sum(
            -0.5 * (diff * diff * inv_var + 2.0 * log_std + LOG_2PI),
            axis=0, keepdims=True,
        )                                      # [1, TILE]
    else:
        # categorical: logp_all = log_softmax(logits); logp = logp_all[a]
        m = jnp.max(pi_out, axis=0, keepdims=True)
        z = pi_out - m
        lse = jnp.log(jnp.sum(jnp.exp(z), axis=0, keepdims=True))
        logp_all = z - lse                     # [A, TILE]
        probs = jnp.exp(logp_all)
        # Mosaic's tpu.iota is integer-only; cast after
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, pi_out.shape, 0
        ).astype(f32)
        onehot = (row_ids == act).astype(f32)  # act broadcasts [1,TILE]
        logp = jnp.sum(onehot * logp_all, axis=0, keepdims=True)
        ent = -jnp.sum(probs * logp_all, axis=0, keepdims=True)  # [1, TILE]

    # ---- clipped surrogate ----
    logr = logp - old_logp
    ratio = jnp.exp(logr)
    adv_n = (adv - adv_mu) * adv_inv_std
    rc = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
    u1 = ratio * adv_n
    u2 = rc * adv_n
    pg_each = jnp.minimum(u1, u2)
    inside = (ratio > 1.0 - eps) & (ratio < 1.0 + eps)
    # d(-min(u1,u2))/dlogp: unclipped branch when u1<=u2 (grad ratio*adv_n),
    # clipped branch otherwise (grad 0 outside the clip window; inside the
    # window u1==u2 and both branches agree).
    g_logp = jnp.where(
        (u1 <= u2) | inside, ratio * adv_n, 0.0
    ) * (-inv_n)                               # [1, TILE]

    # ---- clipped value loss ----
    dv = value - old_v
    vclip = old_v + jnp.clip(dv, -eps, eps)
    e1 = value - ret
    e2 = vclip - ret
    v_each = jnp.maximum(e1 * e1, e2 * e2)
    inside_v = (dv > -eps) & (dv < eps)
    g_value = jnp.where(
        e1 * e1 >= e2 * e2, e1, jnp.where(inside_v, e2, 0.0)
    ) * (vf_coef * inv_n)                      # [1, TILE]

    # ---- metrics (sums; caller scales by 1/n) ----
    met_ref[0, 0] += jnp.sum(-pg_each)
    met_ref[0, 1] += jnp.sum(0.5 * v_each)
    met_ref[0, 2] += jnp.sum(ratio - 1.0 - logr)   # approx_kl
    if head == "categorical":
        met_ref[0, 3] += jnp.sum(ent)              # data-dependent entropy
    else:
        met_ref[0, 3] += jnp.sum(value)            # spare diagnostic

    # ---- backward: policy head ----
    ent_coef = scal_ref[0, 5]
    if head == "gaussian":
        g_mean = g_logp * diff * inv_var       # [A, TILE] (broadcast over A)
        dls_ref[:] += jnp.sum(
            g_logp * (diff * diff * inv_var - 1.0), axis=1, keepdims=True
        )
    else:
        # d logp_a/d logits = onehot - p; entropy term of the loss,
        # -ent_coef*mean(H), has dH/dlogits_k = -p_k*(logp_k + H)
        g_mean = g_logp * (onehot - probs) + (ent_coef * inv_n) * probs * (
            logp_all + ent
        )                                      # [A, TILE]
        # no log_std parameter: dls_ref stays at its j==0 zero-init

    def bwd_tower(g_top, w_top, h2, h1, w2, xin, dw_top, db_top, dw2, db2,
                  dw1, db1):
        # g_top: [A_or_1, TILE] grad at the linear head output
        dw_top[:] += jax.lax.dot_general(
            h2, g_top, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )                                      # [H, A]
        db_top[:] += jnp.sum(g_top, axis=1, keepdims=True)
        g_h2 = jax.lax.dot_general(
            w_top[:], g_top, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                      # [H, TILE]
        g_p2 = g_h2 * (1.0 - h2 * h2)
        dw2[:] += jax.lax.dot_general(
            h1, g_p2, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )                                      # [H, H] (in, out)
        db2[:] += jnp.sum(g_p2, axis=1, keepdims=True)
        g_h1 = jax.lax.dot_general(
            w2[:], g_p2, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )                                      # [H, TILE]
        g_p1 = g_h1 * (1.0 - h1 * h1)
        dw1[:] += jax.lax.dot_general(
            xin, g_p1, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )                                      # [D, H]
        db1[:] += jnp.sum(g_p1, axis=1, keepdims=True)

    bwd_tower(g_mean, wm_ref, h2p, h1p, w2p_ref, x,
              dwm_ref, dbm_ref, dw2p_ref, db2p_ref, dw1p_ref, db1p_ref)
    bwd_tower(g_value, wv_ref, h2v, h1v, w2v_ref, x,
              dwv_ref, dbv_ref, dw2v_ref, db2v_ref, dw1v_ref, db1v_ref)


@functools.partial(
    jax.jit,
    static_argnames=("obs_dim", "act_dim", "tile", "head", "interpret"),
)
def fused_minibatch_grad(
    data: jax.Array,        # [C_PAD, N] f32 feature-major packed samples
    tile_order: jax.Array,  # (G,) i32 — tile indices this pass visits
    weights: tuple,         # kernel-layout weight arrays, see PPOGrads order
    scalars: jax.Array,     # (NUM_SCALARS,) f32
    obs_dim: int,
    act_dim: int,
    tile: int = 2048,
    head: str = "gaussian",
    interpret: bool = False,
):
    """One fused pass -> (PPOGrads, metric sums [pg, v, kl, spare]).

    The minibatch is DEFINED BY INDEXING, not by copying: `tile_order` is
    scalar-prefetched and drives the data BlockSpec, so the kernel streams
    exactly the tiles tile_order names, in that order, straight out of the
    full [C_PAD, N] sample buffer. Epoch shuffling therefore costs zero HBM
    traffic (the XLA row-gather + random.permutation it replaces measured
    ~20 ms/epoch at N=2^21 on v5e — more than the gradient math itself).

    N must be a multiple of `tile`. Weight layouts (the caller transposes
    from/to the flax pytree, tiny arrays so it's free):
      W1 [D, H], b1 [H, 1], W2 [H, H] (in, out), b2 [H, 1],
      Wm [H, A], bm [A, 1], log_std [A, 1], and the value tower with A=1.
    """
    cpad, n = data.shape
    na = act_dim if head == "gaussian" else 1
    assert cpad % SUBLANES == 0 and n % tile == 0, (cpad, n, tile)
    assert obs_dim + na + 4 <= cpad
    grid = tile_order.shape[0]
    kernel = functools.partial(
        _ppo_grad_kernel, obs_dim=obs_dim, act_dim=act_dim, head=head
    )
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    out_specs = [
        pl.BlockSpec(w.shape, lambda j, order: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]
    out_shape.append(jax.ShapeDtypeStruct((1, 4), jnp.float32))
    out_specs.append(
        pl.BlockSpec((1, 4), lambda j, order: (0, 0), memory_space=pltpu.SMEM)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (cpad, tile),
                lambda j, order: (0, order[j]),
                memory_space=pltpu.VMEM,
            ),
        ] + [whole() for _ in weights],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(tile_order.astype(jnp.int32), scalars.reshape(1, -1), data, *weights)
    return PPOGrads(*outs[:-1]), outs[-1][0]
