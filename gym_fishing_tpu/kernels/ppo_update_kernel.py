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

Merged block-diagonal towers (round 3): both MLP towers ride ONE matmul
chain — W1c [D, 2H] (concat), W2c [2H, 2H] block-diagonal, Whc [2H, A+1]
(policy head columns + value column) — exactly MXU-shaped [128, 128] at the
default hidden=64, mirroring the policy-rollout kernel's merged-tower
design (see policy_rollout_kernel.py). The zero off-diagonal blocks
contribute exact zeros, so the merged forward/backward is bit-exact f32
against the split towers for every real parameter; the off-diagonal blocks
of the ACCUMULATED dW2c/dWhc hold cross-tower garbage that the wrapper
slices away (they correspond to no parameter). The 6 half-occupancy
[64,64]-contraction matmuls per tile become 3 full-occupancy [128,128]
ones (2x the raw MACs at ~4x the per-MAC rate under compute="bfloat16";
measured roughly rate-neutral at f32 — the merge is kept for the smaller
buffer count and for the native-shape bf16 path. Round-3 tuning sweeps
pinned the epoch as matmul-throughput-bound at ~57 TFLOP/s effective:
bigger tiles and bf16 inputs both measured neutral-to-worse, see
BENCH_NOTES "Round 3c").
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

from gym_fishing_tpu.kernels.rollout_kernel import _interpret_param

LANES = 128
C_PAD = 8          # default padded feature rows (obs[1], act[1], 4 scalars)
SUBLANES = 8       # feature rows must pad to a multiple of the f32 sublane
NUM_SCALARS = 8
ADAM_NUM_SCALARS = 16
LOG_2PI = 1.8378770664093453

# Adam hyperparameters — the single source of truth for every site that must
# stay in sync with optax: agents/ppo.make_train_state's optax.adam(eps=...),
# agents/ppo_fused.fused_epoch_scan_adam's host-side bias corrections, and
# fused_minibatch_grad_adam's kernel defaults below (ADVICE r4: previously
# three independent literals).
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-5

# scalar vector layout (SMEM):
# 0:clip_eps 1:vf_coef 2:inv_n (1/minibatch) 3:adv_mu 4:adv_inv_std 5:ent_coef
# fused-Adam extension (slots 8+, ADAM_NUM_SCALARS vector):
# 8:lr 9:bias_corr1 (1-b1^t) 10:bias_corr2 (1-b2^t)


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
    # merged-tower weights (see fused_minibatch_grad for layouts):
    w1c_ref, b1c_ref, w2c_ref, b2c_ref, whc_ref, bhc_ref, ls_ref,
    # outputs (accumulated across the grid):
    dw1c_ref, db1c_ref, dw2c_ref, db2c_ref, dwhc_ref, dbhc_ref, dls_ref,
    met_ref,                      # SMEM (1, 4): pg_sum, v_sum, kl_sum, ent_sum
    *,
    obs_dim: int,
    act_dim: int,
    head: str,                    # "gaussian" (continuous) | "categorical"
    compute: str,                 # "float32" (exact) | "bfloat16" (mixed)
):
    _grad_tile(
        scal_ref, data_ref,
        w1c_ref, b1c_ref, w2c_ref, b2c_ref, whc_ref, bhc_ref, ls_ref,
        dw1c_ref, db1c_ref, dw2c_ref, db2c_ref, dwhc_ref, dbhc_ref, dls_ref,
        met_ref,
        obs_dim=obs_dim, act_dim=act_dim, head=head, compute=compute,
    )


def _grad_tile(
    scal_ref, data_ref,
    w1c_ref, b1c_ref, w2c_ref, b2c_ref, whc_ref, bhc_ref, ls_ref,
    dw1c_ref, db1c_ref, dw2c_ref, db2c_ref, dwhc_ref, dbhc_ref, dls_ref,
    met_ref,
    *,
    obs_dim: int,
    act_dim: int,
    head: str,
    compute: str,
):
    """Shared per-tile forward + hand-VJP backward (grid-accumulated)."""
    eps = scal_ref[0, 0]
    vf_coef = scal_ref[0, 1]
    inv_n = scal_ref[0, 2]
    adv_mu = scal_ref[0, 3]
    adv_inv_std = scal_ref[0, 4]

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _zero():
        for ref in (dw1c_ref, db1c_ref, dw2c_ref, db2c_ref, dwhc_ref,
                    dbhc_ref, dls_ref):
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
    # Mixed precision (opt-in): only the three [2H]-contraction matmuls (fwd
    # W2c, bwd dW2c, bwd g_h1c — >95% of the kernel's MACs) take bf16 INPUTS;
    # accumulation stays f32 on the MXU (preferred_element_type), all
    # elementwise math, the head, the rank-1 input layer and every gradient
    # buffer stay f32. bf16 runs the MXU at native rate where f32 needs a
    # multi-pass decomposition.
    mt = jnp.bfloat16 if compute == "bfloat16" else f32

    def mxu(a, b, dims):
        return jax.lax.dot_general(
            a.astype(mt), b.astype(mt), (dims, ((), ())),
            preferred_element_type=f32,
        )

    # merged feature-major forward: h = tanh(W^T x + b), shapes [2H, TILE]
    p1c = jax.lax.dot_general(
        w1c_ref[:], x, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ) + b1c_ref[:]
    h1c = jnp.tanh(p1c)
    p2c = mxu(w2c_ref[:], h1c, ((0,), (0,))) + b2c_ref[:]
    h2c = jnp.tanh(p2c)                        # [2H, TILE]
    out_c = jax.lax.dot_general(
        whc_ref[:], h2c, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ) + bhc_ref[:]                             # [A+1, TILE]
    pi_out = out_c[0:act_dim, :]               # [A, TILE] mean or logits
    value = out_c[act_dim:act_dim + 1, :]      # [1, TILE]

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

    # ---- merged backward: one chain through the block-diagonal weights.
    # The zero off-diagonal blocks of w2c/whc make g_h1c/g_h2c exactly the
    # per-tower gradients; the off-diagonal blocks ACCUMULATED into dw2c/dwhc
    # are cross-tower products the wrapper slices away (no parameter there).
    g_top_c = jnp.concatenate([g_mean, g_value], axis=0)  # [A+1, TILE]
    dwhc_ref[:] += jax.lax.dot_general(
        h2c, g_top_c, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )                                          # [2H, A+1]
    dbhc_ref[:] += jnp.sum(g_top_c, axis=1, keepdims=True)
    g_h2c = jax.lax.dot_general(
        whc_ref[:], g_top_c, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                          # [2H, TILE]
    g_p2c = g_h2c * (1.0 - h2c * h2c)
    dw2c_ref[:] += mxu(h1c, g_p2c, ((1,), (1,)))  # [2H, 2H] (in, out)
    db2c_ref[:] += jnp.sum(g_p2c, axis=1, keepdims=True)
    g_h1c = mxu(w2c_ref[:], g_p2c, ((1,), (0,)))  # [2H, TILE]
    g_p1c = g_h1c * (1.0 - h1c * h1c)
    dw1c_ref[:] += jax.lax.dot_general(
        x, g_p1c, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )                                          # [D, 2H]
    db1c_ref[:] += jnp.sum(g_p1c, axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "obs_dim", "act_dim", "tile", "head", "compute", "interpret"
    ),
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
    compute: str = "float32",
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

    Internally the towers are merged block-diagonally (W1c [D, 2H], W2c
    [2H, 2H], Whc [2H, A+1] — see the module docstring) so the hot matmuls
    are full-MXU [128, 128] contractions at hidden=64; the merge and the
    gradient un-merge below are O(H^2) XLA ops, negligible next to the pass.
    """
    cpad, n = data.shape
    na = act_dim if head == "gaussian" else 1
    assert cpad % SUBLANES == 0 and n % tile == 0, (cpad, n, tile)
    assert obs_dim + na + 4 <= cpad
    grid = tile_order.shape[0]
    kernel = functools.partial(
        _ppo_grad_kernel, obs_dim=obs_dim, act_dim=act_dim, head=head,
        compute=compute,
    )

    merged = merge_weights(weights)
    h = weights[0].shape[1]
    a = weights[4].shape[1]

    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in merged]
    out_specs = [
        pl.BlockSpec(w.shape, lambda j, order: (0, 0), memory_space=pltpu.VMEM)
        for w in merged
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
        ] + [whole() for _ in merged],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret_param(interpret),
    )(tile_order.astype(jnp.int32), scalars.reshape(1, -1), data, *merged)
    dw1c, db1c, dw2c, db2c, dwhc, dbhc, dls = outs[:-1]
    grads = PPOGrads(
        dW1p=dw1c[:, :h], db1p=db1c[:h], dW2p=dw2c[:h, :h], db2p=db2c[:h],
        dWm=dwhc[:h, :a], dbm=dbhc[:a], dlog_std=dls,
        dW1v=dw1c[:, h:], db1v=db1c[h:], dW2v=dw2c[h:, h:], db2v=db2c[h:],
        dWv=dwhc[h:, a:], dbv=dbhc[a:],
    )
    return grads, outs[-1][0]


def merge_weights(weights: tuple) -> tuple:
    """13 split-tower kernel-layout arrays -> 7 merged block-diagonal arrays.

    Layouts: W1c [D, 2H] (concat), b1c [2H, 1], W2c [2H, 2H] block-diagonal,
    b2c [2H, 1], Whc [2H, A+1] (policy-head columns + value column, zero
    off-diagonal), bhc [A+1, 1], log_std [A, 1]. The zero off-diagonal
    blocks correspond to NO parameter (see module docstring)."""
    (w1p, b1p, w2p, b2p, wm, bm, ls, w1v, b1v, w2v, b2v, wv, bv) = weights
    h = w1p.shape[1]
    a = wm.shape[1]
    f32 = jnp.float32
    w1c = jnp.concatenate([w1p, w1v], axis=1)              # [D, 2H]
    b1c = jnp.concatenate([b1p, b1v], axis=0)              # [2H, 1]
    zhh = jnp.zeros((h, h), f32)
    w2c = jnp.concatenate(
        [
            jnp.concatenate([w2p, zhh], axis=1),
            jnp.concatenate([zhh, w2v], axis=1),
        ],
        axis=0,
    )                                                      # [2H, 2H]
    b2c = jnp.concatenate([b2p, b2v], axis=0)              # [2H, 1]
    whc = jnp.concatenate(
        [
            jnp.concatenate([wm, jnp.zeros((h, 1), f32)], axis=1),
            jnp.concatenate([jnp.zeros((h, a), f32), wv], axis=1),
        ],
        axis=0,
    )                                                      # [2H, A+1]
    bhc = jnp.concatenate([bm, bv], axis=0)                # [A+1, 1]
    return (w1c, b1c, w2c, b2c, whc, bhc, ls)


def unmerge_weights(merged: tuple, h: int, a: int) -> tuple:
    """Inverse of merge_weights (drops the zero off-diagonal blocks)."""
    w1c, b1c, w2c, b2c, whc, bhc, ls = merged
    return (
        w1c[:, :h], b1c[:h], w2c[:h, :h], b2c[:h],
        whc[:h, :a], bhc[:a], ls,
        w1c[:, h:], b1c[h:], w2c[h:, h:], b2c[h:],
        whc[h:, a:], bhc[a:],
    )


def _block_diag_masks(h: int, a: int):
    """f32 masks zeroing the cross-tower garbage blocks of dW2c / dWhc."""
    r2 = jax.lax.broadcasted_iota(jnp.int32, (2 * h, 2 * h), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (2 * h, 2 * h), 1)
    m_w2c = (((r2 < h) & (c2 < h)) | ((r2 >= h) & (c2 >= h))).astype(
        jnp.float32
    )
    rh = jax.lax.broadcasted_iota(jnp.int32, (2 * h, a + 1), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (2 * h, a + 1), 1)
    m_whc = (((rh < h) & (ch < a)) | ((rh >= h) & (ch == a))).astype(
        jnp.float32
    )
    return m_w2c, m_whc


def _ppo_grad_adam_kernel(
    order_ref,                    # scalar-prefetch (G,) i32 tile visit order
    scal_ref,                     # SMEM (1, ADAM_NUM_SCALARS) f32
    data_ref,                     # VMEM (C_PAD, TILE) f32
    # merged weights + merged Adam first/second moments (same 7 layouts):
    w1c_ref, b1c_ref, w2c_ref, b2c_ref, whc_ref, bhc_ref, ls_ref,
    m1_ref, m2_ref, m3_ref, m4_ref, m5_ref, m6_ref, m7_ref,
    v1_ref, v2_ref, v3_ref, v4_ref, v5_ref, v6_ref, v7_ref,
    # outputs: grad accumulators, metrics, then new weights / m / v
    dw1c_ref, db1c_ref, dw2c_ref, db2c_ref, dwhc_ref, dbhc_ref, dls_ref,
    met_ref,
    nw1_ref, nw2_ref, nw3_ref, nw4_ref, nw5_ref, nw6_ref, nw7_ref,
    nm1_ref, nm2_ref, nm3_ref, nm4_ref, nm5_ref, nm6_ref, nm7_ref,
    nv1_ref, nv2_ref, nv3_ref, nv4_ref, nv5_ref, nv6_ref, nv7_ref,
    *,
    obs_dim: int,
    act_dim: int,
    head: str,
    compute: str,
    beta1: float,
    beta2: float,
    adam_eps: float,
    max_grad_norm: float,
):
    """fused_minibatch_grad + the COMPLETE optimizer step in one launch.

    Accumulates the minibatch gradient across the grid exactly like
    _ppo_grad_kernel, then — in the LAST grid step, with the full gradient
    sitting in VMEM — applies optax-chain(clip_by_global_norm, adam)
    semantics in-kernel and writes updated weights and Adam moments. The
    32 tiny optax applies + grads->pytree round-trips per iteration
    (~1.4 ms/iter of glue, BENCH_NOTES round 3c) disappear; the XLA side
    only re-slices the merged buffers once per train step (VERDICT r3 #3).
    Validated against the optax path in tests/test_update_kernel.py.
    """
    _grad_tile(
        scal_ref, data_ref,
        w1c_ref, b1c_ref, w2c_ref, b2c_ref, whc_ref, bhc_ref, ls_ref,
        dw1c_ref, db1c_ref, dw2c_ref, db2c_ref, dwhc_ref, dbhc_ref, dls_ref,
        met_ref,
        obs_dim=obs_dim, act_dim=act_dim, head=head, compute=compute,
    )

    j = pl.program_id(0)

    @pl.when(j == pl.num_programs(0) - 1)
    def _optimizer_step():
        ent_coef = scal_ref[0, 5]
        lr = scal_ref[0, 8]
        bc1 = scal_ref[0, 9]       # 1 - beta1^t
        bc2 = scal_ref[0, 10]      # 1 - beta2^t

        h2 = w2c_ref.shape[0]
        h = h2 // 2
        a = whc_ref.shape[1] - 1
        m_w2c, m_whc = _block_diag_masks(h, a)

        # masked gradients: the off-diagonal accumulator blocks are
        # cross-tower garbage corresponding to no parameter — they must not
        # contribute to the global norm nor perturb the (zero) weights.
        g1 = dw1c_ref[:]
        g2 = db1c_ref[:]
        g3 = dw2c_ref[:] * m_w2c
        g4 = db2c_ref[:]
        g5 = dwhc_ref[:] * m_whc
        g6 = dbhc_ref[:]
        if head == "gaussian":
            # the loss's entropy term -ent_coef*sum(log_std + c) is
            # data-independent; its gradient joins here (the optax path
            # adds it in grads_pytree BEFORE clipping)
            g7 = dls_ref[:] - ent_coef
            sq = (
                jnp.sum(g1 * g1) + jnp.sum(g2 * g2) + jnp.sum(g3 * g3)
                + jnp.sum(g4 * g4) + jnp.sum(g5 * g5) + jnp.sum(g6 * g6)
                + jnp.sum(g7 * g7)
            )
        else:
            # categorical head has no log_std parameter
            g7 = jnp.zeros_like(dls_ref)
            sq = (
                jnp.sum(g1 * g1) + jnp.sum(g2 * g2) + jnp.sum(g3 * g3)
                + jnp.sum(g4 * g4) + jnp.sum(g5 * g5) + jnp.sum(g6 * g6)
            )
        norm = jnp.sqrt(sq)
        scale = jnp.where(
            norm < max_grad_norm, 1.0, max_grad_norm / norm
        )

        def upd(w_ref, m_ref, v_ref, g, nw_ref, nm_ref, nv_ref):
            g = g * scale
            m_new = beta1 * m_ref[:] + (1.0 - beta1) * g
            v_new = beta2 * v_ref[:] + (1.0 - beta2) * (g * g)
            mhat = m_new / bc1
            vhat = v_new / bc2
            nw_ref[:] = w_ref[:] - lr * mhat / (jnp.sqrt(vhat) + adam_eps)
            nm_ref[:] = m_new
            nv_ref[:] = v_new

        upd(w1c_ref, m1_ref, v1_ref, g1, nw1_ref, nm1_ref, nv1_ref)
        upd(b1c_ref, m2_ref, v2_ref, g2, nw2_ref, nm2_ref, nv2_ref)
        upd(w2c_ref, m3_ref, v3_ref, g3, nw3_ref, nm3_ref, nv3_ref)
        upd(b2c_ref, m4_ref, v4_ref, g4, nw4_ref, nm4_ref, nv4_ref)
        upd(whc_ref, m5_ref, v5_ref, g5, nw5_ref, nm5_ref, nv5_ref)
        upd(bhc_ref, m6_ref, v6_ref, g6, nw6_ref, nm6_ref, nv6_ref)
        if head == "gaussian":
            upd(ls_ref, m7_ref, v7_ref, g7, nw7_ref, nm7_ref, nv7_ref)
        else:
            nw7_ref[:] = ls_ref[:]
            nm7_ref[:] = m7_ref[:]
            nv7_ref[:] = v7_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "obs_dim", "act_dim", "tile", "head", "compute", "interpret",
        "beta1", "beta2", "adam_eps", "max_grad_norm",
    ),
)
def fused_minibatch_grad_adam(
    data: jax.Array,        # [C_PAD, N] f32 feature-major packed samples
    tile_order: jax.Array,  # (G,) i32 — tile indices this pass visits
    merged_w: tuple,        # 7 merged weight arrays (merge_weights)
    merged_m: tuple,        # 7 merged Adam first-moment arrays
    merged_v: tuple,        # 7 merged Adam second-moment arrays
    scalars: jax.Array,     # (ADAM_NUM_SCALARS,) f32 — see layout at top
    obs_dim: int,
    act_dim: int,
    tile: int = 2048,
    head: str = "gaussian",
    compute: str = "float32",
    beta1: float = ADAM_B1,
    beta2: float = ADAM_B2,
    adam_eps: float = ADAM_EPS,
    max_grad_norm: float = 0.5,
    interpret: bool = False,
):
    """One launch: minibatch gradient + clip-by-global-norm + Adam.

    Returns (new merged_w, new merged_m, new merged_v, metric sums). The
    caller carries the merged triples across the epochs x minibatches scan
    (agents/ppo_fused.fused_epoch_scan_adam) and un-merges once at the end;
    optax never runs inside the update phase."""
    cpad, n = data.shape
    na = act_dim if head == "gaussian" else 1
    assert cpad % SUBLANES == 0 and n % tile == 0, (cpad, n, tile)
    assert obs_dim + na + 4 <= cpad
    grid = tile_order.shape[0]
    kernel = functools.partial(
        _ppo_grad_adam_kernel, obs_dim=obs_dim, act_dim=act_dim, head=head,
        compute=compute, beta1=beta1, beta2=beta2, adam_eps=adam_eps,
        max_grad_norm=max_grad_norm,
    )

    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fixed = lambda w: pl.BlockSpec(
        w.shape, lambda j, order: tuple(0 for _ in w.shape),
        memory_space=pltpu.VMEM,
    )
    out_shape = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in merged_w]
    out_specs = [fixed(w) for w in merged_w]
    out_shape.append(jax.ShapeDtypeStruct((1, 4), jnp.float32))
    out_specs.append(
        pl.BlockSpec((1, 4), lambda j, order: (0, 0), memory_space=pltpu.SMEM)
    )
    for group in (merged_w, merged_m, merged_v):   # nw / nm / nv
        out_shape.extend(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in group
        )
        out_specs.extend(fixed(w) for w in group)
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
        ] + [whole() for _ in range(21)],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret_param(interpret),
    )(
        tile_order.astype(jnp.int32), scalars.reshape(1, -1), data,
        *merged_w, *merged_m, *merged_v,
    )
    met = outs[7][0]
    new_w = tuple(outs[8:15])
    new_m = tuple(outs[15:22])
    new_v = tuple(outs[22:29])
    return new_w, new_m, new_v, met
