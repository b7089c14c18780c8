"""Pallas TPU fused policy-rollout kernel — PPO data collection in VMEM.

The XLA collect_rollout (agents/ppo.py) is a lax.scan whose every step
round-trips the env state, the policy activations ([B, hidden] x 4) and the
trajectory slice through HBM — measured 8.4 ms of the 22 ms fused-update
iteration at B=16384, T=128 (the update phase itself is 2.6 ms/epoch after
kernels/ppo_update_kernel.py). This kernel runs the ENTIRE rollout for a tile
of envs without leaving VMEM:

  per step: obs scaling -> actor-critic MLP forward -> Gaussian action
  sampling (on-chip PRNG, Box-Muller) -> env dynamics (growth + process
  noise + harvest + reward, ORACLE_SEMANTICS.md order) -> auto-reset ->
  trajectory row writes,

then computes the GAE advantages/returns IN-KERNEL with a reverse pass over
the still-resident trajectory (bootstrapping from the value of the final
post-reset observation, exactly like agents/ppo.compute_gae), and writes out
the update kernel's feature-major packed sample matrix directly:

  rows: 0 obs, 1 action, 2 logp, 3 value, 4 advantage, 5 return, 6-7 pad.

Episode metrics (done count, completed return/length sums, reward sum) are
accumulated into SMEM scalars, so rewards/dones never need HBM at all. HBM
traffic per iteration: one write of the [8, T*B] packed matrix + O(B) state.

Semantics must match the XLA path exactly modulo RNG (same policy math, same
decode/dynamics, same GAE): proven by a z=0 deterministic parity test in
tests/test_policy_rollout_kernel.py (the Mosaic interpreter's PRNG yields
zero bits on CPU, making the kernel deterministic there by construction).
All three decode schemes; obs_noise=True adds the engine's lognormal
measurement noise (sigma_m) to the policy input, matching
batch/batch.py batched_step(autoreset=True). growth="mixture" selects the
effective model by scalar slot 21 (model_idx), exactly like the XLA train
path (dynamics/growth.mixture with the scalar env_params the train loop
closes over); per-INSTANCE model arrays remain the batch/randomized.py
engine path's domain.

Reference: the reference collects rollouts through external sb3 + eager
NumPy stepping (SURVEY.md §3.5; reconstructed); nothing here is a port.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_fishing_tpu.core.types import (
    GROWTH_MODELS,
    NOISE_FORMS,
    RELATIVE_MULTIPLIERS,
)
from gym_fishing_tpu.kernels.rollout_kernel import (
    NUM_SCALARS,
    _growth,
    _interpret_param,
    _random_bits,
    _uniform_from_bits,
)

TWO_PI = 6.283185307179586
LOG_2PI = 1.8378770664093453
PACKED_ROWS = 8

# scalar layout: rollout_kernel's (make_scalars) with slot 3 = action_scale
# (the continuous decode constant) instead of a policy parameter.


class PolicyRollout(NamedTuple):
    """Fused rollout results."""

    packed_t: jax.Array   # [8, T*B] f32 — the update kernel's sample matrix
    stock: jax.Array      # (B,) f32 post-rollout (post-reset) stock
    t: jax.Array          # (B,) i32 post-rollout years-passed
    harvest: jax.Array    # (B,) f32 post-rollout carried harvest
    ep_ret: jax.Array     # (B,) f32 running return of the in-flight episode
    ep_len: jax.Array     # (B,) i32 running length of the in-flight episode
    stats: jax.Array      # (4,) f32: n_done, sum ep_ret@done, sum ep_len@done,
                          #           sum reward


def _policy_rollout_kernel(
    scal_ref,                    # SMEM (1, NUM_SCALARS) f32
    x_ref, t_ref, hv_ref, ret_ref, len_ref,  # VMEM (1, C, E): f32,i32,f32,f32,i32
    # merged actor-critic (see _merge_towers): both towers ride ONE
    # block-diagonal matmul chain — [2H,1] rank-1 in, [2H,2H] hidden,
    # [2H,A+1] heads. Halves the sequential-MXU-op count per step, which is
    # what this kernel is latency-bound on (measured: the 13-ref split-tower
    # version ran the 4x8 PPO default at 48M steps/s vs 95.5M for the XLA
    # rollout; see BENCH_NOTES).
    w1c_ref, b1c_ref, w2c_ref, b2c_ref, whc_ref, bhc_ref, ls_ref,
    # outputs
    packed_ref,                  # VMEM (8, T, C*E) f32
    x_out, t_out, hv_out, ret_out, len_out,   # VMEM (1, C, E)
    met_ref,                     # SMEM (1, 4) f32
    # scratch: rew, done, then (pregen_noise only) the pre-generated noise
    # planes — [za, zp] (+ [nf] when obs_noise)
    rew_scr, done_scr,           # VMEM (T, C*E) f32
    *noise_scr,
    num_steps: int,
    growth: str,
    noise_form: str,
    gamma: float,
    gae_lambda: float,
    scheme: str,
    n_actions: int,
    obs_noise: bool,
    hlo: bool = False,
    compute: str = "float32",
    cols: int = 1,
    pregen_noise: bool = False,
    fold_obs: bool = False,
    vector_gae: bool = False,
):
    s = [scal_ref[0, i] for i in range(NUM_SCALARS)]
    K = s[1]
    sigma = s[2]
    action_scale = s[3]
    price = s[4]
    Tmax = s[5].astype(jnp.int32)
    x_init = s[6]
    seed = s[7].astype(jnp.int32)
    pen = s[15]
    r_drift = s[16]
    cost = s[17]
    init_harvest = s[20]
    sigma_m = s[19]       # lognormal measurement noise (obs_noise=True)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        met_ref[0, 0] = 0.0
        met_ref[0, 1] = 0.0
        met_ref[0, 2] = 0.0
        met_ref[0, 3] = 0.0

    if not hlo:
        pltpu.prng_seed(seed + i)
    f32 = jnp.float32
    # State refs are (1, 1, E): the leading unit sublane dim makes the
    # (1, 1, E) block legal on the (grid, 1, E) array (Mosaic requires the
    # last two block dims divisible by (8, 128) or EQUAL to the array dims —
    # a (1, E) block on a (grid, E) array violates this; see VERDICT r2 #1).
    E = x_ref.shape[2]
    shape = (1, E)
    A = whc_ref.shape[1] - 1     # 1 (Gaussian) or n_actions (categorical)

    log_std = ls_ref[0, 0]
    std = jnp.exp(log_std)
    if scheme != "continuous":
        # strictly-lower+diag triangular ones for the in-kernel CDF matmul
        tri_rows = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
        tri_cols = jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
        tri = (tri_rows >= tri_cols).astype(f32)
        # Mosaic's tpu.iota is integer-only; cast after
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (A, E), 0).astype(f32)

    # Mixed precision (compute="bfloat16", opt-in via PPOConfig.compute_
    # dtype): the two [2H]-contraction matmuls take bf16 INPUTS with f32
    # MXU accumulation. Round-4 ablation verdict (BENCH_NOTES "Round 4b",
    # DESIGN.md §2): the rollout body is LATENCY-bound on its ~15-20
    # dependent ops/step, so bf16 is NEUTRAL here (the roofline arithmetic
    # that suggested otherwise was a coincidence); the measured bf16 win is
    # in the UPDATE phase (kernels/ppo_update_kernel.py). Kept available so
    # compute_dtype selects one precision for both phases. Weights are cast
    # once; heads/elementwise/sampling stay f32.
    mt = jnp.bfloat16 if compute == "bfloat16" else f32
    w2c_c = w2c_ref[:].astype(mt)
    whc_c = whc_ref[:].astype(mt)

    inv_K = 1.0 / K
    if fold_obs:
        # Chain-shortening ablation (b), VERDICT r4 #3: the obs affine map
        # obs = clip(meas/K - 1, -1, 1) == clip(meas, 0, 2K)/K - 1, so the
        # /K - 1 part folds into the input layer (w1s = w1/K, b1s = b1 - w1)
        # and the dependent chain carries the CLIPPED RAW measurement m
        # instead of obs — 2 fewer dependent ops/step. The packed obs row is
        # reconstructed off-chain as m/K - 1 (identical in exact arithmetic;
        # f32 rounding differs by ~1 ulp, see test_policy_rollout_kernel).
        w1s = w1c_ref[:] * inv_K
        b1s = b1c_ref[:] - w1c_ref[:]

    if pregen_noise:
        # Chain-shortening ablation (a), VERDICT r4 #3: every random draw in
        # this kernel is STATE-INDEPENDENT, so the whole noise block can be
        # generated in one fully-vectorized pre-pass over [T, C*E] planes —
        # no dependent chain — and the stepping loop replaces its per-step
        # PRNG + Box-Muller (log/sqrt/sin/cos, ~8 serialized VPU ops: Mosaic
        # does not overlap independent chains, round-4 interleaving
        # ablation) with VMEM loads. Costs (2 + obs_noise) * T*C*E*4 bytes
        # of scratch (1 MiB at T=128, E=1024, continuous).
        za_scr, zp_scr = noise_scr[0], noise_scr[1]
        full = (num_steps, cols * E)
        u1f = _uniform_from_bits(_random_bits(full, hlo), hlo)
        u2f = _uniform_from_bits(_random_bits(full, hlo), hlo)
        radf = jnp.sqrt(-2.0 * jnp.log(u1f))
        thf = TWO_PI * u2f
        if scheme == "continuous":
            za_scr[:, :] = radf * jnp.cos(thf)      # action normals
        else:
            # categorical: action draw is a plain uniform (inverse-CDF)
            za_scr[:, :] = _uniform_from_bits(_random_bits(full, hlo), hlo)
        zp_scr[:, :] = radf * jnp.sin(thf)          # process normals
        if obs_noise:
            nf_scr = noise_scr[2]
            e1 = _uniform_from_bits(_random_bits(full, hlo), hlo)
            e2 = _uniform_from_bits(_random_bits(full, hlo), hlo)
            eta = jnp.sqrt(-2.0 * jnp.log(e1)) * jnp.cos(TWO_PI * e2)
            # pre-apply exp: the loop needs only meas = xn * nf
            nf_scr[:, :] = jnp.exp(sigma_m * eta)

    def forward(inp):
        """Merged actor-critic forward: (pi_out [A, E], value [1, E]).

        Same math as the XLA ActorCritic apply at f32 — the block-diagonal
        merge is exact (off-diagonal blocks are zero), proven by the z=0
        parity suite. The d1 layer is rank-1 (obs_dim == 1), a VPU broadcast
        multiply; only d2 and the heads touch the MXU. ``inp`` is the obs
        (fold_obs=False) or the clipped raw measurement m (fold_obs=True,
        absorbed into w1s/b1s above).
        """
        if fold_obs:
            p1 = w1s * inp + b1s                         # [2H, E]
        else:
            p1 = w1c_ref[:] * inp + b1c_ref[:]           # [2H, E]
        h1 = jnp.tanh(p1)
        p2 = jax.lax.dot_general(
            w2c_c, h1.astype(mt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b2c_ref[:]
        h2 = jnp.tanh(p2)
        out = jax.lax.dot_general(
            whc_c, h2.astype(mt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + bhc_ref[:]                                   # [A+1, E]
        return out[:A], out[A:A + 1]

    def draw_pair():
        u1 = _uniform_from_bits(_random_bits(shape, hlo), hlo)
        u2 = _uniform_from_bits(_random_bits(shape, hlo), hlo)
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = TWO_PI * u2
        return rad * jnp.cos(theta), rad * jnp.sin(theta)

    def store(row, t, c, val):
        packed_ref[row, pl.ds(t, 1), c * E:(c + 1) * E] = val

    def col_step(t, c, carry):
        # obs rides the carry: it is the (possibly noise-measured) observation
        # of x produced by the previous step — core/env.step_xi step 8 — so
        # the policy sees sigma_m measurement noise exactly like the engine's
        # batched_step(autoreset=True) path.
        x, tt, cur_ret, cur_len, h_carry, inp, nd, sr, sl, srw = carry
        pi_out, value = forward(inp)
        # the packed obs row always carries the true observation; under
        # fold_obs it is reconstructed from m off the dependent chain
        obs = inp * inv_K - 1.0 if fold_obs else inp
        lo = c * E

        if scheme == "continuous":
            if pregen_noise:
                z_act = za_scr[pl.ds(t, 1), lo:lo + E]
                z_proc = zp_scr[pl.ds(t, 1), lo:lo + E]
            else:
                z_act, z_proc = draw_pair()
            a = pi_out + std * z_act
            logp = -0.5 * (z_act * z_act) - log_std - 0.5 * LOG_2PI
            # continuous decode (spaces/scaling.py)
            quota = (jnp.clip(a, -1.0, 1.0) + 1.0) * K * action_scale
        else:
            # categorical head: inverse-CDF sampling with one uniform draw.
            # The CDF is the lower-triangular ones-matmul of the softmax
            # (cumsum-as-matmul — MXU-friendly, no lax.cumsum in Mosaic);
            # a = #{cdf_k < u} reproduces jax.random.categorical's
            # distribution (Gumbel-max) exactly in law.
            if pregen_noise:
                u_act = za_scr[pl.ds(t, 1), lo:lo + E]
                z_proc = zp_scr[pl.ds(t, 1), lo:lo + E]
            else:
                u_act = _uniform_from_bits(_random_bits(shape, hlo), hlo)
                _, z_proc = draw_pair()
            mx = jnp.max(pi_out, axis=0, keepdims=True)
            zl = pi_out - mx
            se = jnp.sum(jnp.exp(zl), axis=0, keepdims=True)
            probs = jnp.exp(zl) / se                     # [A, E]
            logp_all = zl - jnp.log(se)
            cdf = jax.lax.dot_general(
                tri, probs, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )                                            # [A, E]
            a = jnp.minimum(
                jnp.sum((cdf < u_act).astype(f32), axis=0, keepdims=True),
                jnp.float32(A - 1),
            )                                            # [1, E] class index
            onehot = (row_iota == a).astype(f32)
            logp = jnp.sum(onehot * logp_all, axis=0, keepdims=True)
            if scheme == "proportional":
                quota = a / jnp.float32(n_actions) * K
            else:
                # relative: carried-harvest multiplier decode, built from
                # scalar constants (Pallas kernels can't capture array
                # consts) — selects RELATIVE_MULTIPLIERS[a] branchlessly
                mult = jnp.zeros_like(a)
                for k, mk in enumerate(RELATIVE_MULTIPLIERS):
                    mult = mult + jnp.float32(mk) * (
                        a == jnp.float32(k)
                    ).astype(f32)
                quota = h_carry * mult

        hv = jnp.minimum(x, quota)
        x1 = x - hv
        r_eff = s[0] + r_drift * tt.astype(f32)
        mu = _growth(growth, s, x1, r_eff)
        if noise_form == "additive":
            x2 = mu + sigma * x1 * z_proc
        else:  # lognormal
            x2 = mu * jnp.exp(sigma * z_proc)
        xn = jnp.maximum(x2, 0.0)
        collapsed = xn <= 0.0
        rew = price * hv - cost * quota * quota
        rew = rew - jnp.where(collapsed, pen, 0.0)
        tn = tt + 1
        done = (tn >= Tmax) | collapsed
        done_f = done.astype(f32)
        ep_ret_now = cur_ret + rew
        ep_len_now = cur_len + 1

        store(0, t, c, obs)
        store(1, t, c, a)
        store(2, t, c, logp)
        store(3, t, c, value)
        rew_scr[pl.ds(t, 1), c * E:(c + 1) * E] = rew
        done_scr[pl.ds(t, 1), c * E:(c + 1) * E] = done_f

        nd = nd + jnp.sum(done_f)
        sr = sr + jnp.sum(ep_ret_now * done_f)
        sl = sl + jnp.sum(ep_len_now.astype(f32) * done_f)
        srw = srw + jnp.sum(rew)

        # auto-reset (batch/batch.py batched_step semantics); the carried
        # harvest is the decoded (pre-min) quota for the relative scheme and
        # the realized harvest otherwise (core/env.step_xi)
        xn = jnp.where(done, x_init, xn)
        tn = jnp.where(done, 0, tn)
        new_h = quota if scheme == "relative" else hv
        hv_carry = jnp.where(done, init_harvest, new_h)
        cur_ret = jnp.where(done, 0.0, ep_ret_now)
        cur_len = jnp.where(done, 0, ep_len_now)
        # next policy input: lognormal-measured for live envs, noise-free for
        # just-reset ones (get_obs of the reset state — batched_step)
        if obs_noise:
            if pregen_noise:
                meas = jnp.where(done, xn, xn * nf_scr[pl.ds(t, 1), lo:lo + E])
            else:
                eta, _ = draw_pair()
                meas = jnp.where(done, xn, xn * jnp.exp(sigma_m * eta))
        else:
            meas = xn
        if fold_obs:
            inp_next = jnp.clip(meas, 0.0, 2.0 * K)
        else:
            inp_next = jnp.clip(meas / K - 1.0, -1.0, 1.0)
        return xn, tn, cur_ret, cur_len, hv_carry, inp_next, nd, sr, sl, srw

    def body(t, carries):
        # cols > 1 interleaves INDEPENDENT env columns inside one program:
        # each column's step t+1 depends on its own step t, but columns are
        # independent, so their matmul/VPU chains overlap in the hardware
        # pipeline — the ILP lever for a latency-bound body (the round-4
        # ablations showed bf16 matmuls AND cheap-tanh both neutral at
        # E=1024: the body is dependent-op-latency-bound, not
        # throughput-bound; BENCH_NOTES "Round 4").
        return tuple(col_step(t, c, carries[c]) for c in range(cols))

    zero_f = jnp.zeros(shape, f32)
    # initial obs is noise-free (collect_rollout's obs0 = get_obs — the one
    # observation per train_step iteration that can't carry noise, since obs
    # is not part of BatchState)
    init = tuple(
        (
            x_ref[0, c:c + 1, :], t_ref[0, c:c + 1, :],
            ret_ref[0, c:c + 1, :], len_ref[0, c:c + 1, :],
            hv_ref[0, c:c + 1, :],
            jnp.clip(x_ref[0, c:c + 1, :], 0.0, 2.0 * K) if fold_obs
            else jnp.clip(x_ref[0, c:c + 1, :] / K - 1.0, -1.0, 1.0),
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0),
        )
        for c in range(cols)
    )
    finals = jax.lax.fori_loop(0, num_steps, body, init)

    # GAE reverse pass over the VMEM-resident trajectory, bootstrapped from
    # the value of the final (post-reset, noise-measured) observation —
    # agents/ppo.compute_gae on collect_rollout's obs_last
    value_Ts = [forward(fin[5])[1] for fin in finals]

    if vector_gae:
        # Log-depth GAE (round 5): the recurrence
        #   gae_t = delta_t + (gamma*lam*nonterm_t) * gae_{t+1}
        # is a composition of affine maps f_t(x) = b_t + a_t x, which is
        # associative — so the suffix composition F_t = f_t∘…∘f_{T-1}
        # (whose value at 0 IS gae_t) computes in ceil(log2 T) doubling
        # rounds of fully-vectorized [T, E] multiply-adds instead of T
        # sequential [1, E] steps. Same latency-bound argument as the
        # stepping-loop chain-shortening: the sequential pass costs per-op
        # LATENCY × T, the doubled pass costs per-op latency × log2(T) on
        # tiles T× as tall. f32 rounding differs from the sequential order
        # by the usual reassociation ~1 ulp (parity tolerances cover it).
        for c in range(cols):
            lo, hi = c * E, (c + 1) * E
            rew = rew_scr[:, lo:hi]                       # [T, E]
            nonterm = 1.0 - done_scr[:, lo:hi]
            val = packed_ref[3, :, lo:hi]
            nxt = jnp.concatenate(
                [val[1:], value_Ts[c]], axis=0            # value_{t+1}
            )
            b = rew + gamma * nxt * nonterm - val         # delta_t
            a = gamma * gae_lambda * nonterm
            k = 1
            while k < num_steps:
                a_s = jnp.concatenate(
                    [a[k:], jnp.ones((k, E), f32)], axis=0
                )
                b_s = jnp.concatenate(
                    [b[k:], jnp.zeros((k, E), f32)], axis=0
                )
                b = b + a * b_s
                a = a * a_s
                k *= 2
            packed_ref[4, :, lo:hi] = b
            packed_ref[5, :, lo:hi] = b + val
    else:
        def rev_body(k, carry):
            t = num_steps - 1 - k
            out = []
            for c in range(cols):
                gae, next_value = carry[c]
                lo, hi = c * E, (c + 1) * E
                rew = rew_scr[pl.ds(t, 1), lo:hi]
                nonterm = 1.0 - done_scr[pl.ds(t, 1), lo:hi]
                value_t = packed_ref[3, pl.ds(t, 1), lo:hi]
                delta = rew + gamma * next_value * nonterm - value_t
                gae = delta + gamma * gae_lambda * nonterm * gae
                store(4, t, c, gae)
                store(5, t, c, gae + value_t)
                out.append((gae, value_t))
            return tuple(out)

        jax.lax.fori_loop(
            0, num_steps, rev_body,
            tuple((zero_f, v) for v in value_Ts),
        )

    packed_ref[6, :, :] = jnp.zeros((num_steps, cols * E), f32)
    packed_ref[7, :, :] = jnp.zeros((num_steps, cols * E), f32)

    nd_t = sr_t = sl_t = srw_t = jnp.float32(0.0)
    for c, fin in enumerate(finals):
        x, tt, cur_ret, cur_len, hv_last, _obs, nd, sr, sl, srw = fin
        x_out[0, c:c + 1, :] = x
        t_out[0, c:c + 1, :] = tt
        hv_out[0, c:c + 1, :] = hv_last
        ret_out[0, c:c + 1, :] = cur_ret
        len_out[0, c:c + 1, :] = cur_len
        nd_t += nd
        sr_t += sr
        sl_t += sl
        srw_t += srw
    met_ref[0, 0] += nd_t
    met_ref[0, 1] += sr_t
    met_ref[0, 2] += sl_t
    met_ref[0, 3] += srw_t


def _merge_towers(weights: tuple) -> tuple:
    """13-array kernel weight tuple -> 7 merged arrays for ONE matmul chain.

    The kernel is latency-bound on its sequential per-step matmuls (each
    step's input depends on the previous step's output, and TPU grid
    programs are sequential too), so both MLP towers are merged into one
    block-diagonal chain: w1c [2H, 1] (rank-1 input layer), w2c [2H, 2H]
    (pi_d2 top-left, v_d2 bottom-right, zeros off-diagonal — exact, no
    cross-talk), whc [2H, A+1] (columns 0..A-1 = pi head over rows 0..H-1,
    column A = value head over rows H..2H-1). At hidden=64 the merged
    [128, 128] @ [128, E] matmuls are exactly MXU-shaped. Runs under jit in
    the wrapper (tiny arrays, one-time per call).
    """
    (w1p, b1p, w2p, b2p, wm, bm, ls, w1v, b1v, w2v, b2v, wv, bv) = weights
    H = w2p.shape[0]
    A = wm.shape[1]
    f32 = jnp.float32
    w1c = jnp.concatenate(
        [w1p.reshape(-1, 1), w1v.reshape(-1, 1)], axis=0
    ).astype(f32)                                          # [2H, 1]
    b1c = jnp.concatenate([b1p, b1v], axis=0).astype(f32)  # [2H, 1]
    w2c = jnp.zeros((2 * H, 2 * H), f32)
    w2c = w2c.at[:H, :H].set(w2p).at[H:, H:].set(w2v)
    b2c = jnp.concatenate([b2p, b2v], axis=0).astype(f32)  # [2H, 1]
    whc = jnp.zeros((2 * H, A + 1), f32)
    whc = whc.at[:H, :A].set(wm).at[H:, A:].set(wv)
    bhc = jnp.concatenate([bm, bv], axis=0).astype(f32)    # [A+1, 1]
    return (w1c, b1c, w2c, b2c, whc, bhc, ls)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_steps", "envs_per_block", "growth", "noise_form", "gamma",
        "gae_lambda", "scheme", "n_actions", "obs_noise", "interpret",
        "compute", "blocks_per_program", "pregen_noise", "fold_obs",
        "vector_gae",
    ),
)
def pallas_policy_rollout(
    stock: jax.Array,    # (B,) f32
    t: jax.Array,        # (B,) i32
    harvest: jax.Array,  # (B,) f32 carried harvest (relative-scheme state)
    ep_ret: jax.Array,   # (B,) f32
    ep_len: jax.Array,   # (B,) i32
    weights: tuple,      # 13 kernel-layout arrays (ppo_fused.kernel_weights)
    scalars: jax.Array,  # (NUM_SCALARS,) f32, slot 3 = action_scale,
                         # slot 20 = init_harvest
    num_steps: int,
    envs_per_block: int = 1024,
    growth: str = "logistic",
    noise_form: str = "additive",
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    scheme: str = "continuous",
    n_actions: int = 3,
    obs_noise: bool = False,
    interpret: bool = False,
    compute: str = "float32",
    blocks_per_program: int = 1,
    pregen_noise: bool = False,
    fold_obs: bool = False,
    vector_gae: bool = False,
) -> PolicyRollout:
    """Fused T-step PPO rollout + GAE; see PolicyRollout for outputs.

    B must be a multiple of envs_per_block. The packed_t output is time-major
    ([8, T*B], sample n = t*B + env), exactly the layout
    kernels/ppo_update_kernel.py consumes. scheme selects the action head:
    "continuous" is the Gaussian head; "proportional"/"relative" are the
    discrete decode schemes with a categorical head of width n_actions
    (weights' Wm/bm must be that wide — ppo_fused.kernel_weights(params,
    "categorical")); the packed action row then carries the class index.
    obs_noise=True applies the engine's lognormal measurement noise
    (scalars slot 19 = sigma_m) to every live env's policy input.
    """
    assert growth in GROWTH_MODELS + ("mixture",) and noise_form in NOISE_FORMS
    assert scheme in ("continuous", "proportional", "relative")
    B = stock.shape[0]
    E = envs_per_block
    C = blocks_per_program
    assert B % (C * E) == 0, (
        f"num_envs {B} must be a multiple of blocks_per_program*envs_per_"
        f"block = {C * E}"
    )
    grid = B // (C * E)
    merged = _merge_towers(weights)

    kernel = functools.partial(
        _policy_rollout_kernel,
        num_steps=num_steps,
        growth=growth,
        noise_form=noise_form,
        gamma=gamma,
        gae_lambda=gae_lambda,
        scheme=scheme,
        n_actions=n_actions,
        obs_noise=obs_noise,
        hlo=interpret == "hlo",
        compute=compute,
        cols=C,
        pregen_noise=pregen_noise,
        fold_obs=fold_obs,
        vector_gae=vector_gae,
    )
    state_blk = lambda: pl.BlockSpec(
        (1, C, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    f32v = lambda: jax.ShapeDtypeStruct((grid, C, E), jnp.float32)
    i32v = lambda: jax.ShapeDtypeStruct((grid, C, E), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [state_blk() for _ in range(5)]
        + [whole() for _ in merged],
        out_specs=[
            pl.BlockSpec(
                (PACKED_ROWS, num_steps, C * E),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            state_blk(), state_blk(), state_blk(), state_blk(), state_blk(),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PACKED_ROWS, num_steps, B), jnp.float32),
            f32v(), i32v(), f32v(), f32v(), i32v(),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_steps, C * E), jnp.float32),
            pltpu.VMEM((num_steps, C * E), jnp.float32),
        ] + (
            # pre-generated noise planes: [za, zp] (+ [nf] when obs_noise)
            [
                pltpu.VMEM((num_steps, C * E), jnp.float32)
                for _ in range(3 if obs_noise else 2)
            ]
            if pregen_noise else []
        ),
        interpret=_interpret_param(interpret),
    )(
        scalars.reshape(1, NUM_SCALARS),
        stock.reshape(grid, C, E),
        t.reshape(grid, C, E),
        harvest.reshape(grid, C, E),
        ep_ret.reshape(grid, C, E),
        ep_len.reshape(grid, C, E),
        *merged,
    )
    packed, x, tt, hv, ret, ln, met = outs
    return PolicyRollout(
        packed_t=packed.reshape(PACKED_ROWS, num_steps * B),
        stock=x.reshape(B),
        t=tt.reshape(B),
        harvest=hv.reshape(B),
        ep_ret=ret.reshape(B),
        ep_len=ln.reshape(B),
        stats=met[0],
    )
