"""PPO learner co-located with the batched env engine — one jitted program.

The reference trains via external stable-baselines3, crossing the
Python<->torch<->NumPy boundary every step (reference: README usage +
SURVEY.md §3.5; reconstructed). Here the whole iteration — rollout
(policy forward + env step + trajectory buffers), GAE, and the clipped PPO
update over minibatch epochs — is a single jitted function. On a mesh, env
instances shard over the "envs" axis while parameters stay replicated; the
gradient all-reduce is the only cross-device communication, inserted by XLA
over ICI (BASELINE.json north star: no host round-trips in the rollout loop).

MXU notes: the actor-critic MLP is deliberately batched [num_envs, obs] x
[obs, hidden] so the matmuls tile onto the MXU; hidden sizes default to
multiples of 128-friendly shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from gym_fishing_tpu.batch import BatchState, batched_reset, batched_step
from gym_fishing_tpu.core.env import Env
from gym_fishing_tpu.core.types import EnvParams


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 1024
    num_steps: int = 128          # rollout length per iteration
    epochs: int = 4
    num_minibatches: int = 8
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    hidden: int = 64
    anneal_lr: bool = False
    total_iterations: int = 64    # used only for lr annealing
    # 'bfloat16' runs the MLP matmuls in bf16 (f32 params, f32 heads/loss) —
    # 2x MXU rate + half the activation HBM traffic on TPU.
    compute_dtype: str = "float32"
    # fused_update=True runs each minibatch gradient through the Pallas
    # fused-update kernel (kernels/ppo_update_kernel.py): activations stay in
    # VMEM, HBM traffic per epoch drops to one read of the packed buffer.
    # Supports both action heads (Gaussian for the continuous scheme,
    # categorical for the discrete decode schemes); float32 compute.
    fused_update: bool = False
    # fused_rollout=True additionally replaces collect_rollout + GAE +
    # packing with the Pallas policy-rollout kernel
    # (kernels/policy_rollout_kernel.py): policy forward, action sampling
    # (Gaussian or categorical by scheme), env dynamics, auto-reset and the
    # GAE reverse pass all run in VMEM and emit the packed sample matrix
    # directly. Requires fused_update and scalar obs (no ObsStack).
    # Observation noise (sigma_m > 0) is supported as long as sigma_m is a
    # static float in the params (a traced sigma_m raises loudly in
    # agents/ppo_fused.py). RNG is the kernel's on-chip PRNG, so
    # trajectories match the XLA path statistically, not bitwise.
    fused_rollout: bool = False
    # Fused-rollout chain-shortening (VERDICT r4 #3 ablations, DEFAULT ON
    # since round 5): rollout_pregen_noise pre-generates ALL per-step random
    # draws in one vectorized kernel pre-pass (noise is state-independent),
    # replacing the per-step PRNG+Box-Muller in the latency-bound dependent
    # loop with VMEM loads; rollout_fold_obs folds the obs affine map
    # (x/K - 1) into the policy input layer. Measured together: -0.96
    # ms/iter (-5.4%) at the 4x8 default, paired interleaved windows;
    # semantics preserved (law-identical RNG, ~1-ulp f32 for fold_obs; z=0
    # parity on all schemes; per-checkpoint fused-vs-XLA agreement gate
    # PASS on chip with both on, max_gap 0.0114). BENCH_NOTES "Round 5c".
    rollout_pregen_noise: bool = True
    rollout_fold_obs: bool = True
    # rollout_vector_gae replaces the kernel's T-step sequential GAE reverse
    # pass with a log-depth doubling scan over the [T, E] VMEM planes (the
    # recurrence is an associative composition of affine maps) — ceil(log2 T)
    # vectorized rounds instead of T latency-bound steps. Same math modulo
    # f32 reassociation (~1 ulp); z=0 parity tested. Default per the
    # round-5 measurement (BENCH_NOTES "Round 5e").
    rollout_vector_gae: bool = False
    # fused_adam=True (requires fused_update; single-device)
    # moves clip-by-global-norm + Adam INSIDE the update kernel: each
    # minibatch is one pallas launch computing gradient + optimizer step on
    # the VMEM-resident merged buffers, and optax state is read/written once
    # per train step instead of per minibatch. Bit-compatible with the optax
    # chain to f32 tolerance (tests/test_update_kernel.py). The sharded
    # shard_map path ignores this flag (it must pmean gradients before the
    # update, so it keeps optax).
    fused_adam: bool = False
    # 'exact': fresh jax.random.permutation per epoch (a full sort — measured
    # ~10 ms at N=2^21 on v5e). 'affine': index bijection i -> (a*i+b) mod N
    # with random odd a (N a power of two), computed on the fly — an
    # O(1)-state shuffle whose minibatches are strided samples across the
    # (time, env) buffer; envs are iid so the mixing loss is negligible.
    shuffle: str = "exact"


class ActorCritic(nn.Module):
    """Shared-nothing actor + critic MLPs (sb3 MlpPolicy shape)."""

    action_dim: int
    continuous: bool
    hidden: int = 64
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        cdt = self.compute_dtype

        def mlp(x, name):
            x = nn.Dense(self.hidden, name=f"{name}_d1", dtype=cdt,
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)))(x)
            x = nn.tanh(x)
            x = nn.Dense(self.hidden, name=f"{name}_d2", dtype=cdt,
                         kernel_init=nn.initializers.orthogonal(np.sqrt(2)))(x)
            return nn.tanh(x)

        pi = mlp(obs, "pi")
        v = mlp(obs, "v")
        # heads stay f32: action means / values / logits feed log-probs and
        # the loss, where bf16 resolution would bite
        value = nn.Dense(1, name="v_out", dtype=jnp.float32,
                         kernel_init=nn.initializers.orthogonal(1.0))(
            v.astype(jnp.float32))[..., 0]
        if self.continuous:
            mean = nn.Dense(self.action_dim, name="pi_mean", dtype=jnp.float32,
                            kernel_init=nn.initializers.orthogonal(0.01))(
                pi.astype(jnp.float32))
            log_std = self.param(
                "log_std", nn.initializers.zeros, (self.action_dim,), jnp.float32
            )
            return (mean, log_std), value
        logits = nn.Dense(self.action_dim, name="pi_logits", dtype=jnp.float32,
                          kernel_init=nn.initializers.orthogonal(0.01))(
            pi.astype(jnp.float32))
        return (logits,), value


# ----------------------------------------------------------------- dists
def sample_action(dist, key, continuous: bool):
    if continuous:
        mean, log_std = dist
        noise = jax.random.normal(key, mean.shape, mean.dtype)
        action = mean + jnp.exp(log_std) * noise
        logp = _normal_logp(action, mean, log_std)
        return action, logp
    (logits,) = dist
    action = jax.random.categorical(key, logits)
    logp = jax.nn.log_softmax(logits)[
        jnp.arange(logits.shape[0]), action
    ]
    return action, logp


def action_logp_entropy(dist, action, continuous: bool):
    if continuous:
        mean, log_std = dist
        logp = _normal_logp(action, mean, log_std)
        ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)
        ent = jnp.broadcast_to(ent, logp.shape)
        return logp, ent
    (logits,) = dist
    logps = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logps, action[..., None], axis=-1)[..., 0]
    probs = jax.nn.softmax(logits)
    ent = -jnp.sum(probs * logps, axis=-1)
    return logp, ent


def _normal_logp(x, mean, log_std):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((x - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)), axis=-1
    )


# ----------------------------------------------------------------- setup
def make_train_state(
    env: Env, cfg: PPOConfig, key: jax.Array, params: Optional[EnvParams] = None
) -> TrainState:
    continuous = env.config.scheme == "continuous"
    action_dim = 1 if continuous else env.config.n_actions
    net = ActorCritic(
        action_dim=action_dim,
        continuous=continuous,
        hidden=cfg.hidden,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
    )
    obs_dim = env.observation_space.shape[0]
    obs0 = jnp.zeros((1, obs_dim), jnp.float32)
    net_params = net.init(key, obs0)
    if cfg.anneal_lr:
        total_updates = cfg.total_iterations * cfg.epochs * cfg.num_minibatches
        schedule = optax.linear_schedule(cfg.lr, 0.0, total_updates)
    else:
        schedule = cfg.lr
    from gym_fishing_tpu.kernels.ppo_update_kernel import (
        ADAM_B1, ADAM_B2, ADAM_EPS,
    )

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(schedule, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS),
    )
    return TrainState.create(apply_fn=net.apply, params=net_params, tx=tx)


# ------------------------------------------------------------- rollout
@dataclasses.dataclass(frozen=True)
class Transition:
    obs: Any
    action: Any
    logp: Any
    value: Any
    reward: Any
    done: Any
    episode_return: Any
    episode_length: Any


jax.tree_util.register_dataclass(Transition)


def collect_rollout(
    env: Env,
    env_params: EnvParams,
    cfg: PPOConfig,
    ts: TrainState,
    bstate: BatchState,
    key: jax.Array,
):
    """lax.scan rollout of cfg.num_steps with the current policy."""
    continuous = env.config.scheme == "continuous"

    def body(carry, step_key):
        bstate, obs = carry
        k_act, k_env = jax.random.split(step_key)
        dist, value = ts.apply_fn(ts.params, obs)
        action, logp = sample_action(dist, k_act, continuous)
        env_action = action if continuous else action.astype(jnp.int32)
        bstate2, rs = batched_step(env, env_params, bstate, env_action, k_env)
        # Cast env outputs to the learner dtype (env may run f64 in tests).
        tr = Transition(
            obs=obs,
            action=action,
            logp=logp,
            value=value,
            reward=rs.reward.astype(jnp.float32),
            done=rs.done,
            episode_return=rs.episode_return.astype(jnp.float32),
            episode_length=rs.episode_length,
        )
        return (bstate2, rs.obs.astype(jnp.float32)), tr

    obs0 = jax.vmap(env.get_obs, in_axes=(None, 0))(env_params, bstate.env)
    obs0 = obs0.astype(jnp.float32)
    keys = jax.random.split(key, cfg.num_steps)
    (bstate, obs_last), traj = jax.lax.scan(body, (bstate, obs0), keys)
    _, last_value = ts.apply_fn(ts.params, obs_last)
    return bstate, obs_last, traj, last_value


def compute_gae(cfg: PPOConfig, traj: Transition, last_value):
    """Reverse-scan GAE over the time axis."""

    def body(carry, tr):
        gae, next_value = carry
        nonterminal = 1.0 - tr.done.astype(jnp.float32)
        delta = tr.reward + cfg.gamma * next_value * nonterminal - tr.value
        gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
        return (gae, tr.value), gae

    (_, _), advantages = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
    )
    returns = advantages + traj.value
    return advantages, returns


# --------------------------------------------------------------- update
def ppo_loss(net_apply, params, cfg: PPOConfig, batch, continuous: bool):
    obs, action, old_logp, old_value, adv, ret = batch
    dist, value = net_apply(params, obs)
    logp, entropy = action_logp_entropy(dist, action, continuous)
    ratio = jnp.exp(logp - old_logp)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * adv_n
    pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
    pg_loss = -jnp.minimum(pg1, pg2).mean()
    v_clipped = old_value + jnp.clip(value - old_value, -cfg.clip_eps, cfg.clip_eps)
    v_loss = 0.5 * jnp.maximum(
        (value - ret) ** 2, (v_clipped - ret) ** 2
    ).mean()
    ent = entropy.mean()
    total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
    approx_kl = ((ratio - 1) - jnp.log(ratio)).mean()
    return total, {
        "loss": total,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "approx_kl": approx_kl,
    }


def train_step(
    env: Env,
    env_params: EnvParams,
    cfg: PPOConfig,
    ts: TrainState,
    bstate: BatchState,
    key: jax.Array,
):
    """One full PPO iteration (rollout + GAE + epochs of minibatch SGD).

    Pure and jittable; under a mesh, shard `bstate` on the "envs" axis and
    replicate `ts` — XLA all-reduces the gradients over ICI automatically.
    """
    continuous = env.config.scheme == "continuous"
    k_roll, k_perm = jax.random.split(key)
    batch_size = cfg.num_steps * cfg.num_envs
    mb_size = batch_size // cfg.num_minibatches

    if cfg.fused_rollout:
        # Pallas policy-rollout kernel: rollout + GAE + packing in VMEM.
        if not cfg.fused_update:
            raise NotImplementedError(
                "fused_rollout requires fused_update=True"
            )
        if env.observation_space.shape != (1,):
            raise NotImplementedError(
                "fused_rollout supports scalar observations only"
            )
        from gym_fishing_tpu.agents import ppo_fused

        roll, bstate = ppo_fused.fused_rollout_collect(
            env, env_params, cfg, ts, bstate, k_roll,
            interpret=jax.default_backend() != "tpu",
        )
        packed_t_pre = roll.packed_t
        roll_stats = roll.stats
        traj = None
        obs_dim = act_dim = 1
    else:
        bstate, obs_last, traj, last_value = collect_rollout(
            env, env_params, cfg, ts, bstate, k_roll
        )
        advantages, returns = compute_gae(cfg, traj, last_value)

        # flatten [T, B] -> [T*B] and pack all per-sample fields into ONE
        # [N, C] matrix: a single row-gather shuffles the whole dataset.
        # Gathering six separate 1-D arrays was ~20x slower on TPU
        # (element-granularity random HBM access dominates the train step);
        # one 2-D row gather is coalesced. Discrete actions ride as f32
        # (exact for small n_actions) and are cast back after the split.
        def fl2(x):
            x = x.reshape((-1,) + x.shape[2:])
            return x[:, None] if x.ndim == 1 else x

        obs2 = fl2(traj.obs)
        act2 = fl2(traj.action.astype(jnp.float32))
        obs_dim = obs2.shape[1]
        act_dim = act2.shape[1]
        packed = jnp.concatenate(
            [obs2, act2, fl2(traj.logp), fl2(traj.value), fl2(advantages),
             fl2(returns)],
            axis=1,
        )
        packed_t_pre = None
        roll_stats = None

    def unpack(mb):
        obs = mb[:, :obs_dim]
        action = mb[:, obs_dim:obs_dim + act_dim]
        if not continuous:
            action = action[:, 0].astype(jnp.int32)
        rest = mb[:, obs_dim + act_dim:]
        return obs, action, rest[:, 0], rest[:, 1], rest[:, 2], rest[:, 3]

    def make_perm(ep_key):
        if cfg.shuffle == "affine":
            # full permutation of [0, N) as the bijection i -> (a*i+b) mod N,
            # N a power of two and a odd (units of Z/2^k are exactly the odd
            # residues). O(1) state, no sort: ~10 ms/epoch cheaper than
            # jax.random.permutation at N=2^21 on v5e. uint32 wraparound is
            # exact because N divides 2^32.
            assert batch_size & (batch_size - 1) == 0, (
                "shuffle='affine' needs num_envs*num_steps to be a power of 2"
            )
            ka, kb = jax.random.split(ep_key)
            a = jax.random.randint(ka, (), 0, batch_size // 2).astype(
                jnp.uint32) * 2 + 1
            b = jax.random.randint(kb, (), 0, batch_size).astype(jnp.uint32)
            i = jax.lax.iota(jnp.uint32, batch_size)
            return (a * i + b) & jnp.uint32(batch_size - 1)
        return jax.random.permutation(ep_key, batch_size)

    if cfg.fused_update:
        # Pallas fused-update path (kernels/ppo_update_kernel.py): the whole
        # minibatch gradient is one kernel; Adam/clipping stay in optax.
        # Shuffling is ZERO-COPY: minibatches are random sets of data tiles
        # named by a scalar-prefetched tile permutation driving the kernel's
        # BlockSpec — no random.permutation sort, no HBM row-gather (together
        # those measured ~20 ms/epoch at N=2^21, more than the grad math).
        # A tile is `tile` consecutive samples = a block of envs at one
        # timestep (the [T, B] flatten is time-major and B >= tile); env
        # instances are iid, so tile-granular shuffling loses nothing.
        # Discrete envs use the kernel's categorical head: the class index
        # rides the packed buffer as one f32 column (exact for small
        # n_actions); act_dim passed to the kernel is the logits width.
        from gym_fishing_tpu.agents import ppo_fused

        head = "gaussian" if continuous else "categorical"
        kern_act_dim = act_dim if continuous else env.config.n_actions
        interpret = jax.default_backend() != "tpu"  # Mosaic interp off-TPU
        if packed_t_pre is not None:       # fused rollout already emitted it
            packed_t = packed_t_pre
        else:
            packed_t = ppo_fused.pack_feature_major(packed)  # [C', N], once
        if cfg.fused_adam:
            ts, metrics = ppo_fused.fused_epoch_scan_adam(
                cfg, ts, packed_t, obs_dim, kern_act_dim, k_perm, head=head,
                interpret=interpret
            )
        else:
            ts, metrics = ppo_fused.fused_epoch_scan(
                cfg, ts, packed_t, obs_dim, kern_act_dim, k_perm, head=head,
                interpret=interpret
            )

    else:

        def epoch(carry, ep_key):
            ts = carry
            shuffled = jnp.take(packed, make_perm(ep_key), axis=0).reshape(
                (cfg.num_minibatches, mb_size, packed.shape[1])
            )

            def minibatch(ts, mb):
                grad_fn = jax.value_and_grad(
                    lambda p: ppo_loss(
                        ts.apply_fn, p, cfg, unpack(mb), continuous
                    ),
                    has_aux=True,
                )
                (loss, metrics), grads = grad_fn(ts.params)
                ts = ts.apply_gradients(grads=grads)
                return ts, metrics

            ts, metrics = jax.lax.scan(minibatch, ts, shuffled)
            return ts, metrics

        ep_keys = jax.random.split(k_perm, cfg.epochs)
        ts, metrics = jax.lax.scan(epoch, ts, ep_keys)

    metrics = jax.tree.map(lambda x: x.mean(), metrics)

    if roll_stats is not None:
        # episode stats were accumulated in-kernel (SMEM sums):
        # [n_done, sum ep_ret@done, sum ep_len@done, sum reward]
        n_done = roll_stats[0]
        denom = jnp.maximum(n_done, 1.0)
        metrics["episode_return"] = jnp.where(
            n_done > 0, roll_stats[1] / denom, jnp.nan
        )
        metrics["episode_length"] = jnp.where(
            n_done > 0, roll_stats[2] / denom, jnp.nan
        )
        metrics["mean_reward"] = roll_stats[3] / batch_size
    else:
        done_f = traj.done.astype(jnp.float32)
        n_done = done_f.sum()
        metrics["episode_return"] = jnp.where(
            n_done > 0,
            (traj.episode_return * done_f).sum() / jnp.maximum(n_done, 1),
            jnp.nan,
        )
        metrics["episode_length"] = jnp.where(
            n_done > 0,
            (traj.episode_length.astype(jnp.float32) * done_f).sum()
            / jnp.maximum(n_done, 1),
            jnp.nan,
        )
        metrics["mean_reward"] = traj.reward.mean()
    return ts, bstate, metrics


def train(
    env: Env,
    cfg: PPOConfig,
    seed: int = 0,
    iterations: int = 32,
    env_params: Optional[EnvParams] = None,
    verbose: bool = False,
):
    """Host loop over jitted train_step (single-device convenience API)."""
    if env_params is None:
        env_params = env.params()
    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    ts = make_train_state(env, cfg, k_init)
    bstate = batched_reset(env, env_params, cfg.num_envs)
    step = jax.jit(partial(train_step, env, env_params, cfg))
    history = []
    for it in range(iterations):
        key, sub = jax.random.split(key)
        ts, bstate, metrics = step(ts, bstate, sub)
        history.append({k: float(v) for k, v in metrics.items()})
        if verbose:
            print(f"iter {it}: {history[-1]}")
    return ts, history


class PPOPolicy:
    """sb3-style .predict wrapper over a trained TrainState (for simulate)."""

    def __init__(self, env: Env, ts: TrainState):
        self.env = env
        self.ts = ts
        self.continuous = env.config.scheme == "continuous"

    def act(self, obs, carried_harvest=None):
        dist, _ = self.ts.apply_fn(self.ts.params, obs.astype(jnp.float32))
        if self.continuous:
            return dist[0]  # mean action
        return jnp.argmax(dist[0], axis=-1).astype(jnp.int32)

    def predict(self, obs, state=None, episode_start=None, deterministic=True):
        a = self.act(jnp.asarray(obs))
        return np.asarray(a), state
