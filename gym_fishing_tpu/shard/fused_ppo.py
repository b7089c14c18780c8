"""Mesh-sharded fused PPO train step (shard_map over the "envs" axis).

The XLA train_step shards under plain jit/GSPMD (tests/test_shard.py): XLA
partitions the arrays and inserts the gradient all-reduce itself. The fused
kernels (kernels/policy_rollout_kernel.py, kernels/ppo_update_kernel.py)
cannot be auto-partitioned — a pallas_call is opaque to GSPMD — so the
multi-chip composition is explicit SPMD via shard_map, the idiomatic JAX
pattern for hand-written kernels (SURVEY.md §2.4):

- env instances shard over the 1-D ("envs",) mesh; each device runs the
  fused rollout kernel on its local shard (RNG seed folded with
  axis_index, so device streams are independent);
- each minibatch is the union of per-device local tile sets; advantage
  statistics are psum-reduced (exact global stats), gradients and metrics
  are pmean-reduced (equal local shard sizes -> the exact global-minibatch
  gradient), and every device applies the identical Adam update, keeping
  replicated params in sync;
- the only cross-device traffic is the tiny grad/stat psum per minibatch,
  riding ICI — identical communication volume to the XLA path's all-reduce.

At epochs=1, minibatches=1 this is bit-compatible (modulo f32 reduction
order) with the single-device fused train_step; proven on the virtual CPU
mesh in tests/test_shard_fused.py, where the Mosaic interpreter's zero PRNG
makes both sides deterministic.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from gym_fishing_tpu.agents import ppo_fused
from gym_fishing_tpu.agents.ppo import PPOConfig
from gym_fishing_tpu.core.env import Env
from gym_fishing_tpu.core.types import EnvParams


def make_sharded_fused_train_step(
    env: Env,
    env_params: EnvParams,
    cfg: PPOConfig,
    mesh: Mesh,
    axis: str = "envs",
    hlo_interpret: bool = False,
):
    """Build a jittable (ts, bstate, key) -> (ts, bstate, metrics) step.

    cfg.num_envs is the GLOBAL env count; bstate must be sharded over
    `axis` (shard.mesh.shard_batch / host_local_to_global), ts replicated.
    Requires cfg.fused_update (and uses the fused rollout kernel — same
    constraints: scalar obs, static sigma_m, float32; both action heads;
    obs-noise and mixture growth supported via the static scalar slots).
    """
    ndev = int(mesh.shape[axis])
    if cfg.num_envs % ndev != 0:
        raise ValueError(
            f"num_envs {cfg.num_envs} not divisible by mesh axis {ndev}"
        )
    if not cfg.fused_update:
        raise NotImplementedError(
            "make_sharded_fused_train_step is the fused-kernel composition; "
            "for the XLA path just jit agents.ppo.train_step under the mesh"
        )
    local_cfg = dataclasses.replace(cfg, num_envs=cfg.num_envs // ndev)
    # interpret follows the MESH's platform, not the process default backend:
    # with a TPU attached but a CPU mesh (the dryrun_multichip path), the
    # default backend says "tpu" while the kernels execute on CPU devices.
    # hlo_interpret=True selects pallas's generic interpreter instead of the
    # Mosaic one on CPU meshes: required for MULTI-PROCESS execution, where
    # the Mosaic interpreter's callback machinery deadlocks (the kernels'
    # PRNG then yields zero bits, same as the Mosaic interpreter on CPU —
    # see kernels/rollout_kernel._random_bits and tests/test_multihost.py).
    interpret = mesh.devices.flat[0].platform != "tpu"
    if interpret and hlo_interpret:
        interpret = "hlo"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    def step(ts, bstate, key):
        idx = jax.lax.axis_index(axis)
        k_roll, k_perm = jax.random.split(key)
        # independent RNG stream per device (kernel folds program_id on top)
        k_roll = jax.random.fold_in(k_roll, idx)
        roll, bstate = ppo_fused.fused_rollout_collect(
            env, env_params, local_cfg, ts, bstate, k_roll,
            interpret=interpret,
        )
        continuous = env.config.scheme == "continuous"
        head = "gaussian" if continuous else "categorical"
        kern_act_dim = 1 if continuous else env.config.n_actions
        ts, metrics = ppo_fused.fused_epoch_scan(
            local_cfg, ts, roll.packed_t, 1, kern_act_dim, k_perm,
            head=head, interpret=interpret, axis_name=axis,
        )
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        stats = jax.lax.psum(roll.stats, axis)
        n_done = stats[0]
        denom = jnp.maximum(n_done, 1.0)
        metrics["episode_return"] = jnp.where(
            n_done > 0, stats[1] / denom, jnp.nan
        )
        metrics["episode_length"] = jnp.where(
            n_done > 0, stats[2] / denom, jnp.nan
        )
        metrics["mean_reward"] = stats[3] / (cfg.num_envs * cfg.num_steps)
        return ts, bstate, metrics

    return step
