"""Mesh-sharded Pallas rollout: the kernel path scaled over devices.

Env shards never communicate, so the fused rollout kernel runs independently
per device under `jax.shard_map` over the ("envs",) mesh — the kernel tier
and the sharding tier compose. Each device folds its mesh position into the
PRNG seed so shards draw independent noise streams (the in-kernel seed is
per grid-program; without the fold every device would replay the same
stream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gym_fishing_tpu.kernels.rollout_kernel import KernelRollout, pallas_rollout
from gym_fishing_tpu.shard.mesh import ENVS_AXIS


def sharded_pallas_rollout(
    mesh: Mesh,
    stock: jax.Array,    # (B,) f32, B divisible by n_devices * tile
    t: jax.Array,        # (B,) i32
    scalars: jax.Array,  # (NUM_SCALARS,) f32 (replicated)
    num_steps: int,
    **kernel_kw,
) -> KernelRollout:
    """Run the fused rollout kernel on every device's env shard."""

    def local(stock_shard, t_shard, scal):
        # decorrelate shards: fold the mesh position into the seed slot
        idx = jax.lax.axis_index(ENVS_AXIS).astype(jnp.float32)
        scal = scal.at[7].add(idx * 1000003.0)
        return tuple(
            pallas_rollout(stock_shard, t_shard, scal, num_steps, **kernel_kw)
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ENVS_AXIS), P(ENVS_AXIS), P()),
        out_specs=tuple(P(ENVS_AXIS) for _ in KernelRollout._fields),
        # pallas_call out_shapes carry no varying-mesh-axes annotation
        check_vma=False,
    )
    return KernelRollout(*f(stock, t, scalars))
