from gym_fishing_tpu.shard.mesh import (
    ENVS_AXIS,
    constrain_envs,
    distributed_init,
    env_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    state_checksum,
)
