from gym_fishing_tpu.kernels.rollout_kernel import (
    POLICIES,
    SCHEMES,
    KernelRollout,
    make_scalars,
    pallas_rollout,
)
from gym_fishing_tpu.kernels.sharded import sharded_pallas_rollout
