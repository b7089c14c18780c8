from gym_fishing_tpu.batch.batch import (
    BatchState,
    RolloutStep,
    batched_reset,
    batched_step,
    batched_step_xi,
    rollout,
)
