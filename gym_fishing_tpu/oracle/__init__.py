from gym_fishing_tpu.oracle.oracle import (
    OracleConfig,
    OracleState,
    reset,
    step,
    step_xi,
    rollout_xi,
)
