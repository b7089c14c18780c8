from gym_fishing_tpu.envs.gym_adapter import GymFishingEnv
from gym_fishing_tpu.envs.wrappers import ObsStackEnv, StackedState, stack_observations
try:
    from gym_fishing_tpu.envs.vector_env import FishingVectorEnv
except Exception:  # gymnasium optional
    pass
