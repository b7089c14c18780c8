from gym_fishing_tpu.envs.gym_adapter import GymFishingEnv
try:
    from gym_fishing_tpu.envs.vector_env import FishingVectorEnv
except Exception:  # gymnasium optional
    pass
