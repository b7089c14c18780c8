from gym_fishing_tpu.registry.registry import make, register, registered_ids
