from gym_fishing_tpu.dynamics.growth import GROWTH_FNS, get_growth_fn
from gym_fishing_tpu.dynamics.noise import apply_process_noise
