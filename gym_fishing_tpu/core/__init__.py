from gym_fishing_tpu.core.env import Env, make_env
from gym_fishing_tpu.core.types import EnvConfig, EnvParams, EnvState, TimeStep
