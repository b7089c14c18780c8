from gym_fishing_tpu.spaces.spaces import Box, Discrete
from gym_fishing_tpu.spaces.scaling import (
    decode_action,
    encode_action,
    obs_from_stock,
    stock_from_obs,
)
