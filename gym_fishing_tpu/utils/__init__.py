from gym_fishing_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from gym_fishing_tpu.utils.debug import assert_finite, assert_unique_keys, trajectory_checksum
