from gym_fishing_tpu.bench.throughput import BASELINE_STEPS_PER_S, measure
from gym_fishing_tpu.bench.profiling import time_fn, trace
from gym_fishing_tpu.bench.scaling import weak_scaling
