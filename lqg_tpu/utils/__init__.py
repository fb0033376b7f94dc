from lqg_tpu.utils.stacking import time_stack, time_stack_spec, stationary_spec

__all__ = ["time_stack", "time_stack_spec", "stationary_spec"]
from lqg_tpu.utils.profiling import trace, timeit, Timing

__all__ += ["trace", "timeit", "Timing"]
from lqg_tpu.utils.numerics import kahan_sum
