from lqg_tpu.utils.stacking import time_stack, time_stack_spec, stationary_spec

__all__ = ["time_stack", "time_stack_spec", "stationary_spec"]
