from lqg_tpu.ops.pallas.gains import fused_gains, fused_gains_available

__all__ = ["fused_gains", "fused_gains_available"]
