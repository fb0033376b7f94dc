from lqg_tpu.ops import riccati, kalman, gaussian, linalg

__all__ = ["riccati", "kalman", "gaussian", "linalg"]
