from lqg_tpu.ops import riccati, kalman, gaussian, linalg, sqrt

__all__ = ["riccati", "kalman", "gaussian", "linalg", "sqrt"]
