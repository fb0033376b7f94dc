from lqg_tpu.ops import riccati, kalman, gaussian, linalg, sqrt, dare

__all__ = ["riccati", "kalman", "gaussian", "linalg", "sqrt", "dare"]
