"""Inference layer: native NUTS/SVI parameter inference for LQG models.

Public surface mirrors the reference (``lqg/infer/__init__.py``):
``infer``, ``max_likelihood``, ``get_model_params`` - implemented natively in
JAX (no NumPyro dependency).

Submodules are imported lazily so that ``lqg_tpu.infer.dists`` (used by the
system layer) does not pull the whole inference engine into every import.
"""

_LAZY = {
    "infer": ("lqg_tpu.infer.utils", "infer"),
    "sample_from_prior": ("lqg_tpu.infer.utils", "sample_from_prior"),
    "max_likelihood": ("lqg_tpu.infer.mle", "max_likelihood"),
    "get_model_params": ("lqg_tpu.infer.models", "get_model_params"),
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'lqg_tpu.infer' has no attribute {name!r}")
