"""Posterior inference entry points.

API parity with reference ``lqg/infer/utils.py``: ``infer`` runs NUTS (or
NeuTra-reparametrized NUTS) on the lifted model; ``sample_from_prior`` draws
ground-truth parameters for recovery studies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random

from lqg_tpu.infer import priors as prior_module
from lqg_tpu.infer.mcmc import MCMC
from lqg_tpu.infer.models import ProbModel, lifted_model, get_model_params
from lqg_tpu.infer.svi import fit_auto_mvn


def infer(x, num_samples, num_warmup, model=None, model_fn=lifted_model,
          process_noise=1.0, dt=1.0 / 60, method="nuts", progress_bar=True,
          num_chains=4, seed=0, max_depth=10, neutra_steps=5000,
          neutra_guide="iaf", checkpoint_path=None, mcmc_kwargs=None,
          **fixed) -> MCMC:
    """Sample the posterior over model parameters given trajectories ``x``.

    Args:
        x: data ``(n, T+1, d)``.
        num_samples / num_warmup: draws per chain.
        model: model class (defaults to ``BoundedActor``).
        model_fn: builder returning a :class:`ProbModel` (default: the
            prior-lifted single-condition model).
        method: ``"nuts"`` or ``"neutra"`` (NUTS on a variationally
            preconditioned space, like the reference's BNAF-flow NeuTra,
            ``lqg/infer/utils.py:21-31``).
        neutra_guide: preconditioner family for ``method="neutra"`` -
            ``"iaf"`` (masked autoregressive flow,
            :func:`lqg_tpu.infer.flows.fit_auto_iaf`) or ``"mvn"``
            (full-rank Gaussian).
        num_chains: chains, vmapped on-device (default 4, matching the
            reference CLIs' ``numpyro.set_host_device_count(4)`` +
            ``--nchain 4``, ``main.py:8,24``).
        checkpoint_path: persist the in-flight run there after every chunk
            and resume a compatible checkpoint (see :meth:`MCMC.run`).
        mcmc_kwargs: extra :class:`MCMC` constructor options
            (``dense_mass``, ``max_leapfrogs_per_launch``, ``chunk_steps``,
            ``init_inv_mass``, ``adapt_mass``, ``checkpoint_every``, ...).

    Returns:
        a run :class:`MCMC` object (``get_samples``, ``summary``...).
    """
    if model is None:
        from lqg_tpu.models import BoundedActor as model

    prob_model = model_fn(x, model, process_noise=process_noise, dt=dt,
                          **fixed)

    if method == "neutra":
        if neutra_guide == "iaf":
            from lqg_tpu.infer.flows import fit_auto_iaf

            guide, _ = fit_auto_iaf(prob_model, random.PRNGKey(seed),
                                    steps=neutra_steps)
        elif neutra_guide == "mvn":
            guide, _ = fit_auto_mvn(prob_model, random.PRNGKey(seed),
                                    steps=neutra_steps)
        else:
            raise ValueError(
                "neutra_guide must be 'iaf' or 'mvn', got "
                f"{neutra_guide!r}")
        prob_model = neutra_reparam(prob_model, guide)
    elif method != "nuts":
        raise ValueError(
            "Please specify a valid inference method (nuts, neutra).")

    mcmc = MCMC(prob_model, num_warmup=num_warmup, num_samples=num_samples,
                num_chains=num_chains, max_depth=max_depth,
                progress=progress_bar, **(mcmc_kwargs or {}))
    mcmc.run(random.PRNGKey(seed), checkpoint_path=checkpoint_path)
    return mcmc


def neutra_reparam(model: ProbModel, guide) -> ProbModel:
    """Precondition a model through a fitted guide transform (NeuTra).

    NUTS runs in the guide's standardized space ``eps``; positions map back
    through the guide's forward transform ``u = f(eps)`` - affine for the
    Gaussian guide, a masked autoregressive flow for :class:`AutoIAF` - and
    the density picks up the transform's log-Jacobian (constant in the
    affine case, eps-dependent for flows).
    """
    names = model.names

    reparam = ProbModel(init=dict(model.init),
                        transforms=dict(model.transforms),
                        log_likelihood=model.log_likelihood,
                        priors=model.priors)

    base_log_joint = model.log_joint_unconstrained

    def log_joint_eps(eps):
        u, logdet = guide.transform_and_logdet(eps)
        return base_log_joint(u) + logdet

    # override the unconstrained-space plumbing; chains start at the
    # guide's base point (eps = 0) unless a caller re-centers them by
    # assigning ``reparam.init_eps`` (e.g. a warped-space MAP polish)
    reparam.log_joint_unconstrained = log_joint_eps
    reparam.init_eps = jnp.zeros(len(names))
    reparam.init_unconstrained = lambda: reparam.init_eps
    reparam.constrain = lambda eps: model.constrain(guide.transform(eps))
    return reparam


def sample_from_prior(model_type, seed,
                      prior_dict=None) -> dict:
    """Draw ground-truth parameters for a recovery study
    (reference ``utils.py:42-46``)."""
    if prior_dict is None:
        prior_dict = prior_module.DEFAULT_PRIOR
    params = prior_module.sample_params(random.PRNGKey(seed), prior_dict)
    model_params = get_model_params(model_type).keys()
    return {k: v for k, v in params.items() if k in model_params}
