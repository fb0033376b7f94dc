"""Temporal delay models: augment the state with a shift register.

Semantics match reference ``lqg/tracking/delay.py``: the state is extended
with a ``delay``-deep shift register (sub-diagonal identity blocks in ``A``);
the observation reads the *oldest* register slot, so the agent acts on
``delay``-steps-old information.
"""

from __future__ import annotations

import jax.numpy as jnp

from lqg_tpu.spec import LQGSpec
from lqg_tpu.system import System
from lqg_tpu.models.subjective import SubjectiveActor


def _delay_static(A, B, F, V, Q, d: int, delay: int):
    """Delay-augment one set of static matrices (reference ``delay.py:9-33``)."""
    n_aug = d * (delay + 1)
    A_aug = jnp.zeros((n_aug, n_aug), dtype=A.dtype)
    A_aug = A_aug.at[:d, :d].set(A)
    # shift register: sub-diagonal identity, delay blocks deep
    A_aug = A_aug + jnp.diag(jnp.ones(d * delay, dtype=A.dtype), k=-d)

    B_aug = jnp.concatenate([B] + [jnp.zeros_like(B)] * delay, axis=0)
    F_aug = jnp.concatenate(
        [jnp.zeros((F.shape[0], F.shape[1] * delay), dtype=F.dtype), F], axis=1)

    V_aug = jnp.zeros((n_aug, n_aug), dtype=V.dtype)
    V_aug = V_aug.at[:d, :V.shape[1]].set(V)

    Q_aug = jnp.zeros((n_aug, n_aug), dtype=Q.dtype)
    Q_aug = Q_aug.at[:d, :d].set(Q)

    return A_aug, B_aug, F_aug, V_aug, Q_aug


def delay_system(spec: LQGSpec, delay: int, horizon=None) -> LQGSpec:
    """Delay-augmented spec.  Accepts stationary or stacked specs; stacked
    specs are augmented slice-wise like the reference (``delay.py:9-33``)."""
    stationary = spec.A.ndim == spec.Qf.ndim

    if stationary:
        d = spec.A.shape[-1]
        A, B, F, V, Q = _delay_static(spec.A, spec.B, spec.F, spec.V, spec.Q,
                                      d, delay)
        n_aug = A.shape[0]
        action_dim = spec.R.shape[-1]
        return LQGSpec(
            A=A, B=B, F=F, V=V, W=spec.W, Q=Q, R=spec.R,
            q=jnp.zeros(n_aug, dtype=Q.dtype), Qf=Q,
            qf=jnp.zeros(n_aug, dtype=Q.dtype),
            P=jnp.zeros((action_dim, n_aug), dtype=spec.R.dtype),
            r=jnp.zeros(action_dim, dtype=spec.R.dtype),
        )

    import jax
    T = spec.A.shape[-3]
    d = spec.A.shape[-1]
    A, B, F, V, Q = jax.vmap(
        lambda a, b, f, v, q: _delay_static(a, b, f, v, q, d, delay),
        in_axes=-3, out_axes=-3,
    )(spec.A, spec.B, spec.F, spec.V, spec.Q)
    n_aug = A.shape[-1]
    action_dim = spec.R.shape[-1]
    return LQGSpec(
        A=A, B=B, F=F, V=V, W=spec.W, Q=Q, R=spec.R,
        q=jnp.zeros((T, n_aug), dtype=Q.dtype), Qf=Q[..., -1, :, :],
        qf=jnp.zeros(n_aug, dtype=Q.dtype),
        P=jnp.zeros((T, action_dim, n_aug), dtype=spec.R.dtype),
        r=jnp.zeros((T, action_dim), dtype=spec.R.dtype),
    )


class TemporalDelayModel(System):
    """Wrap an existing system with a temporal delay
    (reference ``delay.py:36-41``)."""

    def __init__(self, system: System, delay: int):
        dyn = delay_system(system.dynamics, delay=delay)
        act = delay_system(system.actor, delay=delay)
        super().__init__(actor=act, dynamics=dyn, horizon=system.horizon)


class DelayedSubjectiveActor(TemporalDelayModel):
    """Subjective actor with a 12-step visuomotor delay
    (reference ``delay.py:44-51``)."""

    def __init__(self, process_noise=1.0, c=0.5, action_variability=0.5,
                 subj_noise=1.0, subj_vel_noise=10.0, sigma_target=6.0,
                 sigma_cursor=3.0, dt=1.0 / 60, T=1000):
        system = SubjectiveActor(
            process_noise=process_noise, action_cost=c,
            action_variability=action_variability, subj_noise=subj_noise,
            subj_vel_noise=subj_vel_noise, sigma_target=sigma_target,
            sigma_cursor=sigma_cursor, dt=dt, T=T)
        super().__init__(system=system, delay=12)
