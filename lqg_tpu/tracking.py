"""Compatibility alias: ``lqg_tpu.tracking`` re-exports the model zoo.

The reference exposes its models under ``lqg.tracking``; this module lets
reference-shaped code (`getattr(tracking, model_name)`, CLI ``--model``
resolution) work unchanged against :mod:`lqg_tpu.models`.
"""

from lqg_tpu.models import (  # noqa: F401
    TrackingTask,
    BoundedActor,
    OptimalActor,
    RelativeObservationBoundedActor,
    SubjectiveActor,
    TemporalDelayModel,
    DelayedSubjectiveActor,
    delay_system,
    PointMassBoundedActor,
    HandMotionModelTrackingTask,
    SignalDependentNoiseActor,
)

__all__ = [
    "TrackingTask",
    "BoundedActor",
    "OptimalActor",
    "RelativeObservationBoundedActor",
    "SubjectiveActor",
    "TemporalDelayModel",
    "DelayedSubjectiveActor",
    "delay_system",
    "PointMassBoundedActor",
    "HandMotionModelTrackingTask",
    "SignalDependentNoiseActor",
]
