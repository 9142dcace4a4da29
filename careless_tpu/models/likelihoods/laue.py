"""Convolved likelihoods for polychromatic (Laue) data.

Reference behavior: /root/reference/careless/models/likelihoods/laue.py.
Harmonic observations overlap on the detector: per-harmonic predictions are
scatter-added over `harmonic_id` into harmonic-group buckets, and the base
likelihood scores the *convolved* prediction against the group's observed
intensity (laue.py:17-34). Rows beyond the group count are padding whose
log-prob is garbage-but-gradient-free (the packed intensities carry 1s
there, see SURVEY.md §2.3).

TPU note: XLA lowers the duplicate-index scatter-add element-serialized on
TPU, so the training path attaches a static convolve plan
(Inputs.plans.harmonic, built over harmonic_id by Inputs.with_plans): the
forward becomes a chunked-cumsum segment sum and the backward a windowed
gather (ops/plan_gather.py plan_convolve). Without a plan (e.g. freshly
split inputs) it falls back to the `.at[].add()` scatter. Under
data-parallel sharding the shard layout keeps harmonic groups shard-local
(SURVEY.md §5.8).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ...ops.plan_gather import plan_convolve
from ..base import Inputs
from . import mono


class ConvolvedLikelihood:
    """Wraps a base distribution; log_prob(v) = base.log_prob(convolve(v))."""

    def __init__(self, distribution, harmonic_id, plan=None):
        self.distribution = distribution
        self.harmonic_id = harmonic_id
        self.plan = plan

    def convolve(self, value):
        """Scatter-add along the last (observation) axis into same-length
        harmonic-group buckets (reference laue.py:17-25); planned fast
        segment-sum when a convolve plan is attached."""
        return plan_convolve(jnp.asarray(value), self.harmonic_id, self.plan)

    def log_prob(self, value):
        return self.distribution.log_prob(self.convolve(value))

    def mean(self):
        return self.distribution.mean()

    def stddev(self):
        return self.distribution.stddev()


def _harmonic_plan(inputs: Inputs):
    return inputs.plans.harmonic if inputs.plans is not None else None


def _convolved(base_cls):
    @dataclass(frozen=True)
    class _Conv:
        def init(self):
            return base_cls().init()

        def build(self, params: dict, inputs: Inputs):
            return ConvolvedLikelihood(base_cls().build(params, inputs),
                                       inputs.harmonic_id,
                                       plan=_harmonic_plan(inputs))
    _Conv.__name__ = base_cls.__name__
    _Conv.__qualname__ = base_cls.__name__
    return _Conv


NormalLikelihood = _convolved(mono.NormalLikelihood)
LaplaceLikelihood = _convolved(mono.LaplaceLikelihood)
NormalEv11Likelihood = _convolved(mono.NormalEv11Likelihood)


@dataclass(frozen=True)
class StudentTLikelihood:
    dof: float

    def init(self):
        return {}

    def build(self, params: dict, inputs: Inputs):
        return ConvolvedLikelihood(
            mono.StudentTLikelihood(self.dof).build(params, inputs),
            inputs.harmonic_id, plan=_harmonic_plan(inputs))


@dataclass(frozen=True)
class StudentTEv11Likelihood:
    dof: float

    def init(self):
        return mono.NormalEv11Likelihood().init()

    def build(self, params: dict, inputs: Inputs):
        return ConvolvedLikelihood(
            mono.StudentTEv11Likelihood(self.dof).build(params, inputs),
            inputs.harmonic_id, plan=_harmonic_plan(inputs))
