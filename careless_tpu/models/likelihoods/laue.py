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
import numpy as np

from ...ops.conv_runs import conv_start_sums
from ...ops.plan_gather import plan_convolve
from ..base import Inputs
from . import mono


class ConvolvedLikelihood:
    """Wraps a base distribution; log_prob(v) = base.log_prob(convolve(v))."""

    def __init__(self, distribution, harmonic_id, plan=None, run_plan=None,
                 row_distribution=None):
        self.distribution = distribution
        self.harmonic_id = harmonic_id
        self.plan = plan
        # gather-free run-aligned training path (ops/conv_runs.py): the
        # base distribution re-built on the group values broadcast to rows
        self.run_plan = run_plan
        self.row_distribution = row_distribution

    def convolve(self, value):
        """Scatter-add along the last (observation) axis into same-length
        harmonic-group buckets (reference laue.py:17-25); planned fast
        segment-sum when a convolve plan is attached."""
        return plan_convolve(jnp.asarray(value), self.harmonic_id, self.plan)

    def log_prob(self, value):
        return self.distribution.log_prob(self.convolve(value))

    def masked_ll_sum(self, ipred, mask):
        """sum over group-table rows of mask * log_prob(ipred) — the ELBO's
        likelihood term. With a run plan this is the gather-free form:
        log-probs at run-start rows plus the static never-hit tail
        (identical by construction to sum(log_prob(ipred) * mask), see
        ops/conv_runs.py); otherwise the plain convolved sum.

        NOTE: the run path uses the mask BAKED into the plan (built by
        with_plans from the same Inputs); `mask` must equal it. The
        invariant is enforced upstream: Inputs.replace() drops plans when
        mask/intensities/uncertainties change (base.py _PLAN_SOURCE_FIELDS).
        """
        rp = self.run_plan
        if rp is None or self.row_distribution is None:
            ll = self.log_prob(ipred)
            if mask is not None:
                ll = ll * mask
            return jnp.sum(ll)
        conv = conv_start_sums(ipred, rp)
        ll = self.row_distribution.log_prob(conv) * rp.start_ll_mask
        n_samples = int(np.prod(ipred.shape[:-1])) if ipred.ndim > 1 else 1
        tail = self.distribution.log_prob(jnp.zeros_like(rp.iobs_row))
        return jnp.sum(ll) + n_samples * jnp.sum(tail * rp.tail_mask)

    def mean(self):
        return self.distribution.mean()

    def stddev(self):
        return self.distribution.stddev()


def _harmonic_plan(inputs: Inputs):
    return inputs.plans.harmonic if inputs.plans is not None else None


def _build_convolved(base, params: dict, inputs: Inputs):
    """Wrap a base mono likelihood into the convolved form, attaching the
    run-aligned fast path when the inputs carry a ConvRunPlan."""
    run = (inputs.plans.harmonic_run if inputs.plans is not None else None)
    row_dist = None
    if run is not None:
        row_dist = base.build(params, inputs._replace(
            intensities=run.iobs_row, uncertainties=run.sig_row))
    return ConvolvedLikelihood(base.build(params, inputs),
                               inputs.harmonic_id,
                               plan=_harmonic_plan(inputs),
                               run_plan=run, row_distribution=row_dist)


def _convolved(base_cls):
    @dataclass(frozen=True)
    class _Conv:
        def init(self):
            return base_cls().init()

        def build(self, params: dict, inputs: Inputs):
            return _build_convolved(base_cls(), params, inputs)
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
        return _build_convolved(mono.StudentTLikelihood(self.dof), params,
                                inputs)


@dataclass(frozen=True)
class StudentTEv11Likelihood:
    dof: float

    def init(self):
        return mono.NormalEv11Likelihood().init()

    def build(self, params: dict, inputs: Inputs):
        return _build_convolved(mono.StudentTEv11Likelihood(self.dof),
                                params, inputs)
