"""Empirical (reference-structure) priors centered on external amplitudes.

Reference behavior: /root/reference/careless/models/priors/empirical.py:9-131.
A subset of reflections (those present in the external file) get log-probs
from a location-scale family centered on Fobs; reflections with no external
datum contribute zero. Library-level only in the reference too (not wired
into the CLI; README "future release").
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ...ops.distributions import Laplace, Normal, RiceWoolfson, StudentT

Array = jax.Array


@dataclass(frozen=True, eq=False)
class ReferencePrior:
    """Scatter log-probs of an observed subset into the full refl_id space.

    Not a pytree: reference priors carry no trainable parameters, so they are
    closed over as constants by the jitted loss (their arrays become XLA
    constants — no host->device traffic per step).

    observed: (n_refl,) bool — True where the external file has a datum
    loc, scale: (n_refl,) f32 — Fobs / SigFobs (garbage where unobserved)
    dof: scalar f32 — only used by the StudentT flavor
    centric: (n_refl,) bool — only used by the RiceWoolfson flavor
    """

    observed: Array
    loc: Array
    scale: Array
    kind: str = "normal"
    dof: Optional[float] = None
    centric: Optional[Array] = None

    def _dist(self):
        if self.kind == "normal":
            return Normal(self.loc, self.scale)
        if self.kind == "laplace":
            return Laplace(self.loc, self.scale)
        if self.kind == "studentt":
            return StudentT(self.dof, self.loc, self.scale)
        if self.kind == "ricewoolfson":
            return RiceWoolfson(self.loc, self.scale, self.centric)
        raise ValueError(f"unknown reference prior kind {self.kind!r}")

    def log_prob(self, x):
        lp = self._dist().log_prob(x)
        return jnp.where(self.observed, lp, jnp.zeros_like(lp))

    def mean(self):
        return jnp.where(self.observed, self._dist().mean(), 1.0)
