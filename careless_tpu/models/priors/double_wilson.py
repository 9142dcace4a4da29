"""Double-Wilson prior: multivariate prior across related datasets.

Reference behavior: /root/reference/careless/models/priors/wilson.py:82-176.
Each input file (ASU) may designate a parent; child reflections follow a
RiceWoolfson distribution centered on r * z_parent with scale
sqrt(eps*Sigma*(1-r^2)) (halved variance for acentrics); roots follow the
plain Wilson prior. Parent z values are gathered via precomputed cross-ASU
reflection ids (including optional reindexing ops), with missing parents
masked to the Wilson behavior. r is optionally trainable through a sigmoid.

TPU design: the cross-ASU id table is a static int32 gather index — the
gather is device-local under observation sharding because the posterior z is
replicated (SURVEY.md §5.8).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distributions import RiceWoolfson
from .wilson import WilsonPrior

Array = jax.Array


class _DoubleWilsonDist:
    """log_prob over the full refl_id space for a given r vector."""

    def __init__(self, prior: "DoubleWilsonPrior", r: Array):
        self.prior = prior
        self.r = r

    def log_prob(self, z):
        p = self.prior
        r = self.r[p.asu_ids]                     # (n_refl,)
        mask = p.reflids >= 0
        safe_ids = jnp.where(mask, p.reflids, 0)
        z_parent = jnp.where(mask, z[..., safe_ids], 0.0)
        loc = jnp.where(p.absent, 0.0, z_parent * r)
        r2 = jnp.square(r)
        scale = jnp.where(
            p.centric,
            jnp.sqrt(p.multiplicity * p.sigma * (1.0 - r2)),
            jnp.sqrt(0.5 * p.multiplicity * p.sigma * (1.0 - r2)),
        )
        rice_woolfson = RiceWoolfson(loc, scale, p.centric)
        p_wilson = p.wilson_prior.log_prob(z)
        p_dw = rice_woolfson.log_prob(z)
        return jnp.where(p.root, p_wilson, p_dw)

    def mean(self):
        return self.prior.wilson_prior.mean()

    def stddev(self):
        return self.prior.wilson_prior.stddev()

    def metrics(self):
        return {f"rDW_{i}": self.r[i] for i in range(self.r.shape[0])}


@dataclass(frozen=True, eq=False)
class DoubleWilsonPrior:
    centric: Array            # (n_refl,) bool
    multiplicity: Array       # (n_refl,) f32
    asu_ids: Array            # (n_refl,) int32 — which file/ASU each refl is in
    reflids: Array            # (n_refl,) int32 — parent refl id or -1
    root: Array               # (n_refl,) bool
    r_init: Array             # (n_files,) f32
    sigma: object = 1.0
    optimize_r: bool = False
    wilson_prior: WilsonPrior = field(default=None)

    @classmethod
    def from_asu_collection(cls, asu_collection, parents: Sequence,
                            r_values: Sequence[float],
                            reindexing_ops: Optional[Sequence] = None,
                            sigma=1.0, optimize_r: bool = False
                            ) -> "DoubleWilsonPrior":
        from ...xtal.symop import Op

        reflids: List[np.ndarray] = []
        root: List[np.ndarray] = []
        for child, parent in enumerate(parents):
            child_asu = asu_collection.reciprocal_asus[child]
            n = len(child_asu)
            if parent is None:
                reflids.append(
                    np.arange(n, dtype=np.int64) + asu_collection.offsets[child])
                root.append(np.ones(n, dtype=bool))
            else:
                root.append(np.zeros(n, dtype=bool))
                parent_asu = asu_collection.reciprocal_asus[parent]
                h = child_asu.Hall
                if reindexing_ops is not None:
                    op = reindexing_ops[child]
                    if isinstance(op, str):
                        op = Op.from_xyz(op)
                    h = op.apply_to_hkl(h)
                h, _ = parent_asu.spacegroup.map_to_asu(
                    h, anomalous=parent_asu.anomalous)
                pid = np.full(len(h), parent, dtype=np.int64)
                reflids.append(asu_collection.to_refl_id(
                    pid, h, allow_missing=True))

        wilson = WilsonPrior(
            np.asarray(asu_collection.centric),
            np.asarray(asu_collection.multiplicity, np.float32),
            np.float32(sigma) if np.isscalar(sigma) else np.asarray(sigma, np.float32))
        return cls(
            centric=jnp.asarray(asu_collection.centric),
            multiplicity=jnp.asarray(asu_collection.multiplicity, jnp.float32),
            asu_ids=jnp.asarray(asu_collection.asu_ids, jnp.int32),
            reflids=jnp.asarray(np.concatenate(reflids), jnp.int32),
            root=jnp.asarray(np.concatenate(root)),
            r_init=jnp.asarray(r_values, jnp.float32),
            sigma=(jnp.float32(sigma) if np.isscalar(sigma)
                   else jnp.asarray(sigma, jnp.float32)),
            optimize_r=optimize_r,
            wilson_prior=wilson,
        )

    @property
    def absent(self):
        return self.reflids < 0

    # ------------------------------------------------------- param protocol
    def init(self) -> dict:
        if not self.optimize_r:
            return {}
        # sigmoid bijector (reference wilson.py:105-110)
        r = np.clip(np.asarray(self.r_init, np.float64), 1e-6, 1 - 1e-6)
        return {"r_raw": jnp.asarray(np.log(r / (1.0 - r)), jnp.float32)}

    def build(self, params: dict) -> _DoubleWilsonDist:
        if self.optimize_r and "r_raw" in params:
            r = jax.nn.sigmoid(params["r_raw"])
        else:
            r = self.r_init
        return _DoubleWilsonDist(self, r)

    # convenience for posterior initialization (prior moments)
    def mean(self):
        return self.wilson_prior.mean()

    def stddev(self):
        return self.wilson_prior.stddev()

    def log_prob(self, z):
        return self.build({}).log_prob(z)


def parse_parents(spec: str) -> List[Optional[int]]:
    return [None if i.strip() == "None" else int(i) for i in spec.split(",")]


def build_double_wilson_prior(dm, parser) -> DoubleWilsonPrior:
    """Factory from parsed CLI flags (reference manager.py:408-430)."""
    parents = parse_parents(parser.parents)
    r_values = [float(i) for i in parser.dwr.split(",")]
    for r in r_values:
        if (r >= 1.0) or (r <= -1.0):
            raise ValueError(
                f"Supplied --double-wilson-r value {r} outside of allowed "
                "range (-1, 1)")
        if r < 0:
            from warnings import warn
            warn(f"Supplied --double-wilson-r value {r} is negative")
    sigma = dm.get_wilson_sigma(parser.wilson_prior_b)
    reindexing_ops = None
    if parser.reindexing_ops is not None:
        reindexing_ops = parser.reindexing_ops.split(";")
    return DoubleWilsonPrior.from_asu_collection(
        dm.asu_collection, parents, r_values, reindexing_ops,
        sigma=sigma, optimize_r=parser.optimize_double_wilson_r)
