"""Variational merging model: the ELBO core and the training engine.

Reference behavior: /root/reference/careless/models/merging/variational.py.
The forward pass (call(), variational.py:141-183):

    z_F   ~ q(F)                      (S, n_refl)  truncated-normal rsample
    Sigma ~ scaler(metadata)          (S, N_obs)
    Ipred = Sigma * gather(z_F, refl_id)^2
    ll    = likelihood(inputs).log_prob(Ipred)     (Laue: convolved)
    KL    = q.log_prob(z_F) - prior.log_prob(z_F)  (MC; variational.py:123-128)
    loss  = -sum(ll)/S + sum(KL)/S                 (or mean-reductions w/ kl_weight)

TPU-native redesign (not a port):
- the whole train loop is `lax.scan` over jitted steps — metrics accumulate
  on device and transfer once per chunk, eliminating the reference's
  per-step host<->device sync (variational.py:255-270), which is the main
  single-chip throughput win;
- gradient NaN-zeroing + global-norm tracking (variational.py:202-209) are
  pure optax-side transforms inside the step;
- RNG is explicit jax.random key folding (no global seed state);
- params/opt_state are pytrees; freezing = boolean mask on grad subtrees
  (same UX as the reference's trainable=False, careless.py:50-56).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...ops.plan_gather import plan_gather
from ..base import Inputs

Array = jax.Array


def fused_seed_spacing(samples_per_shard: int) -> int:
    """Per-shard index stride for the fused kernel's in-kernel PRNG.

    Shard j, sample s maps to index s + j * spacing; uniqueness over all
    (s, j) pairs requires spacing >= samples_per_shard (round-4
    regression: a fixed 31 collided at mc > 31 — shard i sample 31 equals
    shard i+1 sample 0)."""
    return max(31, samples_per_shard)


# the kernel seeds each 8192-obs block with base + block_index, so seed
# BASES of distinct (sample, shard) pairs must differ by more than the
# per-call block count or their noise streams overlap block-shifted
# (round-5 review finding: bases one apart made sample s+1's stream equal
# sample s's shifted by one block). 65537 > any block count up to 500M
# observations per call.
FUSED_STREAM_STRIDE = 65537


def fused_shard_seed(seed, s: int, shard_index,
                     samples_per_shard: int):
    """Stream-disjoint in-kernel PRNG seed base for (sample, shard)."""
    idx = s + shard_index * fused_seed_spacing(samples_per_shard)
    return seed * 1009 + idx * FUSED_STREAM_STRIDE


def _global_norm(tree) -> Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


@dataclass(frozen=True, eq=False)
class VariationalMergingModel:
    """Static model description. Parameters live in a separate pytree:

        params = {"posterior": ..., "scaler": ..., "likelihood": ...}

    `posterior`/`prior`/`likelihood`/`scaler` are the functional components
    defined in this package; non-trainable arrays they close over (Wilson
    eps/centric flags, truncation bounds) become XLA constants.
    """

    posterior: Any
    prior: Any
    likelihood: Any
    scaler: Any
    mc_samples: int = 1
    kl_weight: Optional[float] = None
    # use the fused Pallas likelihood kernel when the configuration allows
    # (mono + Normal likelihood + MLP/Hybrid scaler + 1 MC sample)
    fused_kernel: bool = False
    # Rao-Blackwellized KL: take E_q[log q] (TN entropy) and the analytic
    # parts of E_q[log p] in closed form, MC only for the acentric E[log z]
    # term — lower-variance than the reference's full-MC KL
    analytic_kl: bool = False

    @staticmethod
    def _masked_ll_sum(likelihood, ipred, mask):
        """Total masked log-likelihood over all samples and rows.
        Convolved (Laue) likelihoods provide the gather-free run-aligned
        form (models/likelihoods/laue.py masked_ll_sum)."""
        if hasattr(likelihood, "masked_ll_sum"):
            return likelihood.masked_ll_sum(ipred, mask)
        ll = likelihood.log_prob(ipred)
        if mask is not None:
            ll = ll * mask
        return jnp.sum(ll)

    def _fused_likelihood_kind(self):
        """(kind, dof) for the fused kernel's pointwise chain, or None when
        the likelihood is not fused-supported (ops/fused_elbo.py)."""
        from ..likelihoods import mono
        lik = self.likelihood
        if isinstance(lik, mono.NormalLikelihood):
            return ("normal", 0.0)
        if isinstance(lik, mono.LaplaceLikelihood):
            return ("laplace", 0.0)
        if isinstance(lik, mono.StudentTEv11Likelihood):
            return ("studentt_ev11", float(lik.dof))
        if isinstance(lik, mono.StudentTLikelihood):
            return ("studentt", float(lik.dof))
        if isinstance(lik, mono.NormalEv11Likelihood):
            return ("normal_ev11", 0.0)
        return None

    @staticmethod
    def _fused_ev11_scalars(kind, lik_params):
        """POST-softplus Ev11 scalars for the fused kernel (their grads
        flow back through this softplus), or None for plain kinds."""
        if not kind.endswith("_ev11"):
            return None
        return (jax.nn.softplus(lik_params["sdfac_raw"]),
                jax.nn.softplus(lik_params["sdadd_raw"]),
                jax.nn.softplus(lik_params["sdb_raw"]))

    def _fused_eligible(self, inputs: Inputs) -> bool:
        from ..scaling.image import HybridImageScaler
        from ..scaling.nn import MLPScaler
        # plans exist only on the single-device path; pallas_call is not
        # SPMD-partitionable, so sharded inputs always take the XLA path
        return (self.fused_kernel
                and not inputs.is_laue
                and inputs.plans is not None
                and self._fused_likelihood_kind() is not None
                and isinstance(self.scaler, (MLPScaler, HybridImageScaler)))

    # ------------------------------------------------------------------ init
    def init(self, key, inputs: Inputs, posterior_init: Tuple) -> dict:
        loc, scale = posterior_init
        lik_init = self.likelihood.init()
        params = {
            "posterior": self.posterior.init(loc, scale),
            "scaler": self.scaler.init(key, inputs.metadata.shape[-1]),
        }
        if lik_init:
            params["likelihood"] = lik_init
        if hasattr(self.prior, "init"):
            prior_init = self.prior.init()
            if prior_init:
                params["prior"] = prior_init
        return params

    def _built_prior(self, params: dict):
        """Priors with trainable parameters (double-Wilson r) implement a
        build(params) protocol; plain priors are used directly."""
        if hasattr(self.prior, "build"):
            return self.prior.build(params.get("prior", {}))
        return self.prior

    @property
    def metric_names(self) -> Tuple[str, ...]:
        extra = ()
        if hasattr(self.prior, "r_init"):
            extra = tuple(f"rDW_{i}"
                          for i in range(np.shape(self.prior.r_init)[0]))
        return ("loss", "NLL", "F KLDiv") + extra

    # --------------------------------------------------------------- forward
    def elbo(self, params: dict, key, inputs: Inputs) -> Tuple[Array, Dict]:
        """Negative ELBO (the loss) + metrics, one MC estimate."""
        if self._fused_eligible(inputs):
            return self._elbo_fused(params, key, inputs)
        k_f, k_s = jax.random.split(key)
        q = self.posterior.distribution(params["posterior"])
        z_f = q.sample(k_f, (self.mc_samples,))            # (S, n_refl)

        scale_dist = self.scaler.apply(params["scaler"], inputs)
        if (jax.default_backend() == "tpu" and inputs.plans is not None
                and hasattr(scale_dist, "loc")
                and hasattr(scale_dist, "scale")):
            # production TPU path: the (S, N) scale noise comes from the
            # in-kernel Pallas PRNG (~10x cheaper than threefry at 1M,
            # statistically gated by the BENCH prng probe); seeds are
            # key-derived so steps stay reproducible per (key, S)
            from ...ops.fused_elbo import prng_normal
            seed = jax.random.randint(k_s, (), 0, jnp.iinfo(jnp.int32).max)
            eps = jnp.stack([prng_normal(seed + 65537 * s, inputs.n_obs)
                             for s in range(self.mc_samples)])
            z_scale = scale_dist.loc + scale_dist.scale * eps
        else:
            z_scale = scale_dist.sample(k_s, (self.mc_samples,))  # (S, N)

        refl_plan = inputs.plans.refl if inputs.plans else None
        if self.mc_samples == 1:
            # flat (N,) chain: keeps the 1-D fast gather forwards engaged
            # AND avoids (1, N)-shaped pointwise ops, which XLA handles
            # ~25% slower than flat (benchmarks/PERF_NOTES.md)
            z_obs = plan_gather(z_f[0], inputs.refl_id, refl_plan)
            ipred = z_scale[0] * jnp.square(z_obs)            # (N,)
        else:
            z_obs = plan_gather(z_f, inputs.refl_id, refl_plan)
            ipred = z_scale * jnp.square(z_obs)               # (S, N)

        likelihood = self.likelihood.build(params.get("likelihood", {}), inputs)
        ll_total = self._masked_ll_sum(likelihood, ipred, inputs.mask)

        prior = self._built_prior(params)
        kl_sum, kl_mean = self._kl_terms(q, prior, z_f)

        if self.kl_weight is None:
            nll = -ll_total / self.mc_samples
            kl = kl_sum
            loss = nll + kl
        else:
            n_eff = (jnp.sum(inputs.mask) if inputs.mask is not None
                     else inputs.n_obs)
            nll = -ll_total / (self.mc_samples * n_eff)
            kl = kl_mean
            loss = nll + self.kl_weight * kl

        metrics = {"loss": loss, "NLL": nll, "F KLDiv": kl}
        if hasattr(prior, "metrics"):
            metrics.update(prior.metrics())
        return loss, metrics

    def _elbo_fused(self, params: dict, key, inputs: Inputs,
                    noise=None) -> Tuple[Array, Dict]:
        """Fused-kernel ELBO: the (N,)-sized likelihood chain runs in one
        Pallas kernel (ops/fused_elbo.py); sampling of z_F and the KL stay
        in XLA (n_refl-sized). mc_samples > 1 runs the kernel once per
        sample (unrolled: S is static and small) and averages."""
        from ...ops.fused_elbo import fused_likelihood_sum
        from ..scaling.image import HybridImageScaler

        k_f, k_s = jax.random.split(key)
        q = self.posterior.distribution(params["posterior"])
        z_f = q.sample(k_f, (self.mc_samples,))            # (S, n_refl)

        if isinstance(self.scaler, HybridImageScaler):
            mlp_dist = self.scaler.mlp.apply(params["scaler"]["mlp"], inputs)
            image_scales = self.scaler.image.scales(params["scaler"]["image"])
            image_id = inputs.image_id
        else:
            mlp_dist = self.scaler.apply(params["scaler"], inputs)
            image_scales = jnp.ones(1, jnp.float32)
            image_id = jnp.zeros_like(inputs.refl_id)

        plans = inputs.plans
        image_plan = (plans.image if plans is not None
                      and image_scales.shape[0] > 1 else None)
        on_tpu = jax.default_backend() == "tpu"
        ll_sum = 0.0
        for s in range(self.mc_samples):
            k_sample = jax.random.fold_in(k_s, s)
            seed = jax.random.randint(k_sample, (), 0,
                                      jnp.iinfo(jnp.int32).max)
            eps = noise
            if eps is None and not on_tpu:
                # interpret mode has no in-kernel PRNG; feed XLA eps
                eps = jax.random.normal(k_sample, (inputs.n_obs,),
                                        jnp.float32)
            kind, dof = self._fused_likelihood_kind()
            ll_sum = ll_sum + fused_likelihood_sum(
                mlp_dist.loc, mlp_dist.scale, image_scales, z_f[s],
                inputs.refl_id, image_id, inputs.intensities,
                inputs.uncertainties, inputs.mask, seed=seed, noise=eps,
                refl_plan=plans.refl if plans is not None else None,
                image_plan=image_plan, kind=kind, dof=dof,
                ev11=self._fused_ev11_scalars(
                    kind, params.get("likelihood", {})))
        ll_sum = ll_sum / self.mc_samples

        prior = self._built_prior(params)
        kl_sum, kl_mean = self._kl_terms(q, prior, z_f)

        if self.kl_weight is None:
            nll = -ll_sum
            kl = kl_sum
            loss = nll + kl
        else:
            n_eff = (jnp.sum(inputs.mask) if inputs.mask is not None
                     else inputs.n_obs)
            nll = -ll_sum / n_eff
            kl = kl_mean
            loss = nll + self.kl_weight * kl

        metrics = {"loss": loss, "NLL": nll, "F KLDiv": kl}
        if hasattr(prior, "metrics"):
            metrics.update(prior.metrics())
        return loss, metrics

    # ------------------------------------------------- sharded (shard_map)
    def elbo_sharded(self, params: dict, key, inputs: Inputs, mesh
                     ) -> Tuple[Array, Dict]:
        """Negative ELBO over mesh-sharded inputs via shard_map, keeping
        the per-shard gather plans (inputs.shard_plans) and the fused
        Pallas kernels alive — the XLA auto-SPMD fallback (plain `elbo` on
        sharded arrays) loses both (VERDICT round-2 Missing #2).

        Sharding layout (parallel/shard.py): per-row arrays split on the
        'obs' axis; z_f, the KL, and all parameters replicated. z_f and the
        per-row noise eps are sampled OUTSIDE the region with the same keys
        and global shapes as the unsharded elbo, so the result equals the
        1-device PLAN-FREE run on the same layout exactly
        (shard-invariance tests). Two statistical-only equivalences: the
        TPU fused kernel uses its in-kernel PRNG with stream-disjoint
        per-(sample, shard) seeds, and on TPU the PLANNED unsharded elbo
        also draws its scale noise from that generator — so sharded ==
        planned-unsharded holds bitwise on CPU and within MC noise on
        TPU."""
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P

        from ..scaling.image import HybridImageScaler
        from ..scaling.nn import MLPScaler

        fused = (self.fused_kernel and not inputs.is_laue
                 and inputs.shard_plans is not None
                 and self._fused_likelihood_kind() is not None
                 and isinstance(self.scaler, (MLPScaler, HybridImageScaler)))
        use_inkernel_prng = fused and jax.default_backend() == "tpu"

        k_f, k_s = jax.random.split(key)
        q = self.posterior.distribution(params["posterior"])
        z_f = q.sample(k_f, (self.mc_samples,))            # (S, n_refl)

        n = inputs.n_obs
        n_shards = mesh.devices.size
        if use_inkernel_prng:
            # (S, n_shards) dummy keeps the arg structure static; the
            # kernel PRNG generates the real eps in VMEM
            eps = jnp.zeros((self.mc_samples, n_shards), jnp.float32)
            seed = jax.random.randint(k_s, (), 0, jnp.iinfo(jnp.int32).max)
        else:
            # same key/shape as the unsharded Normal.sample -> bitwise
            # identical per-row noise regardless of device count
            eps = jax.random.normal(k_s, (self.mc_samples, n), jnp.float32)
            seed = jnp.int32(0)

        data = inputs._replace(plans=None, shard_plans=None)
        plans = inputs.shard_plans
        scaler_params = params["scaler"]
        lik_params = params.get("likelihood", {})

        def spec_rows(x):
            return P(*(("obs",) + (None,) * (np.ndim(x) - 1)))

        data_specs = jax.tree.map(spec_rows, data)
        plan_specs = jax.tree.map(spec_rows, plans)
        model = self
        mc = self.mc_samples

        def local_ll(scaler_params, lik_params, z_f, eps, seed, data, plans):
            # plan leaves arrive with a length-1 shard axis; strip it
            plans_local = jax.tree.map(lambda x: x[0], plans)
            local = data
            w = local.refl_id.shape[0]
            if local.is_laue:
                shard = lax.axis_index("obs")
                local = local._replace(
                    harmonic_id=local.harmonic_id
                    - (shard * w).astype(local.harmonic_id.dtype))
            local = local._replace(plans=plans_local)

            if fused:
                from ...ops.fused_elbo import fused_likelihood_sum
                if isinstance(model.scaler, HybridImageScaler):
                    mlp_dist = model.scaler.mlp.apply(
                        scaler_params["mlp"], local)
                    image_scales = model.scaler.image.scales(
                        scaler_params["image"])
                    image_id = local.image_id
                    image_plan = plans_local.image
                else:
                    mlp_dist = model.scaler.apply(scaler_params, local)
                    image_scales = jnp.ones(1, jnp.float32)
                    image_id = jnp.zeros_like(local.refl_id)
                    image_plan = None
                kind, dof = model._fused_likelihood_kind()
                ev11 = model._fused_ev11_scalars(kind, lik_params)
                ll_sum = 0.0
                for s in range(mc):
                    shard_seed = fused_shard_seed(
                        seed, s, lax.axis_index("obs"), mc)
                    ll_sum = ll_sum + fused_likelihood_sum(
                        mlp_dist.loc, mlp_dist.scale, image_scales, z_f[s],
                        local.refl_id, image_id, local.intensities,
                        local.uncertainties, local.mask,
                        seed=shard_seed,
                        noise=None if use_inkernel_prng else eps[s],
                        refl_plan=plans_local.refl, image_plan=image_plan,
                        kind=kind, dof=dof, ev11=ev11)
            else:
                scale_dist = model.scaler.apply(scaler_params, local)
                if mc == 1:
                    # flat (w,) chain — same rationale as the unsharded elbo
                    z_scale = scale_dist.loc + scale_dist.scale * eps[0]
                    z_obs = plan_gather(z_f[0], local.refl_id,
                                        plans_local.refl)
                else:
                    z_scale = scale_dist.loc + scale_dist.scale * eps
                    z_obs = plan_gather(z_f, local.refl_id, plans_local.refl)
                ipred = z_scale * jnp.square(z_obs)
                lik = model.likelihood.build(lik_params, local)
                ll_sum = model._masked_ll_sum(lik, ipred, local.mask)
            return (lax.psum(ll_sum, "obs"),
                    lax.psum(jnp.sum(local.mask), "obs"))

        # check_vma=False: the Pallas calls inside don't annotate varying
        # mesh axes on their out_shapes. Correctness doesn't rely on the
        # check: outputs are psum'ed (replicated) before leaving the
        # region, and the transpose of replicated in_specs is the psum of
        # per-shard cotangents either way (asserted numerically by the
        # shard-invariance tests).
        ll_sum, mask_sum = shard_map(
            local_ll, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, "obs"), P(), data_specs,
                      plan_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )(scaler_params, lik_params, z_f, eps, seed, data, plans)

        prior = self._built_prior(params)
        kl_sum, kl_mean = self._kl_terms(q, prior, z_f)
        if self.kl_weight is None:
            nll = -ll_sum / self.mc_samples
            kl = kl_sum
            loss = nll + kl
        else:
            nll = -ll_sum / (self.mc_samples * mask_sum)
            kl = kl_mean
            loss = nll + self.kl_weight * kl
        metrics = {"loss": loss, "NLL": nll, "F KLDiv": kl}
        if hasattr(prior, "metrics"):
            metrics.update(prior.metrics())
        return loss, metrics

    def elbo_mc_sharded(self, params: dict, key, inputs: Inputs, mesh
                        ) -> Tuple[Array, Dict]:
        """Negative ELBO with the MC-sample axis sharded over the mesh
        (SURVEY.md §5.8: "S independent samples are embarrassingly
        parallel; shard S for large-S or variance-reduction runs").

        Layout: observations replicated (single-device plans stay fully
        usable, including the Pallas kernels), z_f (S, n_refl) and the
        per-row noise (S, N) split on the sample axis; each device scores
        its S/D samples over the whole dataset and the sums psum over
        'mc'. Sampling uses the same keys/global shapes as the unsharded
        elbo, so the result is bitwise device-count invariant against the
        plan-free unsharded elbo (on TPU the PLANNED elbo swaps threefry
        for the in-kernel PRNG, making that comparison statistical)."""
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P

        from ..scaling.image import HybridImageScaler
        from ..scaling.nn import MLPScaler

        n_shards = mesh.devices.size
        if self.mc_samples % n_shards:
            raise ValueError(
                f"mc_samples={self.mc_samples} must divide evenly over "
                f"{n_shards} devices for MC-axis sharding")
        mc_local = self.mc_samples // n_shards
        fused = (self.fused_kernel and not inputs.is_laue
                 and inputs.plans is not None
                 and self._fused_likelihood_kind() is not None
                 and isinstance(self.scaler, (MLPScaler, HybridImageScaler)))
        use_inkernel_prng = fused and jax.default_backend() == "tpu"

        k_f, k_s = jax.random.split(key)
        q = self.posterior.distribution(params["posterior"])
        z_f = q.sample(k_f, (self.mc_samples,))            # (S, n_refl)
        if use_inkernel_prng:
            eps = jnp.zeros((self.mc_samples, 1), jnp.float32)
            seed = jax.random.randint(k_s, (), 0, jnp.iinfo(jnp.int32).max)
        else:
            eps = jax.random.normal(
                k_s, (self.mc_samples, inputs.n_obs), jnp.float32)
            seed = jnp.int32(0)

        data = inputs._replace(plans=None, shard_plans=None)
        plans = inputs.plans
        scaler_params = params["scaler"]
        lik_params = params.get("likelihood", {})
        model = self

        def local_ll(scaler_params, lik_params, z_f, eps, seed, data, plans):
            local = data._replace(plans=plans)
            if fused:
                from ...ops.fused_elbo import fused_likelihood_sum
                if isinstance(model.scaler, HybridImageScaler):
                    mlp_dist = model.scaler.mlp.apply(
                        scaler_params["mlp"], local)
                    image_scales = model.scaler.image.scales(
                        scaler_params["image"])
                    image_id = local.image_id
                    image_plan = (plans.image
                                  if image_scales.shape[0] > 1 else None)
                else:
                    mlp_dist = model.scaler.apply(scaler_params, local)
                    image_scales = jnp.ones(1, jnp.float32)
                    image_id = jnp.zeros_like(local.refl_id)
                    image_plan = None
                kind, dof = model._fused_likelihood_kind()
                ev11 = model._fused_ev11_scalars(kind, lik_params)
                ll_sum = 0.0
                for s in range(mc_local):
                    shard_seed = fused_shard_seed(
                        seed, s, lax.axis_index("mc"), mc_local)
                    ll_sum = ll_sum + fused_likelihood_sum(
                        mlp_dist.loc, mlp_dist.scale, image_scales, z_f[s],
                        local.refl_id, image_id, local.intensities,
                        local.uncertainties, local.mask,
                        seed=shard_seed,
                        noise=None if use_inkernel_prng else eps[s],
                        refl_plan=plans.refl if plans is not None else None,
                        image_plan=image_plan, kind=kind, dof=dof,
                        ev11=ev11)
            else:
                scale_dist = model.scaler.apply(scaler_params, local)
                refl_plan = plans.refl if plans is not None else None
                if mc_local == 1:
                    # flat (N,) chain — same rationale as the unsharded elbo
                    z_scale = scale_dist.loc + scale_dist.scale * eps[0]
                    z_obs = plan_gather(z_f[0], local.refl_id, refl_plan)
                else:
                    z_scale = scale_dist.loc + scale_dist.scale * eps
                    z_obs = plan_gather(z_f, local.refl_id, refl_plan)
                ipred = z_scale * jnp.square(z_obs)
                lik = model.likelihood.build(lik_params, local)
                ll_sum = model._masked_ll_sum(lik, ipred, local.mask)
            return lax.psum(ll_sum, "mc")

        ll_sum = shard_map(
            local_ll, mesh=mesh,
            in_specs=(P(), P(), P("mc"), P("mc"), P(),
                      jax.tree.map(lambda x: P(), data),
                      jax.tree.map(lambda x: P(), plans)),
            out_specs=P(),
            check_vma=False,
        )(scaler_params, lik_params, z_f, eps, seed, data, plans)

        prior = self._built_prior(params)
        kl_sum, kl_mean = self._kl_terms(q, prior, z_f)
        if self.kl_weight is None:
            nll = -ll_sum / self.mc_samples
            kl = kl_sum
            loss = nll + kl
        else:
            n_eff = (jnp.sum(inputs.mask) if inputs.mask is not None
                     else inputs.n_obs)
            nll = -ll_sum / (self.mc_samples * n_eff)
            kl = kl_mean
            loss = nll + self.kl_weight * kl
        metrics = {"loss": loss, "NLL": nll, "F KLDiv": kl}
        if hasattr(prior, "metrics"):
            metrics.update(prior.metrics())
        return loss, metrics

    def _kl_terms(self, q, prior, z_f) -> Tuple[Array, Array]:
        """(sum, mean) of the per-reflection KL(q||prior) estimate.

        MC path (reference variational.py:123-128): kl = q.log_prob(z) -
        prior.log_prob(z), averaged over the leading MC axis. Analytic path
        (--analytic-kl, Wilson priors only): -entropy(q) exactly plus the
        partially-closed-form cross entropy (priors/wilson.py
        expected_log_prob) — same expectation, lower variance.
        """
        if (self.analytic_kl and hasattr(prior, "expected_log_prob")
                and hasattr(q, "entropy")):
            kl_per = -q.entropy() - prior.expected_log_prob(q, z_f)
            return jnp.sum(kl_per), jnp.mean(kl_per)
        kl_term = q.log_prob(z_f) - prior.log_prob(z_f)
        n_mc = kl_term.shape[0] if kl_term.ndim > 1 else 1
        return jnp.sum(kl_term) / n_mc, jnp.mean(kl_term)

    def predict_ipred(self, params: dict, key, inputs: Inputs) -> Array:
        """The reference call() return value: per-observation Ipred samples."""
        k_f, k_s = jax.random.split(key)
        q = self.posterior.distribution(params["posterior"])
        z_f = q.sample(k_f, (self.mc_samples,))
        scale_dist = self.scaler.apply(params["scaler"], inputs)
        z_scale = scale_dist.sample(k_s, (self.mc_samples,))
        z_obs = plan_gather(z_f, inputs.refl_id,
                            inputs.plans.refl if inputs.plans else None)
        ipred = z_scale * jnp.square(z_obs)
        if inputs.mask is not None:
            ipred = ipred * inputs.mask
        return ipred

    # ---------------------------------------------------- posterior outputs
    def scale_mean_stddev(self, params: dict, inputs: Inputs):
        """Moments of the scale posterior; Laue: convolved over harmonics
        (reference variational.py:47-86)."""
        dist = self.scaler.apply(params["scaler"], inputs)
        mean, stddev = dist.mean(), dist.stddev()
        if inputs.is_laue:
            lik = self.likelihood.build({}, inputs)
            conv = lik.convolve if hasattr(lik, "convolve") else None
            if conv is not None:
                mean = conv(mean)
                stddev = jnp.sqrt(conv(jnp.square(stddev)))
        return mean, stddev

    def prediction_mean_stddev(self, params: dict, inputs: Inputs):
        """<I> and std(I) under the model (reference variational.py:88-121):
        <I> = <Sigma><F^2>; var(I) = <F^4><Sigma^2> - <I>^2."""
        q = self.posterior.distribution(params["posterior"])
        scale_dist = self.scaler.apply(params["scaler"], inputs)
        f2 = jnp.square(q.mean()) + jnp.square(q.stddev())
        iexp = scale_dist.mean() * f2[inputs.refl_id]
        f4 = q.moment_4()
        s2 = jnp.square(scale_dist.mean()) + jnp.square(scale_dist.stddev())
        ivar = f4[inputs.refl_id] * s2 - jnp.square(iexp)
        if inputs.is_laue:
            lik = self.likelihood.build({}, inputs)
            if hasattr(lik, "convolve"):
                iexp = lik.convolve(iexp)
                ivar = lik.convolve(ivar)
        return iexp, jnp.sqrt(ivar)


# ---------------------------------------------------------------------------
# Training engine
# ---------------------------------------------------------------------------
@dataclass(eq=False)
class Trainer:
    """scan-chunked full-batch trainer.

    Matches the reference's optimization dynamics exactly (Adam with
    beta2=0.99 by default, NaN-grads zeroed before the update, global grad
    norm tracked, early abort on non-finite norm) while running entire
    chunks of steps inside one XLA computation.
    """

    model: VariationalMergingModel
    learning_rate: float = 1e-3
    beta_1: float = 0.9
    beta_2: float = 0.99
    clipnorm: Optional[float] = None        # per-leaf norm clip (keras clipnorm)
    clipvalue: Optional[float] = None
    global_clipnorm: Optional[float] = None
    freeze: Tuple[str, ...] = ()            # param subtree names to freeze

    def optimizer(self) -> optax.GradientTransformation:
        # per-leaf clipnorm (keras semantics) must see the unflattened tree
        outer = []
        if self.clipnorm is not None:
            clipnorm = self.clipnorm

            def per_leaf_clip(updates):
                def clip_leaf(g):
                    norm = jnp.sqrt(jnp.sum(jnp.square(g)))
                    factor = jnp.minimum(1.0, clipnorm / (norm + 1e-20))
                    return g * factor
                return jax.tree.map(clip_leaf, updates)

            outer.append(optax.stateless(lambda u, p: per_leaf_clip(u)))
        # elementwise / global transforms + Adam are flatten-safe: run them
        # over one contiguous vector instead of dozens of small per-leaf
        # kernels (the per-leaf launch overhead dominates at these sizes)
        inner = []
        if self.clipvalue is not None:
            inner.append(optax.clip(self.clipvalue))
        if self.global_clipnorm is not None:
            inner.append(optax.clip_by_global_norm(self.global_clipnorm))
        inner.append(optax.adam(self.learning_rate, b1=self.beta_1,
                                b2=self.beta_2, eps=1e-7))  # keras eps default
        return optax.chain(*outer, optax.flatten(optax.chain(*inner)))

    # ------------------------------------------------------------------
    def make_step(self, mesh=None) -> Callable:
        """step((params, opt_state), key, inputs) — inputs are traced
        arguments, not baked constants, so large datasets neither bloat the
        executable nor lose their device sharding.

        mesh: when given AND the inputs carry per-shard plans, the forward/
        backward run through the shard_map fast path (elbo_sharded);
        otherwise the plain elbo (XLA auto-SPMD handles sharded arrays)."""
        model = self.model
        opt = self.optimizer()
        frozen = set(self.freeze)
        metric_keys = self.metric_keys

        def step(carry, key, inputs):
            from jax.flatten_util import ravel_pytree

            if mesh is not None and mesh.axis_names == ("mc",):
                elbo = partial(model.elbo_mc_sharded, mesh=mesh)
            elif mesh is not None and inputs.shard_plans is not None:
                elbo = partial(model.elbo_sharded, mesh=mesh)
            else:
                elbo = model.elbo
            params, opt_state = carry
            (loss, metrics), grads = jax.value_and_grad(
                elbo, has_aux=True)(params, key, inputs)
            if frozen:
                grads = {k: (jax.tree.map(jnp.zeros_like, v) if k in frozen
                             else v) for k, v in grads.items()}
            # the parameter pytree has ~dozens of small leaves; running the
            # norm/guard/Adam per-leaf costs more in kernel launches than in
            # FLOPs, so do all of it on one flattened vector
            flat_g, unravel = ravel_pytree(grads)
            grad_norm = jnp.sqrt(jnp.sum(jnp.square(flat_g)))
            # zero non-finite grads (reference variational.py:207-208)
            flat_g = jnp.where(jnp.isfinite(flat_g), flat_g, 0.0)
            updates, opt_state = opt.update(unravel(flat_g), opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["Grad Norm"] = grad_norm
            out = jnp.stack([metrics[k] for k in metric_keys])
            return (params, opt_state), out

        return step

    @property
    def metric_keys(self) -> Tuple[str, ...]:
        return self.model.metric_names + ("Grad Norm",)

    def train(self, params: dict, key, inputs: Inputs, steps: int,
              validation_data: Optional[Inputs] = None,
              validation_frequency: int = 10,
              progress: bool = True,
              message: Optional[str] = None,
              chunk_size: int = 100,
              mesh=None,
              checkpoint_path: Optional[str] = None,
              checkpoint_frequency: int = 0,
              resume_from: Optional[str] = None
              ) -> Tuple[dict, Dict[str, list]]:
        """Run `steps` optimization steps; returns (params, history).
        mesh: enables the shard_map fast path for mesh-sharded inputs with
        per-shard plans (see make_step).

        checkpoint_path/_frequency: save (params, opt state, step, history)
        every ~frequency steps; resume_from restores such a checkpoint and
        continues. Per-step PRNG keys are folded from the ABSOLUTE step
        index, so a resumed run reproduces the uninterrupted one exactly.
        """
        opt = self.optimizer()
        # run_chunk donates params/opt_state; copy so the caller's pytree
        # survives (and so opt_state starts device-resident)
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        opt_state = opt.init(params)
        start_step = 0
        resumed_history = None
        if resume_from is not None:
            from ...utils.checkpoint import load_state
            params, opt_state, start_step, resumed_history = load_state(
                resume_from, params, opt_state)
        # host-resident inputs would be re-transferred on EVERY chunk call
        # (jit transfers uncommitted arrays per dispatch); move them to the
        # device once. Arrays that are already jax.Arrays (e.g. mesh-sharded
        # inputs) are left exactly where they are.
        def _to_device(x):
            return x if x is None or isinstance(x, jax.Array) \
                else jax.device_put(x)
        inputs = jax.tree.map(_to_device, inputs,
                              is_leaf=lambda x: x is None)
        if validation_data is not None:
            validation_data = jax.tree.map(_to_device, validation_data,
                                           is_leaf=lambda x: x is None)
        step = self.make_step(mesh)

        if validation_data is not None:
            chunk_size = validation_frequency
            val_scale = inputs.n_obs / validation_data.n_obs

            @jax.jit
            def val_nll(params, key, val_inputs):
                _, m = self.model.elbo(params, key, val_inputs)
                return m["NLL"]

        # donate params/opt_state: they are dead after each chunk, so XLA
        # updates them in place instead of copying
        @partial(jax.jit, donate_argnums=(0, 1))
        def run_chunk(params, opt_state, keys, inputs):
            (params, opt_state), metrics = jax.lax.scan(
                lambda c, k: step(c, k, inputs), (params, opt_state), keys)
            return params, opt_state, metrics

        metric_keys = self.metric_keys
        history: Dict[str, list] = {k: [] for k in metric_keys}
        if validation_data is not None:
            history["NLL_val"] = []
        if resumed_history is not None:
            # align to THIS run's metric set and to start_step: the
            # checkpointed run may have had a different metric set (e.g.
            # validation on/off) or an abort-truncated history — ragged
            # lists would crash the history DataFrame after training
            for k in history:
                v = list(resumed_history.get(k, ()))[:start_step]
                history[k] = v + [float("nan")] * (start_step - len(v))

        from tqdm import tqdm
        bar = tqdm(total=steps, initial=start_step, desc=message,
                   disable=not progress)
        done = start_step
        last_ckpt = start_step
        key_base = key
        aborted = False
        while done < steps and not aborted:
            n = min(chunk_size, steps - done)
            if validation_data is not None:
                # evaluate BEFORE the chunk: the reference computes NLL_val
                # at step i % k == 0 and repeats it for the next k-1 steps
                # (reference variational.py:257-260)
                v = float(val_nll(params, jax.random.fold_in(
                    key_base, 2**30 + done), validation_data))
                history["NLL_val"].extend([val_scale * v] * n)
            keys = jax.vmap(
                lambda i: jax.random.fold_in(key_base, i))(
                    jnp.arange(done, done + n))
            params, opt_state, metrics = run_chunk(params, opt_state, keys,
                                                   inputs)
            metrics = np.asarray(metrics)  # (n, len(metric_keys))
            for j, k in enumerate(metric_keys):
                history[k].extend(metrics[:, j].tolist())
            done += n
            bar.update(n)
            bar.set_postfix({k: f"{history[k][-1]:0.2e}" for k in history})
            if not np.isfinite(metrics[:, metric_keys.index("Grad Norm")]).all():
                print("Encountered numerical issues, terminating optimization early!")
                # truncate history at the first bad step
                bad = int(np.argmax(~np.isfinite(
                    metrics[:, metric_keys.index("Grad Norm")])))
                n_keep = done - n + bad + 1
                for k in history:
                    history[k] = history[k][:n_keep]
                aborted = True
            # never checkpoint an aborted (non-finite) state: the previous
            # healthy checkpoint stays the resume point
            if (checkpoint_path and checkpoint_frequency > 0 and not aborted
                    and (done - last_ckpt >= checkpoint_frequency
                         or done >= steps)):
                from ...utils.checkpoint import save_state
                save_state(checkpoint_path, params, opt_state, done, history)
                last_ckpt = done
        bar.close()
        return params, history
