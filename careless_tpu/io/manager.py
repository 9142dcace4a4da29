"""DataManager: the hub between formatted inputs, model construction, and
merged outputs.

Reference behavior: /root/reference/careless/io/manager.py — Wilson sigma(B)
= exp(-B/4d^2), prior construction, the model factory (mono/laue x
normal/studentT x plain/Ev11 likelihood, Wilson vs double-Wilson prior,
posterior init from prior moments with centric low=0 / acentric low=1e-32,
scaler selection with exp-or-softplus bijector and sigma(I) shift), the
crossvalidation splitters (by-reflection, by-image, Laue-aware with
harmonic_id renumbering + intensity repacking), and the output writers
(merged F/SigF with I from moments and redundancy N; per-observation
prediction tables).
"""
from __future__ import annotations

import pickle
from typing import Iterator, Optional, Tuple

import numpy as np

from ..models.base import Inputs
from ..models.likelihoods import laue as laue_likelihoods
from ..models.likelihoods import mono as mono_likelihoods
from ..models.merging.surrogate import TruncatedNormalPosterior
from ..models.merging.variational import Trainer, VariationalMergingModel
from ..models.priors.wilson import WilsonPrior
from ..models.scaling.image import (HybridImageScaler, ImageScaler,
                                    NeuralImageScaler)
from ..models.scaling.nn import MLPScaler
from ..xtal import DataSet
from .asu import ReciprocalASUCollection

# MTZ dtypes for output columns
_RESULT_DTYPES = {"H": "H", "K": "H", "L": "H", "F": "F", "SigF": "Q",
                  "I": "J", "SigI": "Q", "N": "R",
                  "high": "R", "loc": "R", "low": "R", "scale": "R"}
_PRED_DTYPES = {"H": "H", "K": "H", "L": "H", "asu_id": "I", "image_id": "I",
                "file_id": "I", "test": "I", "Iobs": "J", "SigIobs": "Q",
                "Ipred": "J", "SigIpred": "Q", "Scale": "J", "SigScale": "Q"}


class DataManager:
    def __init__(self, inputs: Inputs, asu_collection: ReciprocalASUCollection,
                 parser=None):
        self.inputs = inputs
        self.asu_collection = asu_collection
        self.parser = parser
        self.rng = np.random.default_rng(
            getattr(parser, "seed", None) if parser is not None else None)

    # ------------------------------------------------------------- pickling
    @classmethod
    def from_pickle(cls, filename: str) -> "DataManager":
        with open(filename, "rb") as f:
            return pickle.load(f)

    def to_pickle(self, filename: str) -> None:
        with open(filename, "wb") as f:
            pickle.dump(self, f)

    # ----------------------------------------------------------- table sizes
    @property
    def n_refl(self) -> int:
        """Global posterior-table size (= ASU-collection length)."""
        return len(np.asarray(self.asu_collection.centric))

    @property
    def n_images(self) -> int:
        """Global image-table size. Parameter tables (ImageScaler) are built
        from the FULL dataset, so gather plans for any subset must use this,
        not the subset's own max image id."""
        return int(np.max(np.asarray(self.inputs.image_id))) + 1

    @property
    def mlp_width(self) -> int:
        """Scaling-MLP hidden width (reference manager.py:446-448: the
        --mlp-width flag, defaulting to the metadata dimension). Used to
        pre-pack metadata into the fused-trunk lane layout."""
        width = (self.parser.mlp_width if self.parser is not None
                 else None)
        return int(width) if width is not None \
            else int(self.inputs.metadata.shape[-1])

    # ---------------------------------------------------------- wilson prior
    @staticmethod
    def wilson_sigma(b: float, dHKL: np.ndarray) -> np.ndarray:
        return np.exp(-0.25 * b / (dHKL * dHKL))

    def get_wilson_sigma(self, b: Optional[float] = None):
        if b is None:
            return 1.0
        return self.wilson_sigma(b, self.asu_collection.dHKL)

    def get_wilson_prior(self, b: Optional[float] = None, k: float = 1.0
                         ) -> WilsonPrior:
        sigma = self.get_wilson_sigma(b) * k
        return WilsonPrior(
            np.asarray(self.asu_collection.centric),
            np.asarray(self.asu_collection.multiplicity, np.float32),
            np.float32(sigma) if np.isscalar(sigma) else sigma.astype(np.float32),
        )

    # ------------------------------------------------------------ factories
    def build_model(self, parser=None, prior=None, likelihood=None,
                    scaler=None, mc_sample_size=None
                    ) -> Tuple[VariationalMergingModel, dict, Trainer]:
        """Build (model, initial params, trainer) from parsed flags
        (reference manager.py:380-507)."""
        import jax

        parser = parser or self.parser
        if parser is None:
            raise ValueError("No parser supplied, but self.parser is unset")
        laue = self.inputs.is_laue
        lik_mod = laue_likelihoods if laue else mono_likelihoods

        if prior is None:
            if getattr(parser, "parents", None) is not None:
                from ..models.priors.double_wilson import build_double_wilson_prior
                prior = build_double_wilson_prior(self, parser)
            else:
                prior = self.get_wilson_prior(parser.wilson_prior_b)

        loc = np.asarray(prior.mean())
        scale = np.asarray(prior.stddev()) * parser.structure_factor_init_scale
        low = (1e-32 * ~np.asarray(self.asu_collection.centric)).astype(np.float32)
        posterior = TruncatedNormalPosterior(low=low, high=1e10,
                                             scale_shift=parser.epsilon)

        if likelihood is None:
            dof = parser.studentt_likelihood_dof
            if parser.refine_uncertainties:
                likelihood = (lik_mod.StudentTEv11Likelihood(dof) if dof is not None
                              else lik_mod.NormalEv11Likelihood())
            else:
                likelihood = (lik_mod.StudentTLikelihood(dof) if dof is not None
                              else lik_mod.NormalLikelihood())

        if scaler is None:
            mlp_width = parser.mlp_width
            if mlp_width is None:
                mlp_width = self.inputs.metadata.shape[-1]
            bijector = parser.scale_bijector.lower()
            if bijector == "softplus":
                istd = float(np.std(np.asarray(self.inputs.intensities)))
            elif bijector == "exp":
                istd = None
            else:
                raise ValueError(
                    f"Unsupported scale bijector type, {parser.scale_bijector}")
            mlp = MLPScaler(parser.mlp_layers, mlp_width,
                            epsilon=parser.epsilon, scale_bijector=bijector,
                            scale_multiplier=istd,
                            mlp_dtype=getattr(parser, "mlp_dtype", "float32"))
            n_images = self.n_images
            if parser.image_layers > 0:
                scaler = NeuralImageScaler(parser.image_layers, n_images, mlp)
            elif parser.use_image_scales:
                scaler = HybridImageScaler(mlp, ImageScaler(n_images))
            else:
                scaler = mlp

        # dispatch policy (benchmarks/fused_sweep.py, PERF_NOTES round-5):
        # at mc=1 the plain XLA chain beats the fused likelihood kernel at
        # every size post-head-fold (322 vs 311 steps/s at 1M), but at
        # mc_samples > 1 on large N the kernel wins decisively (mc=2: 238
        # vs 175 — the XLA path materializes (S, N) intermediates while
        # the kernel re-runs flat per sample with in-kernel PRNG). 'auto'
        # selects accordingly; 'on'/'off' force it.
        fused_flag = getattr(parser, "fused_kernel", "auto")
        mc = mc_sample_size or parser.mc_samples
        if fused_flag == "auto":
            fused = mc > 1 and self.inputs.n_obs >= 500_000
        else:
            fused = fused_flag == "on"

        model = VariationalMergingModel(
            posterior=posterior, prior=prior, likelihood=likelihood,
            scaler=scaler,
            mc_samples=mc_sample_size or parser.mc_samples,
            kl_weight=parser.kl_weight,
            fused_kernel=fused,
            analytic_kl=getattr(parser, "analytic_kl", False))

        key = jax.random.PRNGKey(getattr(parser, "seed", 1234) or 1234)
        params = model.init(key, self.inputs, (loc, scale))

        freeze = []
        if getattr(parser, "freeze_scales", False):
            freeze.append("scaler")
        if getattr(parser, "freeze_structure_factors", False):
            freeze.append("posterior")
        trainer = Trainer(
            model,
            learning_rate=parser.learning_rate,
            beta_1=parser.beta_1,
            beta_2=parser.beta_2,
            clipnorm=parser.clipnorm,
            clipvalue=parser.clipvalue,
            global_clipnorm=parser.global_clipnorm,
            freeze=tuple(freeze),
        )
        return model, params, trainer

    # ------------------------------------------------------------ splitting
    def split_mono_data_by_mask(self, test_idx: np.ndarray
                                ) -> Tuple[Inputs, Inputs]:
        return self.inputs.select(~test_idx), self.inputs.select(test_idx)

    def split_laue_data_by_mask(self, test_idx: np.ndarray
                                ) -> Tuple[Inputs, Inputs]:
        """Split Laue inputs, renumbering harmonic_id and repacking the
        group-compressed intensities (reference manager.py:299-343)."""
        harmonic_id = np.asarray(self.inputs.harmonic_id)
        isect = np.intersect1d(harmonic_id[test_idx], harmonic_id[~test_idx])
        if len(isect) > 0:
            raise ValueError(
                f"test_idx splits harmonic observations with harmonic_id : {isect}")

        def split(inputs: Inputs, idx: np.ndarray) -> Inputs:
            hid = np.asarray(inputs.harmonic_id)
            uni, inv = np.unique(hid[idx], return_inverse=True)
            n_rows = int(idx.sum())

            def repack(v):
                v = np.asarray(v)[uni]
                return np.pad(v, (0, n_rows - len(v)), constant_values=1.0)

            return Inputs.from_arrays(
                refl_id=np.asarray(inputs.refl_id)[idx],
                image_id=np.asarray(inputs.image_id)[idx],
                file_id=np.asarray(inputs.file_id)[idx],
                metadata=np.asarray(inputs.metadata)[idx],
                intensities=repack(inputs.intensities),
                uncertainties=repack(inputs.uncertainties),
                wavelength=np.asarray(inputs.wavelength)[idx],
                harmonic_id=inv,
            )

        return split(self.inputs, ~test_idx), split(self.inputs, test_idx)

    def split_data_by_refl(self, test_fraction: float = 0.5
                           ) -> Tuple[Inputs, Inputs]:
        if self.inputs.is_laue:
            harmonic_id = np.asarray(self.inputs.harmonic_id)
            test_idx = (self.rng.random(harmonic_id.max() + 1)
                        <= test_fraction)[harmonic_id]
            return self.split_laue_data_by_mask(test_idx)
        test_idx = self.rng.random(self.inputs.n_obs) <= test_fraction
        return self.split_mono_data_by_mask(test_idx)

    def split_data_by_image(self, test_fraction: float = 0.5
                            ) -> Tuple[Inputs, Inputs]:
        image_id = np.asarray(self.inputs.image_id)
        test_idx = self.rng.random(image_id.max() + 1) <= test_fraction
        if not test_idx.any():
            test_idx[0] = True
        elif test_idx.all():
            test_idx[0] = False
        test_idx = test_idx[image_id]
        if self.inputs.is_laue:
            return self.split_laue_data_by_mask(test_idx)
        return self.split_mono_data_by_mask(test_idx)

    # --------------------------------------------------------------- output
    def get_results(self, posterior_dist, inputs: Optional[Inputs] = None,
                    output_parameters: bool = True,
                    max_intensity_snr: float = 1e-5) -> Tuple[DataSet, ...]:
        """Merged per-ASU outputs (reference manager.py:164-250)."""
        if inputs is None:
            inputs = self.inputs
        F = np.asarray(posterior_dist.mean())
        SigF = np.asarray(posterior_dist.stddev())
        I = SigF * SigF + F * F
        f4 = np.asarray(posterior_dist.moment_4())
        ivar = np.square(I * max_intensity_snr)
        ivar = np.maximum(ivar, f4 - I * I)
        SigI = np.sqrt(ivar)

        params = None
        if output_parameters:
            d = posterior_dist
            params = {
                "high": np.broadcast_to(np.float32(d.high), F.shape).astype(np.float32),
                "loc": np.asarray(d.loc, np.float32),
                "low": np.broadcast_to(np.asarray(d.low, np.float32), F.shape),
                "scale": np.asarray(d.scale, np.float32),
            }

        asu_id, H = self.asu_collection.to_asu_id_and_miller_index(
            np.arange(len(F)))
        refl_id = np.asarray(inputs.refl_id)
        N = np.bincount(refl_id, minlength=len(F)).astype(np.float32)

        results = ()
        for i, asu in enumerate(self.asu_collection):
            idx = asu_id == i
            cols = {
                "H": H[idx, 0].astype(np.int32),
                "K": H[idx, 1].astype(np.int32),
                "L": H[idx, 2].astype(np.int32),
                "F": F[idx].astype(np.float32),
                "SigF": SigF[idx].astype(np.float32),
                "I": I[idx].astype(np.float32),
                "SigI": SigI[idx].astype(np.float32),
                "N": N[idx],
            }
            if params is not None:
                for key in sorted(params):
                    cols[key] = params[key][idx]
            output = DataSet(cols, cell=asu.cell, spacegroup=asu.spacegroup,
                             mtz_dtypes=dict(_RESULT_DTYPES))
            output = output[output["N"] > 0]
            output = DataSet(output, cell=asu.cell, spacegroup=asu.spacegroup,
                             mtz_dtypes=dict(_RESULT_DTYPES))
            if asu.anomalous:
                output = _unstack_anomalous(output, asu)
            results += (output,)
        return results

    def get_predictions(self, model: VariationalMergingModel, params: dict,
                        inputs: Optional[Inputs] = None, test_value: int = 0
                        ) -> Iterator[DataSet]:
        """Per-observation prediction tables (reference manager.py:89-161),
        harmonic-deduplicated for Laue."""
        if inputs is None:
            inputs = self.inputs
        laue = inputs.is_laue
        refl_id = np.asarray(inputs.refl_id)
        asu_id, H = self.asu_collection.to_asu_id_and_miller_index(refl_id)
        file_id = np.asarray(inputs.file_id)
        image_id = np.asarray(inputs.image_id)
        if laue:
            harmonic_id = np.asarray(inputs.harmonic_id)
        else:
            harmonic_id = np.arange(len(refl_id))

        _, first_idx = np.unique(harmonic_id, return_index=True)

        iobs = np.asarray(inputs.intensities)
        sig_iobs = np.asarray(inputs.uncertainties)
        ipred, sigipred = model.prediction_mean_stddev(params, inputs)
        scale, sigscale = model.scale_mean_stddev(params, inputs)
        ipred, sigipred = np.asarray(ipred), np.asarray(sigipred)
        scale, sigscale = np.asarray(scale), np.asarray(sigscale)

        num = len(first_idx)
        cols = {
            "H": H[first_idx, 0].astype(np.int32),
            "K": H[first_idx, 1].astype(np.int32),
            "L": H[first_idx, 2].astype(np.int32),
            "asu_id": asu_id[first_idx].astype(np.int32),
            "image_id": image_id[first_idx].astype(np.int32),
            "file_id": file_id[first_idx].astype(np.int32),
            "test": np.full(num, test_value, np.int32),
            "Iobs": iobs[:num].astype(np.float32),
            "SigIobs": sig_iobs[:num].astype(np.float32),
            "Ipred": ipred[:num].astype(np.float32),
            "SigIpred": sigipred[:num].astype(np.float32),
            "Scale": scale[:num].astype(np.float32),
            "SigScale": sigscale[:num].astype(np.float32),
        }
        table = DataSet(cols, mtz_dtypes=dict(_PRED_DTYPES))
        for i, rasu in enumerate(self.asu_collection):
            idx = table["asu_id"] == i
            result = DataSet(table[idx], cell=rasu.cell,
                             spacegroup=rasu.spacegroup,
                             mtz_dtypes=dict(_PRED_DTYPES))
            yield result


def _unstack_anomalous(ds: DataSet, asu) -> DataSet:
    """Friedel-separated table -> two-column (+/-) format with PHENIX column
    order (reference manager.py:238-247 + rs unstack_anomalous semantics).
    Centric reflections appear only in the (+) columns."""
    import pandas as pd

    hkl = ds[["H", "K", "L"]].to_numpy(np.int64)
    plus_hkl, fminus = asu.spacegroup.map_to_asu(hkl, anomalous=False)
    is_minus = np.any(hkl != plus_hkl, axis=1)

    value_cols = [c for c in ds.columns if c not in ("H", "K", "L")]
    base = pd.DataFrame({
        "H": plus_hkl[:, 0], "K": plus_hkl[:, 1], "L": plus_hkl[:, 2]})
    for c in value_cols:
        base[c] = ds[c].to_numpy()
    plus = base[~is_minus].set_index(["H", "K", "L"])
    minus = base[is_minus].set_index(["H", "K", "L"])
    plus = plus.rename(columns={c: f"{c}(+)" for c in value_cols})
    minus = minus.rename(columns={c: f"{c}(-)" for c in value_cols})
    joined = plus.join(minus, how="outer").reset_index()

    anom_keys = ["F(+)", "SigF(+)", "F(-)", "SigF(-)",
                 "I(+)", "SigI(+)", "I(-)", "SigI(-)", "N(+)", "N(-)"]
    ordered = (["H", "K", "L"] + [k for k in anom_keys if k in joined]
               + [k for k in joined.columns
                  if k not in anom_keys + ["H", "K", "L"]])
    joined = joined[ordered]

    mtz_dtypes = {"H": "H", "K": "H", "L": "H"}
    for c in joined.columns:
        if c in ("H", "K", "L"):
            continue
        root = c.replace("(+)", "").replace("(-)", "")
        base_t = _RESULT_DTYPES.get(root, "R")
        if "(" in c:
            if base_t == "F":
                base_t = "G"
            elif base_t == "J":
                base_t = "K"
            elif base_t == "Q":
                base_t = "M" if root in ("SigI",) else "L"
        mtz_dtypes[c] = base_t
    return DataSet(joined, cell=ds.cell, spacegroup=ds.spacegroup,
                   mtz_dtypes=mtz_dtypes)
