"""Benchmark: ELBO training throughput of the variational merging model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload: a serial-crystallography-scale synthetic mono merge (1M
observations, 50k unique reflections, reference-default 20x10 MLP scaler +
per-image scales, 1 MC sample) — the scale of BASELINE.json config 5
("millions of reflections").

BUDGET-AWARE (round-3 lesson: the full grid outgrew the driver's timeout
and BENCH_r03.json recorded nothing): configs run in priority order under a
wall-clock budget (env BENCH_BUDGET_S, default 420 s). The headline configs
always run; long-tail configs are skipped once the budget would be exceeded
and their names are recorded in the JSON's "skipped" field. A SIGTERM from
an outer `timeout` prints the partial JSON before exiting, so a too-tight
outer limit still yields an artifact.

Core timed configurations, all the same model math on the same device:

  fused    — scan-chunked trainer with the fused Pallas likelihood kernel
             (the production TPU path: --fused-kernel=auto on TPU)
  unfused  — scan-chunked trainer, plain XLA elbo
  ref_style— one jitted step per host call with per-step metric readback:
             a faithful re-creation of the reference's execution model
             (/root/reference/careless/models/merging/variational.py:255-270;
             TF/TFP is not installed here, so the reference itself cannot
             run — this isolates the dispatch model, not TF kernel quality)

vs_baseline = fused steps/s / ref_style steps/s (dispatch-model ablation —
labeled as such; the true TF baseline is unmeasurable in this environment,
see BASELINE.md).

Speed-of-light: max(HBM-bound, MXU-issue-bound) time for the pipeline AS
BUILT (see roofline() and benchmarks/PERF_NOTES.md for the measured
per-component budget). The fused path keeps trunk activations and the
likelihood chain in VMEM, so its HBM bytes are the packed-metadata /
trunk in-out buffers plus ~4 N-sized chain arrays; its binding resource
is the trunk's MXU matmul ISSUE rate (rows x layers x 4, 128x128 MACs
per row — precision-independent, measured peak ~110 TF on v5e).
sol_utilization_pct = sol_time / measured_time * 100.
"""
import json
import signal
import sys
import time

import numpy as np

# HBM peak bandwidth per chip, GB/s (public TPU specs; used only for the
# utilization estimate — unknown kinds report null)
HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5": 2765.0,      # v5p
    "TPU v5p": 2765.0,
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5e": 819.0,
    "TPU v6e": 1640.0,     # Trillium
    "TPU v6 lite": 1640.0,
}


def build_problem(n_obs, n_refl, n_images=2000, d_meta=10, seed=0,
                  fused=False, mlp_dtype="float32", mlp_width=10,
                  laue=False, likelihood="normal", plans=True):
    import jax

    from careless_tpu.models.base import Inputs
    from careless_tpu.models.likelihoods import laue as laue_lik
    from careless_tpu.models.likelihoods import mono as mono_lik
    from careless_tpu.models.merging.surrogate import TruncatedNormalPosterior
    from careless_tpu.models.merging.variational import (Trainer,
                                                         VariationalMergingModel)
    from careless_tpu.models.priors.wilson import WilsonPrior
    from careless_tpu.models.scaling.image import HybridImageScaler, ImageScaler
    from careless_tpu.models.scaling.nn import MLPScaler

    rng = np.random.default_rng(seed)
    refl_id = rng.integers(0, n_refl, n_obs)
    image_id = rng.integers(0, n_images, n_obs)
    kwargs = {}
    if laue:
        # Harmonic-chain structure mirroring real pink-beam Laue data
        # (BASELINE config 3): reflections partition into harmonic chains
        # (multiples of one primitive ray — utils/laue.py
        # expand_harmonics), and each group observes a PREFIX of one
        # chain's members on one image. Ids are assigned over a shuffled
        # table (real refl ids are HKL-ordered, chain members scattered),
        # so nothing is pre-localized for the chain layout
        # (ops/chain_layout.py) being benchmarked.
        perm_ids = rng.permutation(n_refl).astype(np.int64)
        clens = rng.choice([1, 2, 3, 4], size=n_refl,
                           p=[0.5, 0.25, 0.15, 0.10])
        csum = np.cumsum(clens)
        clens = clens[csum <= n_refl]
        rem = n_refl - int(clens.sum())
        if rem:
            clens = np.append(clens, rem)
        n_chains = len(clens)
        chain_start = np.concatenate([[0], np.cumsum(clens)[:-1]])
        # groups until the row budget is filled; trim at a group boundary
        # and top up with singleton groups to land exactly on n_obs
        est = int(n_obs / 1.4 * 1.05) + 8
        gc = rng.integers(0, n_chains, est)
        gl = 1 + (rng.random(est) * clens[gc]).astype(np.int64)
        k = int(np.searchsorted(np.cumsum(gl), n_obs, side="right"))
        gc, gl = gc[:k], gl[:k]
        fill = n_obs - (int(gl.sum()) if k else 0)
        if fill:
            gc = np.concatenate([gc, rng.integers(0, n_chains, fill)])
            gl = np.concatenate([gl, np.ones(fill, np.int64)])
        n_groups = len(gl)
        hid = np.repeat(np.arange(n_groups), gl)
        row_start = np.repeat(np.concatenate([[0], np.cumsum(gl)[:-1]]), gl)
        member = np.arange(n_obs) - row_start
        refl_id = perm_ids[np.repeat(chain_start[gc], gl) + member]
        image_id = rng.integers(0, n_images, n_groups)[hid]
    metadata = rng.normal(size=(n_obs, d_meta)).astype(np.float32)
    f_true = np.abs(rng.normal(1.0, 0.5, n_refl)) + 0.05
    scale_true = np.exp(0.2 * metadata[:, 0])
    iobs = scale_true * f_true[refl_id] ** 2
    iobs = iobs + 0.1 * np.sqrt(np.abs(iobs)) * rng.normal(size=n_obs)
    sig = np.full(n_obs, 0.1, np.float32)
    if laue:
        grouped = np.zeros(n_groups, np.float32)
        np.add.at(grouped, hid, iobs.astype(np.float32))
        iobs = np.concatenate([grouped,
                               np.ones(n_obs - n_groups, np.float32)])
        kwargs = dict(wavelength=np.ones(n_obs, np.float32), harmonic_id=hid)
    inputs = Inputs.from_arrays(refl_id, image_id, np.zeros(n_obs), metadata,
                                iobs, sig, **kwargs)
    # production training path: sorted rows + gather plans
    if plans:
        inputs = (inputs.sorted_by_harmonic(n_refl) if laue
                  else inputs.sorted_by_refl())
        inputs = inputs.with_plans(n_refl, n_images, mlp_width=mlp_width)

    lik_mod = laue_lik if laue else mono_lik
    if likelihood == "studentt":
        lik = lik_mod.StudentTLikelihood(16.0)
    elif likelihood == "ev11":
        lik = lik_mod.NormalEv11Likelihood()
    else:
        lik = lik_mod.NormalLikelihood()

    centric = rng.random(n_refl) < 0.2
    prior = WilsonPrior(centric, np.ones(n_refl, np.float32))
    posterior = TruncatedNormalPosterior(
        low=(1e-32 * ~centric).astype(np.float32))
    # reference defaults (args/scaling.py:21-31), width configurable
    mlp = MLPScaler(20, mlp_width, mlp_dtype=mlp_dtype)
    scaler = HybridImageScaler(mlp, ImageScaler(n_images))
    model = VariationalMergingModel(posterior, prior, lik,
                                    scaler, mc_samples=1, fused_kernel=fused)
    params = model.init(jax.random.PRNGKey(seed), inputs,
                        (np.asarray(prior.mean()), np.asarray(prior.stddev())))
    trainer = Trainer(model)
    return model, params, trainer, inputs


def _device_inputs(inputs):
    import jax
    return jax.tree.map(
        lambda x: x if x is None or isinstance(x, jax.Array)
        else jax.device_put(x), inputs, is_leaf=lambda x: x is None)


def bench_scan(trainer, params, inputs, steps, chunk, mesh=None):
    """scan-chunked trainer (the careless-tpu architecture); mesh routes
    the step through the shard_map fast path (per-shard plans)."""
    import jax

    inputs = _device_inputs(inputs)
    opt = trainer.optimizer()
    opt_state = opt.init(params)
    step = trainer.make_step(mesh)

    @jax.jit
    def run_chunk(params, opt_state, keys, inputs):
        (params, opt_state), metrics = jax.lax.scan(
            lambda c, k: step(c, k, inputs), (params, opt_state), keys)
        return params, opt_state, metrics

    key = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(np.arange(chunk))
    # warmup/compile; float() readback is the only reliable completion sync
    # through the device tunnel (block_until_ready has been observed
    # returning before remote completion, letting warmup execution bleed
    # into the timed region — see benchmarks/PERF_NOTES.md)
    p, o, m = run_chunk(params, opt_state, keys, inputs)
    # second warmup from the OUTPUT carry: under a mesh, returned params
    # carry GSPMD shardings that differ from the host-fresh warmup inputs,
    # and timing from the first output would charge a recompile
    p, o, m = run_chunk(p, o, keys, inputs)
    float(m[-1, 0])
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        p, o, m = run_chunk(p, o, keys, inputs)
        done += chunk
    float(m[-1, 0])
    dt = time.perf_counter() - t0
    return steps / dt


def bench_reference_style(trainer, params, inputs, steps):
    """Reference execution model: one step per host call, per-step metric
    readback (float() on every metric, like the tqdm postfix loop)."""
    import jax

    inputs = _device_inputs(inputs)
    opt = trainer.optimizer()
    opt_state = opt.init(params)
    step = trainer.make_step()

    @jax.jit
    def one(params, opt_state, key, inputs):
        return step((params, opt_state), key, inputs)

    key = jax.random.PRNGKey(0)
    (p, o), m = one(params, opt_state, jax.random.fold_in(key, 0), inputs)
    float(m[0])
    t0 = time.perf_counter()
    for i in range(steps):
        (p, o), m = one(p, o, jax.random.fold_in(key, i), inputs)
        _ = [float(x) for x in np.asarray(m)]  # per-step host sync
    dt = time.perf_counter() - t0
    return steps / dt


# measured practical matmul peak (benchmarks/mxu_probe.py): identical for
# f32 and bf16 operands — big XLA matmuls top out here
MEASURED_PEAK_TFLOPS = {"TPU v5 lite": 110.0, "TPU v5e": 110.0}


def _lookup(table, device_kind):
    for k, v in table.items():
        if device_kind.lower().startswith(k.lower()):
            return v
    return table.get(device_kind)


def roofline(n_obs, d_meta, mlp_layers, mlp_width, fused, device_kind):
    """Speed-of-light step time (s) as max(HBM-bound, MXU-bound), modeling
    the pipeline AS BUILT (benchmarks/PERF_NOTES.md has the measured
    per-component budget backing this).

    HBM: the fused path keeps activations in VMEM — its traffic is the
    packed metadata buffer (read in fwd AND in the recompute backward),
    the trunk's out/dy/dx packed buffers, the unpack/head N-sized passes,
    and the likelihood chain's in/out (~4 N-sized f32 arrays vs ~12
    unfused). The old model charged the fused path with 4*L*w spilled
    activation passes it does not perform, overstating sol bytes ~10x.

    MXU: the trunk issues rows x layers matmul rows forward and 3x that
    backward (recompute + dW + dx), 128x128 MACs per row — at width 10
    the block-diagonal lane packing makes this the step's binding
    resource (issue-bound; precision-independent).
    """
    d_slot = max(d_meta, mlp_width)
    group = max(1, 128 // d_slot)
    packed_rows = -(-n_obs // group)
    essential = n_obs * (12 + 8)
    if fused:
        packed = packed_rows * 128 * 4
        # x2d fwd+bwd reads, y2d write, dy read, dx write; the head is
        # folded into the kernel and loc/scale leave as flat (N,) arrays
        trunk_traffic = 5 * packed
        head = 4 * 4 * n_obs                # flat loc/raw extraction fwd/bwd
        chain = 4 * 4 * n_obs
        mlp_bytes = trunk_traffic + head
    else:
        mlp_bytes = 4 * mlp_layers * mlp_width * 4 * n_obs
        chain = 12 * 4 * n_obs
    bytes_per_step = essential + mlp_bytes + chain

    bw = _lookup(HBM_GBPS, device_kind)
    sol_hbm = bytes_per_step / (bw * 1e9) if bw else None

    peak = _lookup(MEASURED_PEAK_TFLOPS, device_kind)
    if peak:
        # fwd + 3x bwd over mlp_layers + 1 (the folded head layer)
        issue_rows = packed_rows * (mlp_layers + 1) * 4
        sol_mxu = issue_rows * 128 * 128 * 2 / (peak * 1e12)
    else:
        sol_mxu = None
    sols = [s for s in (sol_hbm, sol_mxu) if s is not None]
    return bytes_per_step, (max(sols) if sols else None), sol_hbm, sol_mxu


_RESULT = {"metric": "observations_per_s_per_chip_1M_obs", "value": None,
           "unit": "obs/s", "vs_baseline": None}
_EMITTED = False


def _emit(partial: bool = False) -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if partial:
        _RESULT["partial"] = True
    print(json.dumps(_RESULT), flush=True)


def _on_term(signum, frame):
    # an outer `timeout` fired before the budget: salvage what we have
    _emit(partial=True)
    sys.exit(0)


def main():
    import os

    import jax

    signal.signal(signal.SIGTERM, _on_term)

    quick = "--quick" in sys.argv
    budget = float(os.environ.get("BENCH_BUDGET_S", "240" if quick else "420"))
    t_start = time.perf_counter()

    def left():
        return budget - (time.perf_counter() - t_start)

    n_obs = 50_000 if quick else 1_000_000
    n_refl = 5_000 if quick else 50_000
    steps = 200 if quick else 500
    chunk = 100 if quick else 250
    ref_steps = 20 if quick else 100

    on_tpu = jax.default_backend() == "tpu"
    device_kind = jax.devices()[0].device_kind
    # registered in _RESULT up front (mutated in place) so the SIGTERM
    # salvage path emits every measurement completed so far
    skipped = _RESULT["skipped"] = []
    results = _RESULT["elbo_steps_per_s"] = {}

    def run(name, est_s, fn, always=False):
        """Run one timed config if the budget allows; never let one config's
        failure lose the whole artifact."""
        if not always and left() < est_s:
            skipped.append(name)
            return None
        try:
            v = fn()
        except Exception as e:  # pragma: no cover - artifact resilience
            _RESULT.setdefault("errors", {})[name] = repr(e)[:200]
            return None
        if v is not None:
            results[name] = round(v, 2)
        return v

    # -------------------------------------------------- headline configs
    # (always run: without these the artifact is useless)
    if on_tpu:
        def _fused():
            _, p, t, i = build_problem(n_obs, n_refl, fused=True)
            return bench_scan(t, p, i, steps, chunk)
        fused = run("fused", 0, _fused, always=True)
    else:
        fused = None  # interpret mode would measure the interpreter

    def _build_unfused():
        return build_problem(n_obs, n_refl)

    def _ref():
        _, p, t, i = _build_unfused()
        return bench_reference_style(t, p, i, ref_steps)
    ref = run("ref_dispatch", 0, _ref, always=True)

    # ------------------------------------------------- long-tail configs
    # (priority order; est_s ~ compile + run cost on the real chip)
    def _unfused():
        _, p, t, i = _build_unfused()
        return bench_scan(t, p, i, steps, chunk)
    unfused = run("unfused", 75, _unfused)

    if on_tpu and not quick:
        # BASELINE config 5 scale: 10M observations / 500k reflections /
        # 20k images (serial crystallography) — the headline scale row
        # (VERDICT r4 Missing #1: it must make the driver artifact), so it
        # runs right after the 1M headline, always
        def _big():
            _, p, t, i = build_problem(10_000_000, 500_000,
                                       n_images=20_000, fused=True)
            return bench_scan(t, p, i, 60, 30)
        run("fused_10M_obs", 0, _big, always=True)

    # BASELINE config 3: Laue (poly) on the production planned path
    # (chain-layout windowed refl gather + run-aligned convolution)
    laue_steps = max(steps // 2, 100)

    def _laue(plans=True, n_steps=None):
        def f():
            ns = n_steps or laue_steps
            _, p, t, i = build_problem(n_obs, n_refl, laue=True, plans=plans)
            # chunk must not exceed ns: bench_scan runs whole chunks, so a
            # larger chunk would run more steps than it divides by
            return bench_scan(t, p, i, ns, min(chunk, ns))
        return f
    run("laue_planned", 90, _laue(plans=True))

    if on_tpu:
        # in-kernel PRNG statistical gate, visible in artifacts (the
        # TPU-only pytest is always skipped on the CPU test mesh). Always:
        # the production XLA-chain elbo now draws its scale noise from
        # this generator (variational.elbo), so the gate must not be
        # budget-skippable.
        def _probe():
            from careless_tpu.ops.fused_elbo import prng_normal_probe
            eps = np.asarray(jax.jit(prng_normal_probe, static_argnums=1)(
                123, 4096), np.float64)
            m1, sd = float(eps.mean()), float(eps.std())
            z = (eps - m1) / sd
            kurt = float(np.mean(z ** 4))
            _RESULT["prng_probe"] = {
                "n": int(eps.size), "mean": round(m1, 5),
                "std": round(sd, 5), "kurtosis": round(kurt, 4),
                "max_abs": round(float(np.abs(eps).max()), 3),
                "ok": bool(abs(m1) < 0.01 and abs(sd - 1) < 0.01
                           and abs(kurt - 3) < 0.06),
            }
            return None
        run("prng_probe", 0, _probe, always=True)

    # the slow side of the Laue planned-vs-XLA ratio: short (the XLA
    # scatter path is ~60x slower per step, so 50 steps suffice)
    run("laue_xla", 90, _laue(plans=False, n_steps=50))

    if on_tpu:
        # mc_samples=2: the fused kernel's measured niche (auto selects it
        # here, benchmarks/fused_sweep.py: 238 vs 175 steps/s) — ahead of
        # the confirmatory likelihood variants, it evidences the dispatch
        # policy
        def _mc2():
            from dataclasses import replace

            from careless_tpu.models.merging.variational import Trainer
            model, _, _, i = build_problem(n_obs, n_refl, fused=True)
            model = replace(model, mc_samples=2)
            p = model.init(jax.random.PRNGKey(0), i,
                           (np.asarray(model.prior.mean()),
                            np.asarray(model.prior.stddev())))
            return bench_scan(Trainer(model), p, i, steps // 2, chunk)
        run("fused_mc2", 60, _mc2)

        # BASELINE config 2 flavor: Student-t likelihood, fused
        def _studentt():
            _, p, t, i = build_problem(n_obs, n_refl, fused=True,
                                       likelihood="studentt")
            return bench_scan(t, p, i, steps // 2, chunk)
        run("fused_studentt", 60, _studentt)

        # --refine-uncertainties (Ev11) on the fused path
        def _ev11():
            _, p, t, i = build_problem(n_obs, n_refl, fused=True,
                                       likelihood="ev11")
            return bench_scan(t, p, i, steps // 2, chunk)
        run("fused_ev11", 60, _ev11)

        # ---- skippable tail (diagnostic configs; headline never needs them)
        # shard_map scale-out on a 1-device mesh: per-shard plans + fused
        # kernels hold speed under sharding on real hardware
        def _sharded():
            from careless_tpu.parallel.shard import shard_inputs_over_mesh
            _, p, t, i = build_problem(n_obs, n_refl, fused=True, plans=False)
            i_sh, mesh = shard_inputs_over_mesh(
                i, 1, n_refl=n_refl, n_images=2000, mlp_width=10)
            return bench_scan(t, p, i_sh, steps // 2, chunk, mesh=mesh)
        run("sharded_1dev", 75, _sharded)

        def _bf16():
            _, p, t, i = build_problem(n_obs, n_refl, fused=True,
                                       mlp_dtype="bfloat16")
            return bench_scan(t, p, i, steps, chunk)
        run("fused_bf16_mlp", 75, _bf16)

    # ------------------------------------------------------------ summary
    # headline: best production configuration on the reference-default
    # 20x10 MLP mono-Normal workload
    candidates = [v for k, v in results.items()
                  if k in ("fused", "unfused", "fused_bf16_mlp")]
    best = max(candidates) if candidates else None
    # speed-of-light = max(HBM-bound, MXU-issue-bound) for the as-built
    # fused pipeline (see roofline docstring + benchmarks/PERF_NOTES.md);
    # quoted for the f32 fused config only
    _, sol_t, sol_hbm, sol_mxu = roofline(n_obs, 10, 20, 10,
                                          fused is not None, device_kind)
    util = (round(100 * sol_t * fused, 1)
            if sol_t is not None and fused is not None else None)
    if sol_hbm is not None:
        _RESULT["sol_ms"] = {
            "hbm": round(sol_hbm * 1e3, 3),
            "mxu_issue": (None if sol_mxu is None
                          else round(sol_mxu * 1e3, 3)),
            # without a measured MXU peak for this device kind the binding
            # resource is unknown (the fused step is issue-bound, so
            # defaulting to 'hbm' would overstate utilization)
            "binding": ("mxu_issue" if sol_mxu and sol_mxu > sol_hbm
                        else ("hbm" if sol_mxu is not None else "unknown")),
        }

    if "fused_10M_obs" in results:
        # BASELINE config-5 scale in obs/s (the serial-crystallography row)
        _RESULT["obs_per_s_10M"] = round(results["fused_10M_obs"] * 1e7, 0)
    _RESULT.update({
        "value": None if best is None else round(best * n_obs, 0),
        # dispatch-model ablation vs the reference's per-step host loop on
        # the SAME device — the TF/TFP reference itself is not installable
        # here (see BASELINE.md)
        "vs_baseline": (None if best is None or not ref
                        else round(best / ref, 2)),
        "elbo_steps_per_s": results,
        "fused_speedup_vs_unfused": (
            None if fused is None or unfused is None
            else round(fused / unfused, 2)),
        # measured step time vs max(HBM, MXU-issue) speed-of-light for the
        # as-built pipeline (sol_ms has the components)
        "sol_utilization_pct": util if sol_mxu is not None else None,
        "skipped": skipped,
        "budget_s": budget,
        "elapsed_s": round(time.perf_counter() - t_start, 1),
        "device_kind": device_kind,
        "n_obs": n_obs,
        "n_refl": n_refl,
    })
    _emit()


if __name__ == "__main__":
    main()
