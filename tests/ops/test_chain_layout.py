"""Harmonic-chain layout (ops/chain_layout.py + ChainGatherPlan).

The chain layout renumbers reflections so each harmonic chain's members
hold consecutive ids, letting the Laue refl gather run the windowed kernel
in both directions (see benchmarks/PERF_NOTES.md round-5). These tests pin
the graph/permutation invariants and the numerical equality of the planned
gather against plain indexing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.models.base import Inputs
from careless_tpu.ops.chain_layout import (chain_labels, chain_permutation,
                                           chain_row_order)
from careless_tpu.ops.plan_gather import (ChainGatherPlan,
                                          make_chain_gather_plan,
                                          plan_gather)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _chain_problem(rng, n_refl=600, n_groups=900, max_chain=4):
    """Random chain-structured Laue rows: reflections partitioned into
    chains over a SHUFFLED id space; each group observes a prefix of one
    chain (the harmonic-multiples-of-one-ray structure, utils/laue.py)."""
    ids = rng.permutation(n_refl)
    chains, i = [], 0
    while i < n_refl:
        ln = int(rng.integers(1, max_chain + 1))
        chains.append(ids[i:i + ln])
        i += ln
    rows_refl, rows_hid = [], []
    for g in range(n_groups):
        c = chains[rng.integers(len(chains))]
        for m in range(int(rng.integers(1, len(c) + 1))):
            rows_refl.append(c[m])
            rows_hid.append(g)
    refl_id = np.asarray(rows_refl)
    hid = np.asarray(rows_hid)
    n = len(refl_id)
    return refl_id, hid, n


def test_chain_labels_components():
    # groups {0,5}, {5,9}, {2,7}: components {0,5,9} -> 0, {2,7} -> 2,
    # singletons keep their own label
    refl = np.array([0, 5, 5, 9, 2, 7, 4])
    hid = np.array([0, 0, 1, 1, 2, 2, 3])
    lab = chain_labels(refl, hid, 10)
    assert lab[0] == lab[5] == lab[9] == 0
    assert lab[2] == lab[7] == 2
    assert lab[4] == 4 and lab[1] == 1 and lab[3] == 3


def test_chain_permutation_is_permutation_and_row_order_free(rng):
    refl_id, hid, n = _chain_problem(rng)
    sigma, sigma_inv = chain_permutation(refl_id, hid, 600)
    assert np.array_equal(np.sort(sigma), np.arange(600))
    assert np.array_equal(sigma[sigma_inv], np.arange(600))
    # deterministic in the data: a row shuffle must not change it
    order = rng.permutation(n)
    sigma2, _ = chain_permutation(refl_id[order], hid[order], 600)
    assert np.array_equal(sigma, sigma2)
    # chain members are consecutive in the new id space
    lab = chain_labels(refl_id, hid, 600)
    new_lab = lab[sigma]  # chain label along new-id order
    changes = np.flatnonzero(np.diff(new_lab) != 0)
    # each label appears in exactly one contiguous run
    assert len(np.unique(new_lab)) == len(changes) + 1


def test_chain_row_order_groups_contiguous_and_quasi_sorted(rng):
    refl_id, hid, n = _chain_problem(rng)
    order = chain_row_order(refl_id, hid, 600)
    h = hid[order]
    # groups contiguous
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    assert len(starts) == len(np.unique(hid))
    # quasi-sorted: renumbered ids have bounded displacement from sorted
    _, sigma_inv = chain_permutation(refl_id, hid, 600)
    local = sigma_inv[refl_id][order]
    perm = np.argsort(local, kind="stable")
    disp = np.abs(perm - np.arange(n))
    # bound: no chain's total observation count is anywhere near n/4
    assert disp.max() < n // 4


def _pack_inputs(refl_id, hid, rng):
    n = len(refl_id)
    n_groups = int(hid.max()) + 1
    per_group = rng.normal(10, 1, n_groups).astype(np.float32)
    iobs = np.concatenate([per_group, np.ones(n - n_groups, np.float32)])
    sig = np.concatenate([np.abs(rng.normal(1, .1, n_groups)),
                          np.ones(n - n_groups)]).astype(np.float32)
    return Inputs.from_arrays(
        refl_id, rng.integers(0, 13, n), np.zeros(n),
        rng.normal(size=(n, 3)).astype(np.float32), iobs, sig,
        wavelength=np.ones(n, np.float32), harmonic_id=hid)


def test_sorted_by_harmonic_chain_repacks_groups(rng):
    refl_id, hid, n = _chain_problem(rng)
    inp = _pack_inputs(refl_id, hid, rng)
    cs = inp.sorted_by_harmonic(600)
    h = np.asarray(cs.harmonic_id)
    n_groups = int(hid.max()) + 1
    # dense renumbered groups, contiguous runs (first-appearance
    # renumbering makes the sorted-run sequence exactly nondecreasing)
    assert h.min() == 0 and h.max() == n_groups - 1
    assert np.all(np.diff(h) >= 0)
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    assert len(starts) == n_groups
    # each new group's packed intensity equals its old group's: match
    # groups by their (multiset of) reflection ids
    old_members = {g: frozenset() for g in range(n_groups)}
    for r, g in zip(refl_id, hid):
        old_members[g] = old_members[g] | {int(r)}
    old_by_members = {}
    for g, m in old_members.items():
        old_by_members.setdefault(m, []).append(g)
    iobs_old = np.asarray(inp.intensities)
    iobs_new = np.asarray(cs.intensities)
    rid_new = np.asarray(cs.refl_id)
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else n
        members = frozenset(int(r) for r in rid_new[s:e])
        candidates = old_by_members[members]
        assert any(np.isclose(iobs_new[j], iobs_old[g]) for g in candidates)


def test_sorted_by_harmonic_chain_preserves_elbo(rng):
    """The chain re-layout must not change the model's loss beyond MC
    noise assignment: same groups, same per-group intensities, same
    reflections — only order. Checked exactly with the per-row noise
    neutralized (convolved scale moments), plus finite losses on both."""
    from tests.models.test_variational import make_model, synthetic_inputs
    from careless_tpu.models.likelihoods import laue as laue_lik
    inputs, n_refl, n_images = synthetic_inputs(rng, laue=True)
    model, params = make_model(inputs, n_refl, n_images,
                               laue_lik.NormalLikelihood(), "hybrid")
    key = jax.random.PRNGKey(3)
    legacy = inputs.sorted_by_harmonic()
    chain = inputs.sorted_by_harmonic(n_refl)
    l1, _ = jax.jit(model.elbo)(params, key, legacy)
    l2, _ = jax.jit(model.elbo)(params, key, chain)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # group-level convolved-moment multisets must match exactly
    m1, _ = model.scale_mean_stddev(params, legacy)
    m2, _ = model.scale_mean_stddev(params, chain)
    np.testing.assert_allclose(np.sort(np.asarray(m1)),
                               np.sort(np.asarray(m2)), rtol=1e-5)


def test_chain_gather_plan_matches_take(rng):
    refl_id, hid, n = _chain_problem(rng)
    inp = _pack_inputs(refl_id, hid, rng)
    cs = inp.sorted_by_harmonic(600)
    plan = make_chain_gather_plan(cs.refl_id, cs.harmonic_id, 600)
    assert isinstance(plan, ChainGatherPlan)
    table = rng.normal(size=600).astype(np.float32)
    ids = np.asarray(cs.refl_id)
    out = np.asarray(plan_gather(jnp.asarray(table), jnp.asarray(ids), plan))
    np.testing.assert_allclose(out, table[ids], rtol=1e-4, atol=1e-5)
    # gradient: scatter-add transpose
    ct = rng.normal(size=len(ids)).astype(np.float32)

    def loss(t):
        return jnp.sum(plan_gather(t, jnp.asarray(ids), plan)
                       * jnp.asarray(ct))
    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(table)))
    gref = np.zeros(600, np.float32)
    np.add.at(gref, ids, ct)
    np.testing.assert_allclose(g, gref, rtol=1e-3, atol=1e-4)
    # batched table (mc_samples > 1)
    tb = rng.normal(size=(2, 600)).astype(np.float32)
    outb = np.asarray(plan_gather(jnp.asarray(tb), jnp.asarray(ids), plan))
    np.testing.assert_allclose(outb, tb[:, ids], rtol=1e-4, atol=1e-5)


def test_with_plans_attaches_chain_plan_on_chain_layout(rng):
    refl_id, hid, n = _chain_problem(rng)
    inp = _pack_inputs(refl_id, hid, rng)
    cs = inp.sorted_by_harmonic(600).with_plans(600, 13)
    assert isinstance(cs.plans.refl, ChainGatherPlan)


def test_sorted_by_harmonic_falls_back_with_mask(rng):
    refl_id, hid, n = _chain_problem(rng)
    inp = _pack_inputs(refl_id, hid, rng)
    inp = inp._replace(mask=np.ones(n, np.float32))
    legacy = inp.sorted_by_harmonic(600)  # mask present -> legacy order
    assert np.array_equal(np.asarray(legacy.harmonic_id),
                          np.sort(hid))


def test_windows_survive_partial_last_tile(rng):
    """Regression (round 5): _plan_windows padded partial tiles with id 0,
    making the last tile span the whole table on sorted layouts whose ids
    end high — the windowed kernel was silently disqualified."""
    from careless_tpu.ops.plan_gather import _plan_windows
    ids = np.sort(rng.integers(0, 60_000, 200_000)).astype(np.int32)
    _, _, w = _plan_windows(ids, 60_000, True, warn=False)
    assert w > 0
    # quasi-sorted (chain-like) layout: small local scrambles
    q = ids.copy()
    q[1::97], q[0::97] = ids[0::97][:len(q[1::97])], \
        ids[1::97][:len(q[0::97])]
    _, _, w2 = _plan_windows(q, 60_000, False, warn=False)
    assert w2 > 0


def test_stream_perm_plan_engages_past_vmem_cap(rng, monkeypatch):
    """When the observation axis outgrows the windowed kernel's VMEM table
    cap, the chain plan's backward permute switches to the STREAMING
    kernel variant (per-tile window DMA) instead of falling back to the
    sort (measured 3.7 vs 35.1 ms at 10M obs on v5e). Forced here by
    shrinking the cap; interpret mode routes the stream kernel through
    the plain windowed kernel, so values stay exact."""
    import careless_tpu.ops.plan_gather as pg

    refl_id, hid, n = _chain_problem(rng)
    inp = _pack_inputs(refl_id, hid, rng)
    cs = inp.sorted_by_harmonic(600)
    monkeypatch.setattr(pg, "MAX_TABLE_ROWS", 8)  # force rows > cap
    plan = pg.make_chain_gather_plan(cs.refl_id, cs.harmonic_id, 600)
    assert plan is not None and plan.inner.perm_plan is not None
    assert plan.inner.perm_plan.stream
    table = rng.normal(size=600).astype(np.float32)
    ids = np.asarray(cs.refl_id)
    ct = rng.normal(size=len(ids)).astype(np.float32)

    def loss(t):
        return jnp.sum(plan_gather(t, jnp.asarray(ids), plan)
                       * jnp.asarray(ct))
    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(table)))
    gref = np.zeros(600, np.float32)
    np.add.at(gref, ids, ct)
    np.testing.assert_allclose(g, gref, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="streaming DMA kernel is TPU-only (interpret "
                           "mode routes through the plain windowed kernel)")
def test_stream_kernel_exact_on_hardware(rng):
    """The HBM-streaming windowed gather must be bit-exact against numpy
    indexing on real hardware (the CPU mesh exercises only its interpret
    fallback; the 8-sublane DMA alignment bug faulted the TPU worker and
    was invisible off-hardware)."""
    from careless_tpu.ops.plan_gather import _plan_windows
    from careless_tpu.ops.table_gather import windowed_gather_stream

    n = 300_000
    perm = np.arange(n, dtype=np.int64)
    for off in (3, 17, 111):
        i = np.arange(0, n - off, off * 13)
        perm[i], perm[i + off] = perm[i + off].copy(), perm[i].copy()
    ids2d, bases, w = _plan_windows(perm.astype(np.int32), n, False,
                                    warn=False, max_chunks=160,
                                    max_rows=1 << 20)
    assert w > 0
    x = rng.normal(size=n).astype(np.float32)
    out = np.asarray(windowed_gather_stream(
        jnp.asarray(x), jnp.asarray(ids2d), jnp.asarray(bases), w)[:n])
    np.testing.assert_array_equal(out, x[perm])
