"""Planned gather: forward/backward parity vs plain XLA take, for the
sorted (windowed Pallas kernel, identity backward permute), unsorted
(full-table window / permuted segment-sum), and fallback paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.ops.plan_gather import (GatherPlan, make_gather_plan,
                                          plan_gather, segment_sum_by_plan)


def ref_gather(table, ids):
    return jnp.take(table, ids, axis=-1)


@pytest.mark.parametrize("n,t,sort", [
    (1000, 97, True),       # sorted, tight windows
    (1000, 97, False),      # unsorted small table -> full-table window
    (20_000, 3_000, True),  # bigger, multi-tile
    (20_000, 3_000, False),
    (777, 5, True),         # tiny table
])
def test_forward_backward_parity(n, t, sort, rng):
    ids = np.sort(rng.integers(0, t, n)) if sort else rng.integers(0, t, n)
    ids = ids.astype(np.int32)
    table = rng.normal(size=t).astype(np.float32)
    ct_weights = rng.normal(size=n).astype(np.float32)
    plan = make_gather_plan(ids, t)
    if sort:
        assert plan.perm is None  # identity permute skipped

    out = plan_gather(jnp.asarray(table), jnp.asarray(ids), plan)
    np.testing.assert_array_equal(np.asarray(out), table[ids])

    def f_plan(tab):
        return jnp.sum(plan_gather(tab, jnp.asarray(ids), plan)
                       * ct_weights)

    def f_ref(tab):
        return jnp.sum(ref_gather(tab, jnp.asarray(ids)) * ct_weights)

    g_plan = jax.grad(f_plan)(jnp.asarray(table))
    g_ref = jax.grad(f_ref)(jnp.asarray(table))
    # cumsum-difference vs scatter-add differ in f32 reduction order; the
    # two-level chunked cumsum bounds the error (see segment_sum_by_plan)
    np.testing.assert_allclose(np.asarray(g_plan), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_windowed_kernel_engages_for_sorted_ids(rng):
    ids = np.sort(rng.integers(0, 5000, 30_000)).astype(np.int32)
    plan = make_gather_plan(ids, 5000)
    assert plan.window > 0 and plan.ids2d is not None
    # windows are tight: ~(8192/redundancy)/128 chunks, not the whole table
    assert plan.window <= 16 < 5000 // 128


def test_fallback_for_large_unsorted_table(rng):
    ids = rng.integers(0, 3_000_000, 1000).astype(np.int32)
    plan = make_gather_plan(ids, 3_000_000)
    assert plan.window == 0  # no kernel; XLA take + permuted segment-sum
    table = rng.normal(size=3_000_000).astype(np.float32)
    out = plan_gather(jnp.asarray(table), jnp.asarray(ids), plan)
    np.testing.assert_array_equal(np.asarray(out), table[ids])


def test_batched_table_uses_fallback(rng):
    ids = np.sort(rng.integers(0, 50, 400)).astype(np.int32)
    plan = make_gather_plan(ids, 50)
    table = rng.normal(size=(3, 50)).astype(np.float32)
    out = plan_gather(jnp.asarray(table), jnp.asarray(ids), plan)
    np.testing.assert_array_equal(np.asarray(out), table[:, ids])
    g = jax.grad(lambda t: jnp.sum(plan_gather(t, jnp.asarray(ids), plan)))(
        jnp.asarray(table))
    expect = np.zeros((3, 50), np.float32)
    np.add.at(expect[0], ids, 1.0)
    expect[1] = expect[0]
    expect[2] = expect[0]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)


def test_histogram_backward_engages_for_small_unsorted_table(rng):
    """Unsorted ids into a small table take the one-hot-matmul backward.
    Error bound is relative to each segment's conditioning sum(|ct|):
    ~3e-4 on the TPU MXU (bf16 two-term split), ~1e-6 on CPU (f32 dot)."""
    n, t = 50_000, 2048
    ids = rng.integers(0, t, n).astype(np.int32)
    plan = make_gather_plan(ids, t)
    assert plan.hist
    ct = rng.normal(size=n).astype(np.float32) * 10.0
    table = jnp.asarray(rng.normal(size=t).astype(np.float32))
    g = jax.grad(lambda tab: jnp.sum(
        plan_gather(tab, jnp.asarray(ids), plan) * ct))(table)
    expect = np.bincount(ids, weights=ct.astype(np.float64), minlength=t)
    cond = np.bincount(ids, weights=np.abs(ct).astype(np.float64),
                       minlength=t) + 1e-6
    rel = np.abs(np.asarray(g, np.float64) - expect) / cond
    bound = 1e-3 if jax.default_backend() == "tpu" else 1e-5
    assert rel.max() < bound, rel.max()


def test_segment_sum_matches_bincount(rng):
    for sort in (True, False):
        ids = rng.integers(0, 70, 5000).astype(np.int32)
        if sort:
            ids = np.sort(ids)
        v = rng.normal(size=5000).astype(np.float32)
        plan = make_gather_plan(ids, 70)
        out = np.asarray(segment_sum_by_plan(jnp.asarray(v), plan))
        expect = np.bincount(ids, weights=v.astype(np.float64), minlength=70)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_empty_and_missing_ids(rng):
    # table entries never referenced get zero gradient
    ids = np.sort(np.array([0, 0, 3, 3, 3], np.int32))
    plan = make_gather_plan(ids, 6)
    table = jnp.arange(6.0)
    g = jax.grad(lambda t: jnp.sum(plan_gather(t, jnp.asarray(ids), plan)))(
        table)
    np.testing.assert_array_equal(np.asarray(g), [2, 0, 0, 3, 0, 0])


def test_plans_are_jit_safe_pytrees(rng):
    """Plans cross the jit boundary inside Inputs (window stays static)."""
    ids = np.sort(rng.integers(0, 40, 600)).astype(np.int32)
    plan = make_gather_plan(ids, 40)
    table = jnp.asarray(rng.normal(size=40).astype(np.float32))

    @jax.jit
    def f(tab, p):
        return jnp.sum(plan_gather(tab, jnp.asarray(ids), p))

    a = float(f(table, plan))
    b = float(jnp.sum(jnp.take(table, jnp.asarray(ids))))
    np.testing.assert_allclose(a, b, rtol=1e-5)


# ---------------------------------------------------------------------------
# plan_convolve: the planned duplicate-index scatter-add (Laue harmonic
# convolution, models/likelihoods/laue.py)
# ---------------------------------------------------------------------------
from careless_tpu.ops.plan_gather import plan_convolve  # noqa: E402


@pytest.mark.parametrize("sort", [True, False])
def test_plan_convolve_forward_parity(sort, rng):
    n = 4000
    ids = rng.integers(0, n // 3, n)  # group ids < n (same-length table)
    if sort:
        ids = np.sort(ids)
    ids = ids.astype(np.int32)
    v = rng.normal(size=n).astype(np.float32)
    plan = make_gather_plan(ids, n)
    out = np.asarray(plan_convolve(jnp.asarray(v), jnp.asarray(ids), plan))
    expect = np.zeros(n, np.float64)
    np.add.at(expect, ids, v.astype(np.float64))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
    # fallback (no plan) must agree too
    out0 = np.asarray(plan_convolve(jnp.asarray(v), jnp.asarray(ids), None))
    np.testing.assert_allclose(out0, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sort", [True, False])
def test_plan_convolve_gradient_parity(sort, rng):
    """Backward = gather of the cotangent by ids (windowed kernel when the
    plan has windows); must match the autodiff of the XLA scatter-add."""
    n = 2000
    ids = rng.integers(0, n // 2, n)
    if sort:
        ids = np.sort(ids)
    ids = ids.astype(np.int32)
    v = jnp.asarray(rng.normal(size=n).astype(np.float32))
    w = jnp.asarray(rng.normal(size=n).astype(np.float32))
    plan = make_gather_plan(ids, n)

    def f_plan(val):
        return jnp.sum(plan_convolve(val, jnp.asarray(ids), plan) * w)

    def f_ref(val):
        return jnp.sum(jnp.zeros_like(val).at[jnp.asarray(ids)].add(val) * w)

    g_plan = np.asarray(jax.grad(f_plan)(v))
    g_ref = np.asarray(jax.grad(f_ref)(v))
    np.testing.assert_allclose(g_plan, g_ref, rtol=1e-5, atol=1e-5)


def test_plan_convolve_batched(rng):
    n = 1024
    ids = np.sort(rng.integers(0, n // 4, n)).astype(np.int32)
    v = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    plan = make_gather_plan(ids, n)
    out = np.asarray(plan_convolve(v, jnp.asarray(ids), plan))
    for s in range(3):
        expect = np.zeros(n, np.float64)
        np.add.at(expect, ids, np.asarray(v[s], np.float64))
        np.testing.assert_allclose(out[s], expect, rtol=1e-4, atol=1e-4)
    # gradient through the batched forward (backward = batched gather)
    g = jax.grad(lambda val: jnp.sum(
        plan_convolve(val, jnp.asarray(ids), plan) ** 2))(v)
    g_ref = jax.grad(lambda val: jnp.sum(
        jnp.zeros_like(val).at[..., jnp.asarray(ids)].add(val) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# one-hot MXU forward (windowless spread ids, VMEM-scale table — the Laue
# group-contiguous refl gather) and the sort-based backward permute
# ---------------------------------------------------------------------------
def test_mxu_onehot_forward_engages_for_spread_ids(rng):
    n, t = 30_000, 50_000   # random ids over 391 table rows: no window
    ids = rng.integers(0, t, n).astype(np.int32)
    plan = make_gather_plan(ids, t)
    assert plan.window == 0 and plan.mxu and plan.ids2d is not None
    table = rng.normal(size=t).astype(np.float32)
    out = plan_gather(jnp.asarray(table), jnp.asarray(ids), plan)
    # HIGH-precision one-hot matmul: exact on CPU, ~1.5e-5 rel on the MXU
    np.testing.assert_allclose(np.asarray(out), table[ids],
                               rtol=3e-5, atol=3e-5)

    ct = rng.normal(size=n).astype(np.float32)

    def f_plan(tab):
        return jnp.sum(plan_gather(tab, jnp.asarray(ids), plan) * ct)

    def f_ref(tab):
        return jnp.sum(jnp.take(tab, jnp.asarray(ids)) * ct)

    g_plan = jax.grad(f_plan)(jnp.asarray(table))
    g_ref = jax.grad(f_ref)(jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(g_plan), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_mxu_gather_not_used_when_table_too_large(rng):
    ids = rng.integers(0, 300_000, 1000).astype(np.int32)
    plan = make_gather_plan(ids, 300_000)  # 2344 rows > MAX_MXU_GATHER_ROWS
    assert not plan.mxu and plan.window == 0


def test_sort_permute_matches_take(monkeypatch, rng):
    """The lax.sort_key_val backward permute (TPU-scale path) must be
    bit-compatible with take(argsort(ids, stable)): stable sort on the raw
    ids reproduces exactly the plan's permutation order."""
    import careless_tpu.ops.plan_gather as pg
    monkeypatch.setattr(pg, "_use_sort_permute", lambda n: True)
    ids = rng.integers(0, 70, 5000).astype(np.int32)
    v = rng.normal(size=5000).astype(np.float32)
    plan = make_gather_plan(ids, 70)
    assert plan.perm is not None and plan.sort_keys is not None
    out = np.asarray(segment_sum_by_plan(jnp.asarray(v), plan))
    expect = np.bincount(ids, weights=v.astype(np.float64), minlength=70)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
    # batched contributions broadcast the keys over leading axes
    vb = rng.normal(size=(3, 5000)).astype(np.float32)
    outb = np.asarray(segment_sum_by_plan(jnp.asarray(vb), plan))
    for s in range(3):
        expect = np.bincount(ids, weights=vb[s].astype(np.float64),
                             minlength=70)
        np.testing.assert_allclose(outb[s], expect, rtol=1e-4, atol=1e-4)


def test_mxu_forward_with_histogram_backward(rng):
    """Mid-size unsorted table (too many rows for a window, small enough
    for the histogram): the one-hot MXU forward and the histogram backward
    are independent choices and must compose."""
    n, t = 30_000, 16_000
    ids = rng.integers(0, t, n).astype(np.int32)
    plan = make_gather_plan(ids, t)
    assert plan.mxu and plan.hist and plan.window == 0
    table = rng.normal(size=t).astype(np.float32)
    ct = rng.normal(size=n).astype(np.float32)

    def f_plan(tab):
        return jnp.sum(plan_gather(tab, jnp.asarray(ids), plan) * ct)

    g_plan = np.asarray(jax.grad(f_plan)(jnp.asarray(table)))
    expect = np.zeros(t, np.float64)
    np.add.at(expect, ids, ct.astype(np.float64))
    cond = np.zeros(t, np.float64)
    np.add.at(cond, ids, np.abs(ct).astype(np.float64))
    rel = np.abs(g_plan - expect) / (cond + 1e-6)
    assert rel.max() < 1e-3, rel.max()
