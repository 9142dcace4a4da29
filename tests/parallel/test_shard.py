"""Shard-invariance tests on the virtual 8-device CPU mesh (SURVEY.md §4):
the N-device ELBO/gradients must equal the 1-device result — for BOTH the
XLA auto-SPMD fallback (no plans) and the shard_map fast path (per-shard
plans, variational.elbo_sharded)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.parallel.shard import (pad_inputs_to_multiple,
                                         prepare_sharded_layout,
                                         shard_inputs_over_mesh)

import sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import _tiny_problem, dryrun_multichip  # noqa: E402

N_REFL, N_IMAGES, D_META = 48, 6, 5  # _tiny_problem table sizes


@pytest.mark.parametrize("laue", [False, True])
@pytest.mark.parametrize("n_devices", [2, 8])
def test_elbo_shard_invariance(laue, n_devices):
    """Auto-SPMD fallback: jit of the plain elbo over sharded arrays."""
    model, params, trainer, inputs = _tiny_problem(n_obs=203, laue=laue)
    key = jax.random.PRNGKey(3)

    # single-device value on the SAME global layout (row order fixes the
    # per-row MC noise assignment)
    padded = prepare_sharded_layout(inputs, n_devices)
    loss_1dev, m1 = jax.jit(model.elbo)(params, key, padded)

    sharded, mesh = shard_inputs_over_mesh(inputs, n_devices)
    assert sharded.shard_plans is None
    loss_ndev, mn = jax.jit(model.elbo)(params, key, sharded)
    np.testing.assert_allclose(np.asarray(loss_1dev), np.asarray(loss_ndev),
                               rtol=1e-5)

    g1 = jax.jit(jax.grad(lambda p: model.elbo(p, key, padded)[0]))(params)
    gn = jax.jit(jax.grad(lambda p: model.elbo(p, key, sharded)[0]))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("laue", [False, True])
@pytest.mark.parametrize("n_devices", [2, 8])
def test_elbo_shard_map_path_invariance(laue, n_devices):
    """shard_map fast path (per-shard plans) == plain elbo on the same
    layout, values AND gradients."""
    model, params, trainer, inputs = _tiny_problem(n_obs=203, laue=laue)
    key = jax.random.PRNGKey(3)
    # n_refl fixes the (chain) row order so the 1-device reference sees the
    # SAME layout — per-row MC noise is assigned by row index
    layout = prepare_sharded_layout(inputs, n_devices, n_refl=N_REFL)
    loss_1dev, _ = jax.jit(model.elbo)(params, key, layout)

    sharded, mesh = shard_inputs_over_mesh(
        inputs, n_devices, n_refl=N_REFL, n_images=N_IMAGES)
    assert sharded.shard_plans is not None
    f = jax.jit(functools.partial(model.elbo_sharded, mesh=mesh))
    loss_ndev, _ = f(params, key, sharded)
    np.testing.assert_allclose(np.asarray(loss_1dev), np.asarray(loss_ndev),
                               rtol=1e-5)

    g1 = jax.jit(jax.grad(lambda p: model.elbo(p, key, layout)[0]))(params)
    gn = jax.jit(jax.grad(
        lambda p: model.elbo_sharded(p, key, sharded, mesh)[0]))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_kernel_shard_map_invariance():
    """Fused Pallas likelihood + fused MLP trunk under shard_map (interpret
    mode feeds the same XLA eps the unsharded path uses) == plain elbo."""
    model, params, trainer, inputs = _tiny_problem(n_obs=300, laue=False)
    fused_model = model.__class__(**{**model.__dict__, "fused_kernel": True,
                                     "mc_samples": 1})
    model = model.__class__(**{**model.__dict__, "mc_samples": 1})
    key = jax.random.PRNGKey(7)
    layout = prepare_sharded_layout(inputs, 4)
    loss_1dev, _ = jax.jit(model.elbo)(params, key, layout)
    sharded, mesh = shard_inputs_over_mesh(
        inputs, 4, n_refl=N_REFL, n_images=N_IMAGES, mlp_width=8)
    assert sharded.shard_plans.meta is not None
    loss_ndev, _ = jax.jit(functools.partial(
        fused_model.elbo_sharded, mesh=mesh))(params, key, sharded)
    np.testing.assert_allclose(np.asarray(loss_1dev), np.asarray(loss_ndev),
                               rtol=1e-5)
    g1 = jax.jit(jax.grad(lambda p: model.elbo(p, key, layout)[0]))(params)
    gn = jax.jit(jax.grad(
        lambda p: fused_model.elbo_sharded(p, key, sharded, mesh)[0]))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("laue", [False, True])
def test_mask_padding_does_not_change_loss(laue):
    """Padding with masked rows must equal the unpadded loss up to the
    constant garbage-row terms the reference also carries (mono: exactly)."""
    model, params, trainer, inputs = _tiny_problem(n_obs=200, laue=laue)
    key = jax.random.PRNGKey(5)
    if laue:
        # Laue: compare 1-shard group-aligned layout vs original
        from careless_tpu.parallel.shard import _laue_group_aligned_order
        relaid = _laue_group_aligned_order(inputs, 1)
        loss_a, _ = model.elbo(params, key, relaid)
        # same data, same groups -> same masked likelihood; KL identical.
        # The original (reference-layout) loss includes garbage rows beyond
        # the group count, so compare via the masked relayout at 2 shards:
        relaid2 = _laue_group_aligned_order(inputs, 2)
        loss_b, _ = model.elbo(params, key, relaid2)
        np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b),
                                   rtol=1e-5)
    else:
        # mask must make pad-row CONTENT irrelevant (same shapes -> same MC
        # draws; only masked rows differ between a and b)
        padded = pad_inputs_to_multiple(inputs, 7)
        n = inputs.n_obs
        garbage = padded._replace(
            metadata=np.concatenate([padded.metadata[:n],
                                     np.full_like(padded.metadata[n:], 9.9)]),
            intensities=np.concatenate([padded.intensities[:n],
                                        np.full_like(padded.intensities[n:],
                                                     123.0)]),
            refl_id=np.concatenate([padded.refl_id[:n],
                                    np.full_like(padded.refl_id[n:], 3)]),
        )
        loss_a, _ = model.elbo(params, key, padded)
        loss_b, _ = model.elbo(params, key, garbage)
        np.testing.assert_allclose(np.asarray(loss_a), np.asarray(loss_b),
                                   rtol=1e-6)


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_training_on_mesh_matches_single_device():
    """Full scan-chunked training through the shard_map fast path == the
    single-device planned path, 30 steps."""
    model, params, trainer, inputs = _tiny_problem(n_obs=160, laue=False)
    key = jax.random.PRNGKey(9)
    layout = prepare_sharded_layout(inputs, 8)
    p1, h1 = trainer.train(dict(params), key, layout, steps=30,
                           progress=False)
    sharded, mesh = shard_inputs_over_mesh(
        inputs, 8, n_refl=N_REFL, n_images=N_IMAGES)
    p8, h8 = trainer.train(dict(params), key, sharded, steps=30,
                           progress=False, mesh=mesh)
    np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mc", [4, 8])
def test_mc_axis_sharding_invariance(mc):
    """MC-sample-axis sharding (SURVEY §5.8): sharding S over the mesh is
    bitwise equal to the unsharded elbo (same keys, same global shapes)."""
    from careless_tpu.parallel.shard import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, params, trainer, inputs = _tiny_problem(n_obs=160, laue=False)
    model = model.__class__(**{**model.__dict__, "mc_samples": mc})
    inputs = inputs.sorted_by_refl().with_plans(N_REFL, N_IMAGES)
    key = jax.random.PRNGKey(11)
    loss_1dev, m1 = jax.jit(model.elbo)(params, key, inputs)

    mesh = make_mesh(4, axis_name="mc")
    repl = NamedSharding(mesh, P())
    inputs_r = jax.tree.map(
        lambda x: None if x is None else jax.device_put(x, repl),
        inputs, is_leaf=lambda x: x is None)
    loss_mc, m_mc = jax.jit(functools.partial(
        model.elbo_mc_sharded, mesh=mesh))(params, key, inputs_r)
    np.testing.assert_allclose(np.asarray(loss_1dev), np.asarray(loss_mc),
                               rtol=1e-5)
    g1 = jax.jit(jax.grad(lambda p: model.elbo(p, key, inputs)[0]))(params)
    gn = jax.jit(jax.grad(
        lambda p: model.elbo_mc_sharded(p, key, inputs_r, mesh)[0]))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mc_axis_sharding_rejects_indivisible():
    from careless_tpu.parallel.shard import make_mesh

    model, params, trainer, inputs = _tiny_problem(n_obs=64, laue=False)
    model = model.__class__(**{**model.__dict__, "mc_samples": 3})
    mesh = make_mesh(4, axis_name="mc")
    with pytest.raises(ValueError, match="divide"):
        model.elbo_mc_sharded(params, jax.random.PRNGKey(0), inputs, mesh)


def test_fused_seed_spacing_no_collisions():
    """No two (sample, shard) pairs may share an in-kernel PRNG seed for
    any mc up to 64 on an 8-shard mesh (VERDICT r4 Weak #4: a fixed
    31-stride collided at mc > 31) — and the seed BASES must be spaced by
    more than any per-call block count, because the kernel seeds each
    8192-obs block with base + block_index (bases one apart give
    block-shifted duplicate noise streams, round-5 review finding)."""
    from careless_tpu.models.merging.variational import (
        FUSED_STREAM_STRIDE, fused_shard_seed)

    max_blocks = 10_000_000 // 8192 + 1  # 10M-obs call
    for mc in range(1, 65):
        seeds = sorted(int(fused_shard_seed(0, s, shard, mc))
                       for shard in range(8) for s in range(mc))
        gaps = np.diff(seeds)
        assert (gaps > 0).all(), f"seed collision at mc={mc}"
        assert gaps.min() >= FUSED_STREAM_STRIDE >= max_blocks, \
            f"stream overlap at mc={mc}: min gap {gaps.min()}"
