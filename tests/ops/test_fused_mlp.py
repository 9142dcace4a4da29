"""Fused MLP trunk kernel: layout, precision, and pre-packing invariants.

The trunk kernel (ops/fused_mlp.py) must be a pure layout/precision change:
same math as the plain per-layer XLA loop (reference MLP semantics,
/root/reference/careless/models/scaling/nn.py:55-90), same gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from careless_tpu.ops.fused_mlp import (fused_mlp_trunk, pack_geometry,
                                        pack_metadata)


def _layers(key, d_in, width, n_layers, scale=0.3):
    keys = jax.random.split(key, 2 * n_layers)
    layers = []
    d = d_in
    for i in range(n_layers):
        w = np.eye(d, width, dtype=np.float32) + scale * np.asarray(
            jax.random.normal(keys[2 * i], (d, width)))
        b = 0.1 * np.asarray(jax.random.normal(keys[2 * i + 1], (width,)))
        layers.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        d = width
    return layers


def _xla_trunk(x, layers, leakiness=0.01):
    for layer in layers:
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
        x = jax.nn.leaky_relu(x + layer["b"], leakiness)
    return x


@pytest.mark.parametrize("n,d,w", [(300, 5, 8), (1000, 10, 10)])
def test_fused_matches_xla(n, d, w):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)
    layers = _layers(key, d, w, 4)
    out = fused_mlp_trunk(x, layers, 0.01)
    ref = _xla_trunk(x, layers)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_packed_metadata_is_exact():
    """Pre-packed metadata must give bit-identical results to per-step
    packing — it is the same buffer, built host-side."""
    n, d, w = 777, 6, 9
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (n, d), jnp.float32))
    layers = _layers(jax.random.PRNGKey(3), d, w, 3)
    packed = pack_metadata(x, w)
    d_slot, group, n_rows = pack_geometry(n, d, w)
    assert packed.d_slot == d_slot and packed.group == group
    assert packed.x2d.shape == (n_rows, 128)

    out_plain = fused_mlp_trunk(jnp.asarray(x), layers, 0.01)
    out_packed = fused_mlp_trunk(jnp.asarray(x), layers, 0.01,
                                 packed=packed)
    np.testing.assert_array_equal(np.asarray(out_plain),
                                  np.asarray(out_packed))


def test_packed_metadata_gradients_match():
    n, d, w = 500, 5, 7
    x = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (n, d), jnp.float32)))
    layers = _layers(jax.random.PRNGKey(5), d, w, 3)
    packed = pack_metadata(np.asarray(x), w)

    def loss(layers, packed):
        h = fused_mlp_trunk(x, layers, 0.01, packed=packed)
        return jnp.sum(jnp.sin(h))

    g_plain = jax.grad(loss)(layers, None)
    g_packed = jax.grad(loss)(layers, packed)
    for gp, gq in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_packed)):
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(gq))


def test_geometry_mismatch_falls_back():
    """A packed buffer built for a different row subset must be ignored
    (e.g. plans carried over from the full dataset onto a split half)."""
    n, d, w = 400, 5, 7
    x = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(6), (n, d), jnp.float32)))
    layers = _layers(jax.random.PRNGKey(7), d, w, 2)
    stale = pack_metadata(np.zeros((n + 64, d), np.float32), w)  # wrong n
    out = fused_mlp_trunk(x, layers, 0.01, packed=stale)
    ref = _xla_trunk(x, layers)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_bf16_trunk_close_and_grads_finite():
    """bf16 MXU operands with f32 accumulation: ~3 decimal digits per dot.
    With O(1) activations the per-layer relative error is ~1e-2 worst case;
    assert closeness at that tolerance and finite, near-f32 gradients."""
    n, d, w = 2048, 10, 10
    x = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(8), (n, d), jnp.float32)))
    layers = _layers(jax.random.PRNGKey(9), d, w, 6, scale=0.2)

    out32 = fused_mlp_trunk(x, layers, 0.01, bf16=False)
    out16 = fused_mlp_trunk(x, layers, 0.01, bf16=True)
    denom = np.maximum(np.abs(np.asarray(out32)), 1.0)
    rel = np.abs(np.asarray(out16) - np.asarray(out32)) / denom
    # per-layer bf16 rounding compounds through 6 layers of this synthetic
    # 0.2-perturbed network; the convergence-quality gate for the real
    # identity-init scaler is tests/test_ground_truth.py::test_bf16_mlp
    assert rel.max() < 0.12, rel.max()

    def loss(layers, bf16):
        h = fused_mlp_trunk(x, layers, 0.01, bf16=bf16)
        return jnp.mean(jnp.square(h))

    g32 = jax.grad(lambda p: loss(p, False))(layers)
    g16 = jax.grad(lambda p: loss(p, True))(layers)
    f32_leaves = jax.tree.leaves(g32)
    f16_leaves = jax.tree.leaves(g16)
    for a, b in zip(f32_leaves, f16_leaves):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = max(float(np.abs(a).max()), 1e-3)
        assert np.abs(b - a).max() / scale < 0.1
