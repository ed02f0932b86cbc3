"""Numeric equivalence of the fused Pallas DSNT+JSD kernel against the
pure-jnp reference ops (values AND gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from margipose_tpu.ops.dsnt import dsnt, flat_softmax, js_reg_losses
from margipose_tpu.ops.pallas_dsnt import dsnt_jsd_fused


def _random_heatmaps(b=2, j=17, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, j, h, w).astype(np.float32) * 2)
    p = flat_softmax(logits)
    mu = jnp.asarray(rng.uniform(-0.8, 0.8, (b, j, 2)).astype(np.float32))
    return p, mu


def test_fused_forward_matches_reference():
    p, mu = _random_heatmaps()
    coords, jsd = dsnt_jsd_fused(p, mu, sigma=1.0)
    assert_allclose(np.asarray(coords), np.asarray(dsnt(p)), atol=1e-5)
    assert_allclose(np.asarray(jsd), np.asarray(js_reg_losses(p, mu, 1.0)),
                    atol=1e-5)


def test_fused_forward_nonsquare():
    p, mu = _random_heatmaps(b=1, j=3, h=16, w=24, seed=1)
    coords, jsd = dsnt_jsd_fused(p, mu, sigma=2.0)
    assert_allclose(np.asarray(coords), np.asarray(dsnt(p)), atol=1e-5)
    assert_allclose(np.asarray(jsd), np.asarray(js_reg_losses(p, mu, 2.0)),
                    atol=1e-5)


def test_fused_gradients_match_reference():
    p, mu = _random_heatmaps(b=1, j=4, h=16, w=16, seed=2)

    def loss_fused(p):
        coords, jsd = dsnt_jsd_fused(p, mu, sigma=1.0)
        return jnp.sum(coords * 1.3) + jnp.sum(jsd)

    def loss_ref(p):
        coords = dsnt(p)
        jsd = js_reg_losses(p, mu, 1.0)
        return jnp.sum(coords * 1.3) + jnp.sum(jsd)

    g_fused = jax.grad(loss_fused)(p)
    g_ref = jax.grad(loss_ref)(p)
    assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)


def test_fused_through_softmax_gradients():
    """Gradients must also agree when composed with the softmax producing p
    (the actual model path)."""
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(1, 2, 16, 16).astype(np.float32))
    mu = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 2, 2)).astype(np.float32))

    def loss_fused(logits):
        p = flat_softmax(logits)
        coords, jsd = dsnt_jsd_fused(p, mu)
        return jnp.sum(coords**2) + jnp.sum(jsd)

    def loss_ref(logits):
        p = flat_softmax(logits)
        return jnp.sum(dsnt(p)**2) + jnp.sum(js_reg_losses(p, mu, 1.0))

    assert_allclose(
        np.asarray(jax.grad(loss_fused)(logits)),
        np.asarray(jax.grad(loss_ref)(logits)),
        atol=1e-4,
    )


def test_fused_prime_row_count_pads():
    """Awkward (prime) B*J row counts must not degrade to 1-row tiles: the
    inputs are padded to the tile size and the padding is sliced off —
    values and gradients still match the reference ops."""
    p, mu = _random_heatmaps(b=1, j=13, h=8, w=8, seed=4)  # 13 rows, tile 8

    coords, jsd = dsnt_jsd_fused(p, mu, sigma=1.0)
    assert_allclose(np.asarray(coords), np.asarray(dsnt(p)), atol=1e-5)
    assert_allclose(np.asarray(jsd), np.asarray(js_reg_losses(p, mu, 1.0)),
                    atol=1e-5)

    def fused_loss(p):
        coords, jsd = dsnt_jsd_fused(p, mu, sigma=1.0)
        return jnp.sum(coords ** 2) + jnp.sum(jsd)

    def ref_loss(p):
        return jnp.sum(dsnt(p) ** 2) + jnp.sum(js_reg_losses(p, mu, 1.0))

    assert_allclose(np.asarray(jax.grad(fused_loss)(p)),
                    np.asarray(jax.grad(ref_loss)(p)), atol=1e-4)


def test_target_gradient_contract_uniform_across_paths():
    """Divergence losses treat target coordinates as CONSTANTS on every
    dispatch path: the fused Pallas kernel's VJP returns no mu cotangent,
    and the jnp compositions (ops.dsnt.js_reg_losses, the stacked
    margipose _js_vs_gauss) stop_gradient their targets to match — so
    gradients w.r.t. targets are zero everywhere instead of differing by
    backend. Heatmap gradients stay live on all paths."""
    import jax
    import jax.numpy as jnp

    from margipose_tpu.models.margipose import _stacked_js
    from margipose_tpu.ops.dsnt import flat_softmax, js_reg_losses
    from margipose_tpu.ops.pallas_dsnt import dsnt_jsd_fused

    rng = np.random.RandomState(0)
    hm = flat_softmax(jnp.asarray(rng.randn(2, 3, 8, 8), jnp.float32))
    mu = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 3, 2)), jnp.float32)

    g_mu = jax.grad(
        lambda m: jnp.sum(js_reg_losses(hm, m, 1.0)))(mu)
    np.testing.assert_array_equal(np.asarray(g_mu), 0.0)

    g_mu_fused = jax.grad(
        lambda m: jnp.sum(dsnt_jsd_fused(hm, m, 1.0)[1]))(mu)
    np.testing.assert_array_equal(np.asarray(g_mu_fused), 0.0)

    stacked = flat_softmax(jnp.asarray(rng.randn(3, 2, 8, 8, 4), jnp.float32))
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 4, 3)), jnp.float32)
    g_xyz = jax.grad(
        lambda t: jnp.sum(_stacked_js(stacked, t, 1.0)))(xyz)
    np.testing.assert_array_equal(np.asarray(g_xyz), 0.0)

    # tripwire: heatmap gradients must remain live
    g_hm = jax.grad(lambda p: jnp.sum(js_reg_losses(p, mu, 1.0)))(hm)
    assert float(jnp.abs(g_hm).max()) > 0
