import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from margipose_tpu.ops import (
    average_loss,
    dsnt,
    euclidean_losses,
    flat_softmax,
    js_reg_losses,
    make_gauss,
    normalized_linspace,
)
from margipose_tpu.ops.dsnt import coord_variance


def test_normalized_linspace():
    assert_allclose(
        np.asarray(normalized_linspace(4)), [-0.75, -0.25, 0.25, 0.75], atol=1e-7
    )


def test_flat_softmax_normalizes():
    x = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
    out = np.asarray(flat_softmax(jnp.asarray(x)))
    assert out.shape == x.shape
    assert_allclose(out.reshape(2, 3, -1).sum(-1), np.ones((2, 3)), atol=1e-6)
    # matches softmax computed with numpy
    flat = x.reshape(2, 3, -1)
    ref = np.exp(flat - flat.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    assert_allclose(out.reshape(2, 3, -1), ref, atol=1e-6)


def test_dsnt_known_gaussians():
    """Golden values from reference tests/test_models.py:39-46."""
    size = (32, 32)
    xy_hm = make_gauss(jnp.array([[[-0.5, 0.5]]]), size, 1.0)
    zy_hm = make_gauss(jnp.array([[[0.1, 0.0]]]), size, 1.0)
    xz_hm = make_gauss(jnp.array([[[0.0, 0.2]]]), size, 1.0)
    xy = dsnt(xy_hm)
    zy = dsnt(zy_hm)
    xz = dsnt(xz_hm)
    z = 0.5 * (zy[..., 0] + xz[..., 1])
    xyz = jnp.concatenate([xy, z[..., None]], axis=-1)
    assert_allclose(np.asarray(xyz), [[[-0.5, 0.5, 0.15]]], atol=1e-5)


def test_dsnt_3d():
    hm = make_gauss(jnp.array([[[0.25, -0.25, 0.5]]]), (16, 16, 16), 1.0)
    assert hm.shape == (1, 1, 16, 16, 16)
    coords = dsnt(hm)
    assert_allclose(np.asarray(coords), [[[0.25, -0.25, 0.5]]], atol=1e-4)


def test_dsnt_brute_force_equivalence():
    """dsnt must equal an explicit expectation over the grid."""
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 8, 12).astype(np.float32)
    hm = np.asarray(flat_softmax(jnp.asarray(logits))).astype(np.float64)
    coords = np.asarray(dsnt(jnp.asarray(hm, dtype=jnp.float32)))
    xs = np.asarray(normalized_linspace(12))
    ys = np.asarray(normalized_linspace(8))
    ex = (hm.sum(2) * xs).sum(-1)
    ey = (hm.sum(3) * ys).sum(-1)
    assert_allclose(coords[..., 0], ex, atol=1e-6)
    assert_allclose(coords[..., 1], ey, atol=1e-6)


def test_coord_variance():
    hm = make_gauss(jnp.array([[[0.0, 0.0]]]), (32, 32), 2.0)
    var_x = np.asarray(coord_variance(hm, -1))
    # sigma=2px in a 32px grid => normalized sigma = 2 * 2/32 = 0.125
    assert_allclose(var_x, [[0.125**2]], rtol=1e-2)


def test_euclidean_losses():
    actual = jnp.array([[[0.0, 0.0], [3.0, 4.0]]])
    target = jnp.array([[[0.0, 1.0], [0.0, 0.0]]])
    assert_allclose(np.asarray(euclidean_losses(actual, target)), [[1.0, 5.0]])


def test_average_loss_masked():
    losses = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    mask = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    assert_allclose(float(average_loss(losses, mask)), (1 + 3 + 4) / 3)
    assert_allclose(float(average_loss(losses)), 2.5)
    # all-masked does not divide by zero
    assert_allclose(float(average_loss(losses, jnp.zeros_like(mask))), 0.0)


def test_make_gauss_normalized():
    g = np.asarray(make_gauss(jnp.array([[[0.2, -0.3]]]), (24, 24), 1.5))
    assert g.shape == (1, 1, 24, 24)
    assert_allclose(g.sum(), 1.0, atol=1e-5)
    # peak located at the requested coordinate
    iy, ix = np.unravel_index(g[0, 0].argmax(), g[0, 0].shape)
    xs = np.asarray(normalized_linspace(24))
    assert abs(xs[ix] - 0.2) <= 2 / 24
    assert abs(xs[iy] - (-0.3)) <= 2 / 24


def test_js_reg_losses():
    mu = jnp.array([[[0.1, -0.2]]])
    hm_match = make_gauss(mu, (32, 32), 1.0)
    hm_off = make_gauss(jnp.array([[[-0.5, 0.5]]]), (32, 32), 1.0)
    js_match = float(js_reg_losses(hm_match, mu, 1.0)[0, 0])
    js_off = float(js_reg_losses(hm_off, mu, 1.0)[0, 0])
    assert js_match == pytest.approx(0.0, abs=1e-6)
    assert js_off > 0.1
    # JS divergence is bounded by ln(2)
    assert js_off <= np.log(2) + 1e-6


def test_js_matches_torch_formula():
    """Cross-check against an independent torch computation of JS divergence."""
    import torch

    rng = np.random.RandomState(2)
    logits = rng.randn(2, 3, 16, 16).astype(np.float64)
    p = np.asarray(flat_softmax(jnp.asarray(logits)))
    mu = rng.uniform(-0.5, 0.5, size=(2, 3, 2))
    q = np.asarray(make_gauss(jnp.asarray(mu), (16, 16), 1.0))

    tp = torch.from_numpy(np.asarray(p, dtype=np.float64))
    tq = torch.from_numpy(np.asarray(q, dtype=np.float64))
    m = 0.5 * (tp + tq)
    eps = 1e-24
    kl_pm = (tp * ((tp + eps).log() - (m + eps).log())).sum((-1, -2))
    kl_qm = (tq * ((tq + eps).log() - (m + eps).log())).sum((-1, -2))
    expected = 0.5 * kl_pm + 0.5 * kl_qm

    actual = np.asarray(js_reg_losses(jnp.asarray(p), jnp.asarray(mu), 1.0))
    assert_allclose(actual, expected.numpy(), atol=1e-5)
