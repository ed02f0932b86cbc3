import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from margipose_tpu.models import create_model, Default_MargiPose_Desc, Default_Chatterbox_Desc
from margipose_tpu.models.margipose import (
    HeatmapColumn,
    MargiPoseModel,
    heatmaps_to_coords,
    margipose_masked_loss,
    permute_axis_nhwc,
)
from margipose_tpu.ops.dsnt import make_gauss


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_columns_param_parity():
    """Permuted and non-permuted columns have identical parameter counts
    (reference: tests/test_models.py:11-16)."""
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 128))
    norm_col = HeatmapColumn(17, heatmap_space='xy')
    chat_col = HeatmapColumn(17, heatmap_space='zy')
    v1 = norm_col.init(rng, x)
    v2 = chat_col.init(rng, x)
    assert n_params(v1['params']) == n_params(v2['params'])


def test_permute_axis_matches_torch():
    """NHWC axis permutation must match the reference NCHW permute+split."""
    import torch

    rng = np.random.RandomState(0)
    x_nchw = rng.randn(2, 192, 16, 16).astype(np.float32)
    size = 16
    t = torch.from_numpy(x_nchw)
    for mode, perm in [('zy', (0, 3, 2, 1)), ('xz', (0, 2, 1, 3))]:
        expected = torch.cat(
            [g.permute(*perm) for g in t.split(size, -3)], -3
        ).numpy()
        x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        actual = np.asarray(permute_axis_nhwc(x_nhwc, mode)).transpose(0, 3, 1, 2)
        assert_allclose(actual, expected)


@pytest.mark.parametrize('feature_extractor', ['inceptionv4', 'resnet18', 'resnet50'])
def test_margipose_shapes(feature_extractor):
    """Forward-shape smoke test (reference: tests/test_models.py:19-27)."""
    model = MargiPoseModel(
        n_joints=17, n_stages=2, axis_permutation=True,
        feature_extractor=feature_extractor, pixelwise_loss='jsd',
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3))
    variables = model.init(rng, x)
    (xyz, out), _ = model.apply(variables, x, mutable=['batch_stats'])
    assert out.xy_heatmaps[-1].shape == (1, 17, 32, 32)
    assert xyz.shape == (1, 17, 3)


def test_chatterbox_shapes():
    """(reference: tests/test_models.py:30-36)"""
    model = create_model(Default_Chatterbox_Desc)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3))
    variables = model.init(rng, x)
    (xyz, out), _ = model.apply(variables, x, mutable=['batch_stats'])
    assert out.xy_heatmaps[-1].shape == (1, 17, 32, 32)
    assert xyz.shape == (1, 17, 3)


def test_heatmaps_to_coords():
    """Golden values (reference: tests/test_models.py:39-46)."""
    size = (32, 32)
    xy_hm = make_gauss(jnp.array([[[-0.5, 0.5]]]), size, 1.0)
    zy_hm = make_gauss(jnp.array([[[0.1, 0.0]]]), size, 1.0)
    xz_hm = make_gauss(jnp.array([[[0.0, 0.2]]]), size, 1.0)
    xyz = heatmaps_to_coords(xy_hm, zy_hm, xz_hm)
    assert_allclose(np.asarray(xyz), [[[-0.5, 0.5, 0.15]]], atol=1e-5)


def test_factory_dispatch():
    m = create_model(Default_MargiPose_Desc)
    assert isinstance(m, MargiPoseModel)
    assert m.n_stages == 4
    with pytest.raises(ValueError):
        create_model({'type': 'margipose', 'version': '7.0.0', 'settings': {}})
    m2 = create_model({'type': 'margipose', 'version': '6.1.2',
                       'settings': {'n_stages': 1}})
    assert m2.n_stages == 1


@pytest.mark.slow  # 53s measured (r4 durations profile)
def test_masked_loss_and_grads():
    """Loss with mixed 2D/3D supervision is finite and differentiable."""
    model = MargiPoseModel(n_joints=17, n_stages=1, feature_extractor='resnet18')
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(rng, x)
    target = jax.random.uniform(jax.random.PRNGKey(2), (2, 17, 3), minval=-1, maxval=1)
    mask = jnp.ones((2, 17))
    valid_depth = jnp.array([1, 0])

    def loss_fn(params):
        (xyz, out), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, train=True, mutable=['batch_stats'],
        )
        return margipose_masked_loss(out, target, mask, valid_depth)

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_stacked_losses_match_per_plane():
    """The stacked NHWC loss path (production) must match the per-plane
    [B,J,H,W] reference implementation on identical heatmaps."""
    from margipose_tpu.models.margipose import (
        margipose_2d_losses,
        margipose_3d_losses,
        stacked_heatmaps_to_coords,
    )

    model = MargiPoseModel(n_joints=17, n_stages=2, feature_extractor='resnet18')
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    (xyz, out), _ = model.apply(variables, x, mutable=['batch_stats'])

    # compat fields are consistent with the stacked representation
    assert len(out.stacked) == 2
    assert_allclose(
        np.asarray(out.xy_heatmaps[-1]),
        np.asarray(jnp.transpose(out.stacked[-1][0], (0, 3, 1, 2))))

    # coords agree between the stacked and per-plane computations
    xyz_plane = heatmaps_to_coords(
        out.xy_heatmaps[-1], out.zy_heatmaps[-1], out.xz_heatmaps[-1])
    assert_allclose(np.asarray(xyz), np.asarray(xyz_plane), atol=1e-5)
    assert_allclose(np.asarray(stacked_heatmaps_to_coords(out.stacked[-1])),
                    np.asarray(xyz_plane), atol=1e-5)

    target = jax.random.uniform(jax.random.PRNGKey(2), (2, 17, 3),
                                minval=-0.9, maxval=0.9)
    out_plane = out._replace(stacked=())
    for fn in (margipose_3d_losses, margipose_2d_losses):
        l_stacked = fn(out, target)
        l_plane = fn(out_plane, target, use_fused=False)
        assert_allclose(np.asarray(l_stacked), np.asarray(l_plane),
                        rtol=1e-4, atol=1e-6)


def test_vmapped_columns_match_standalone():
    """The vmapped (weight-stacked) columns compute exactly what three
    standalone columns with the same weights compute."""
    from margipose_tpu.models.margipose import ColumnDown, _VmapColumnDown

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 128))
    vcol = _VmapColumnDown()
    variables = vcol.init(jax.random.PRNGKey(0), x, False)
    stacked_out = vcol.apply(variables, x, False)
    assert stacked_out.shape[0] == 3

    single = ColumnDown()
    for i in range(3):
        vs_i = jax.tree.map(lambda a: a[i], variables)
        out_i = single.apply(vs_i, x, False)
        assert_allclose(np.asarray(stacked_out[i]), np.asarray(out_i), atol=1e-6)
