"""Numerical parity of NHWC conv/pool primitives against torch CPU.

These parity tests pin down the exact padding/stride/dilation semantics that
checkpoint conversion relies on.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from numpy.testing import assert_allclose

from margipose_tpu.ops.convs import (
    avg_pool2d,
    batch_norm_inference,
    conv2d,
    conv2d_transpose,
    max_pool2d,
    torch_conv_weight_to_hwio,
    torch_convtranspose_weight_to_hwio,
)

RNG = np.random.RandomState(42)


def _rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


# Configs covering every conv shape used by the model zoo:
# inception stem (3x3 s1/s2, 1x7, 7x1, 1x1), resnet (7x7 s2 p3),
# heatmap columns (3x3 s1 p1, 3x3 s2 p1, 1x1 s2), chatterbox
# (asymmetric stride/dilation, 1x8 collapse).
CONV_CASES = [
    dict(cin=3, cout=8, k=(3, 3), stride=2, padding=1),
    dict(cin=8, cout=8, k=(3, 3), stride=1, padding=1),
    dict(cin=8, cout=4, k=(1, 1), stride=1, padding=0),
    dict(cin=8, cout=4, k=(1, 1), stride=2, padding=0),
    dict(cin=4, cout=6, k=(1, 7), stride=1, padding=(0, 3)),
    dict(cin=4, cout=6, k=(7, 1), stride=1, padding=(3, 0)),
    dict(cin=3, cout=8, k=(7, 7), stride=2, padding=3),
    dict(cin=4, cout=8, k=(3, 3), stride=(1, 2), padding=(1, 1), dilation=(1, 1)),
    dict(cin=4, cout=8, k=(3, 3), stride=1, padding=(2, 1), dilation=(2, 1)),
    dict(cin=4, cout=8, k=(3, 3), stride=1, padding=(4, 1), dilation=(4, 1)),
    dict(cin=8, cout=8, k=(1, 8), stride=1, padding=0),
]


@pytest.mark.parametrize("case", CONV_CASES)
def test_conv2d_matches_torch(case):
    kh, kw = case["k"]
    x = _rand(2, case["cin"], 17, 16)
    w = _rand(case["cout"], case["cin"], kh, kw)
    b = _rand(case["cout"])
    kwargs = dict(
        stride=case.get("stride", 1),
        padding=case.get("padding", 0),
        dilation=case.get("dilation", 1),
    )
    expected = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), **kwargs
    ).numpy()
    actual = conv2d(
        jnp.asarray(to_nhwc(x)),
        jnp.asarray(torch_conv_weight_to_hwio(w)),
        jnp.asarray(b),
        **kwargs,
    )
    assert_allclose(to_nchw(np.asarray(actual)), expected, atol=2e-4)


TCONV_CASES = [
    dict(cin=8, cout=4, k=(3, 3), stride=2, padding=1, output_padding=1),
    dict(cin=8, cout=4, k=(1, 1), stride=2, padding=0, output_padding=1),
    dict(cin=8, cout=4, k=(1, 8), stride=1, padding=0, output_padding=0),
    dict(cin=8, cout=4, k=(3, 3), stride=(1, 2), padding=(4, 1), output_padding=(0, 1),
         dilation=(4, 1)),
    dict(cin=8, cout=4, k=(3, 3), stride=(1, 2), padding=(2, 1), output_padding=(0, 1),
         dilation=(2, 1)),
    dict(cin=8, cout=4, k=(1, 1), stride=(1, 2), padding=0, output_padding=(0, 1)),
]


@pytest.mark.parametrize("case", TCONV_CASES)
def test_conv2d_transpose_matches_torch(case):
    kh, kw = case["k"]
    x = _rand(2, case["cin"], 9, 8)
    w = _rand(case["cin"], case["cout"], kh, kw)
    b = _rand(case["cout"])
    kwargs = dict(
        stride=case.get("stride", 1),
        padding=case.get("padding", 0),
        output_padding=case.get("output_padding", 0),
        dilation=case.get("dilation", 1),
    )
    expected = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), **kwargs
    ).numpy()
    actual = conv2d_transpose(
        jnp.asarray(to_nhwc(x)),
        jnp.asarray(torch_convtranspose_weight_to_hwio(w)),
        jnp.asarray(b),
        **kwargs,
    )
    assert_allclose(to_nchw(np.asarray(actual)), expected, atol=2e-4)


def test_max_pool2d_matches_torch():
    x = _rand(2, 4, 17, 16)
    for k, s, p in [(3, 2, 1), (3, 2, 0), (2, 2, 0)]:
        expected = F.max_pool2d(torch.from_numpy(x), k, s, p).numpy()
        actual = max_pool2d(jnp.asarray(to_nhwc(x)), k, s, p)
        assert_allclose(to_nchw(np.asarray(actual)), expected, atol=1e-6)


def test_avg_pool2d_matches_torch():
    x = _rand(2, 4, 16, 16)
    for include in [True, False]:
        expected = F.avg_pool2d(
            torch.from_numpy(x), 3, 1, 1, count_include_pad=include
        ).numpy()
        actual = avg_pool2d(jnp.asarray(to_nhwc(x)), 3, 1, 1, count_include_pad=include)
        assert_allclose(to_nchw(np.asarray(actual)), expected, atol=1e-6)


def test_batch_norm_matches_torch():
    x = _rand(2, 6, 8, 8)
    mean, var = _rand(6), np.abs(_rand(6)) + 0.1
    scale, bias = _rand(6), _rand(6)
    for eps in [1e-5, 1e-3]:
        expected = F.batch_norm(
            torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(scale), torch.from_numpy(bias), training=False, eps=eps,
        ).numpy()
        actual = batch_norm_inference(
            jnp.asarray(to_nhwc(x)), jnp.asarray(mean), jnp.asarray(var),
            jnp.asarray(scale), jnp.asarray(bias), eps=eps,
        )
        assert_allclose(to_nchw(np.asarray(actual)), expected, atol=1e-5)


def test_batch_norm_stat_subsample(monkeypatch):
    """MARGIPOSE_BN_STAT_SUBSAMPLE=k: ghost-batch-norm-style stats over
    every k-th example (stat-reduction-traffic experiment, BASELINE.md
    train-step attribution). The variable tree must be byte-identical to
    stock nn.BatchNorm so checkpoints stay interchangeable, and the
    normalisation must use exactly the subset statistics."""
    import jax

    from margipose_tpu.models.layers import BatchNorm

    x = np.random.RandomState(0).randn(8, 4, 4, 6).astype(np.float32)
    xj = jnp.asarray(x)
    bn = BatchNorm()
    stock_vars = bn.init(jax.random.PRNGKey(0), xj, train=True)

    monkeypatch.setenv('MARGIPOSE_BN_STAT_SUBSAMPLE', '2')
    sub_vars = bn.init(jax.random.PRNGKey(0), xj, train=True)
    assert (jax.tree_util.tree_structure(stock_vars)
            == jax.tree_util.tree_structure(sub_vars))

    y, mut = bn.apply(sub_vars, xj, train=True, mutable=['batch_stats'])
    xs = x[::2]
    mean = xs.mean((0, 1, 2))
    var = xs.var((0, 1, 2))  # biased, matching flax use_fast_variance
    expected = (x - mean) / np.sqrt(var + 1e-5)
    assert_allclose(np.asarray(y), expected, rtol=2e-4, atol=2e-4)
    # EMA update (flax convention new = m*old + (1-m)*stat, m=0.9) must use
    # the SUBSET statistics, starting from mean=0 / var=1
    stats = jax.tree_util.tree_leaves(
        {'mean': mut['batch_stats']['BatchNorm_0']['mean'],
         'var': mut['batch_stats']['BatchNorm_0']['var']})
    assert_allclose(np.asarray(stats[0]), 0.1 * mean, rtol=1e-4, atol=1e-5)
    assert_allclose(np.asarray(stats[1]), 0.9 + 0.1 * var, rtol=1e-4, atol=1e-5)

    monkeypatch.setenv('MARGIPOSE_BN_STAT_SUBSAMPLE', '1')
    y_stock = bn.apply(stock_vars, xj, train=True, mutable=['batch_stats'])[0]
    mean_f = x.mean((0, 1, 2))
    var_f = x.var((0, 1, 2))
    assert_allclose(np.asarray(y_stock), (x - mean_f) / np.sqrt(var_f + 1e-5),
                    rtol=2e-4, atol=2e-4)
