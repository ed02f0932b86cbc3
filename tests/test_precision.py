"""Mixed-precision (bf16 compute) policy tests.

The policy (margipose_tpu/parallel/precision.py): f32 master params, f32 BN
running stats, bf16 conv/BN compute, f32 softmax/DSNT/loss heads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from margipose_tpu.models import create_model
from margipose_tpu.parallel.precision import (
    cast_floating,
    compute_dtype_scope,
    current_compute_dtype,
    resolve_dtype,
)
from margipose_tpu.train.schedules import make_optimiser
from margipose_tpu.train.steps import (
    create_train_state,
    make_forward_fn,
    make_train_step,
)

SMALL_DESC = {
    "type": "margipose",
    "version": "6.0.0",
    "settings": {"n_stages": 1, "axis_permutation": True,
                 "feature_extractor": "resnet18", "pixelwise_loss": "jsd"},
}


def test_resolve_dtype():
    assert resolve_dtype(None) is None
    assert resolve_dtype("bf16") == jnp.bfloat16
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype("float32") == jnp.float32
    with pytest.raises(ValueError):
        resolve_dtype("fp8")


def test_scope_nesting():
    assert current_compute_dtype() is None
    with compute_dtype_scope("bfloat16"):
        assert current_compute_dtype() == jnp.bfloat16
        with compute_dtype_scope(None):
            assert current_compute_dtype() is None
        assert current_compute_dtype() == jnp.bfloat16
    assert current_compute_dtype() is None


def test_cast_floating_leaves_ints():
    tree = {"w": jnp.ones((2,), jnp.float32), "n": jnp.zeros((), jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["n"].dtype == jnp.int32
    assert cast_floating(tree, None) is tree


def test_forward_bf16_close_to_f32():
    model = create_model(SMALL_DESC)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    variables = model.init(rng, x)

    xyz_f32 = make_forward_fn(model)(variables, x)
    xyz_bf16 = make_forward_fn(model, compute_dtype="bfloat16")(variables, x)

    assert xyz_bf16.dtype == jnp.float32  # heads stay f32
    # coords live in [-1, 1]. At random init the softmax is saturated, so a
    # bf16-perturbed argmax pixel can legitimately move one coordinate by a
    # whole heatmap cell — compare statistically, not elementwise.
    err = np.abs(np.asarray(xyz_f32) - np.asarray(xyz_bf16))
    assert np.median(err) < 0.02
    assert np.mean(err) < 0.05
    assert (err > 0.5).mean() == 0.0


def test_train_step_bf16_keeps_state_f32():
    model = create_model(SMALL_DESC)
    opt = make_optimiser("1cycle", lr=0.01, max_iters=10)
    state = create_train_state(model, jax.random.PRNGKey(0), opt,
                               input_shape=(1, 64, 64, 3))
    rnd = np.random.RandomState(1)
    batch = {
        "input": jnp.asarray(rnd.randn(2, 64, 64, 3), jnp.float32),
        "target": jnp.asarray(rnd.uniform(-0.9, 0.9, (2, 17, 3)), jnp.float32),
        "joint_mask": jnp.ones((2, 17), jnp.float32),
        "valid_depth": jnp.asarray([1, 0], jnp.int32),
    }
    train_step = make_train_step(model, opt, donate=False,
                                 compute_dtype="bfloat16")
    new_state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # master params, BN stats, and optimiser state must remain f32
    for leaf in jax.tree.leaves(new_state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(new_state.batch_stats):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(new_state.opt_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
