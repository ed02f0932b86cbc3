"""Parity tests that execute ACTUAL reference code, not a hand-built twin.

Two reference modules are importable in this environment with torch/numpy
alone (no pose3d_utils / pretrainedmodels / sacred):

- ``/root/reference/src/margipose/dsntnn.py`` (torch only) — the numeric
  contract for DSNT soft-argmax, flat softmax, Gaussian rendering, and the
  JS-divergence regulariser (reference: src/margipose/dsntnn.py:12-232).
- ``/root/reference/src/margipose/hyperparam_scheduler.py`` (numpy only) —
  the 1cycle hyperparameter interpolation
  (reference: src/margipose/hyperparam_scheduler.py:6-42).

These tests pin ``margipose_tpu.ops.dsnt`` and
``margipose_tpu.train.schedules`` (and the torch twin's ``t_*`` helpers,
which the full-model parity tests rest on) directly to the reference's own
executable code on random inputs. If the reference checkout is absent the
tests skip, mirroring the dataset-absence skip pattern.
"""

import importlib.util
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_SRC = "/root/reference/src/margipose"


def _load_reference_module(name):
    path = os.path.join(REFERENCE_SRC, name + ".py")
    if not os.path.isfile(path):
        pytest.skip(f"reference module {path} not found")
    spec = importlib.util.spec_from_file_location(f"reference_{name}", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref_dsntnn():
    return _load_reference_module("dsntnn")


@pytest.fixture(scope="module")
def ref_sched():
    return _load_reference_module("hyperparam_scheduler")


def _rand_heatmaps(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 17, 32, 32), (1, 5, 8, 16), (2, 3, 4, 8, 16)])
def test_flat_softmax_matches_reference(ref_dsntnn, shape):
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    raw = _rand_heatmaps(shape, seed=0)
    ref = ref_dsntnn.flat_softmax(torch.from_numpy(raw)).numpy()
    ours = np.asarray(ops.flat_softmax(raw))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("shape", [(2, 17, 32, 32), (1, 5, 8, 16), (2, 3, 4, 8, 16)])
def test_dsnt_matches_reference(ref_dsntnn, shape):
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    raw = _rand_heatmaps(shape, seed=1)
    hm_t = ref_dsntnn.flat_softmax(torch.from_numpy(raw))
    ref = ref_dsntnn.dsnt(hm_t).numpy()
    ours = np.asarray(ops.dsnt(np.asarray(hm_t.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_dsnt_matches_torch_twin(ref_dsntnn):
    """The twin helpers underpin the full-model parity suite — pin them to
    the reference's own executable code as well."""
    from tests.torch_twin import t_dsnt, t_flat_softmax, t_normalized_linspace

    raw = torch.from_numpy(_rand_heatmaps((2, 17, 32, 32), seed=2))
    hm = ref_dsntnn.flat_softmax(raw)
    np.testing.assert_allclose(
        t_flat_softmax(raw).numpy(), hm.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        t_dsnt(hm).numpy(), ref_dsntnn.dsnt(hm).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        t_normalized_linspace(32).numpy(),
        ref_dsntnn._normalized_linspace(32).numpy(), rtol=0, atol=1e-7)


@pytest.mark.parametrize("length", [1, 4, 17, 32])
def test_normalized_linspace_matches_reference(ref_dsntnn, length):
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    ref = ref_dsntnn._normalized_linspace(length).numpy()
    ours = np.asarray(ops.normalized_linspace(length))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-7)


@pytest.mark.parametrize("size,normalize", [
    ((32, 32), True), ((32, 32), False), ((8, 16), True), ((4, 8, 16), True),
])
def test_make_gauss_matches_reference(ref_dsntnn, size, normalize):
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    rng = np.random.default_rng(3)
    means = rng.uniform(-0.9, 0.9, size=(2, 5, len(size))).astype(np.float32)
    ref = ref_dsntnn.make_gauss(
        torch.from_numpy(means), size, sigma=1.0, normalize=normalize).numpy()
    ours = np.asarray(ops.make_gauss(means, size, sigma=1.0, normalize=normalize))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_js_reg_losses_matches_reference(ref_dsntnn):
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    raw = _rand_heatmaps((2, 17, 32, 32), seed=4)
    hm_t = ref_dsntnn.flat_softmax(torch.from_numpy(raw))
    rng = np.random.default_rng(5)
    mu = rng.uniform(-0.8, 0.8, size=(2, 17, 2)).astype(np.float32)
    ref = ref_dsntnn.js_reg_losses(hm_t, torch.from_numpy(mu), sigma_t=1.0).numpy()
    ours = np.asarray(ops.js_reg_losses(hm_t.numpy(), mu, sigma_t=1.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_euclidean_and_average_loss_match_reference(ref_dsntnn):
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    rng = np.random.default_rng(6)
    actual = rng.normal(size=(4, 17, 3)).astype(np.float32)
    target = rng.normal(size=(4, 17, 3)).astype(np.float32)
    mask = (rng.uniform(size=(4, 17)) > 0.3).astype(np.float32)

    ref_d = ref_dsntnn.euclidean_losses(
        torch.from_numpy(actual), torch.from_numpy(target))
    ours_d = np.asarray(ops.euclidean_losses(actual, target))
    np.testing.assert_allclose(ours_d, ref_d.numpy(), rtol=1e-5, atol=1e-6)

    ref_avg = ref_dsntnn.average_loss(ref_d, torch.from_numpy(mask)).item()
    ours_avg = float(ops.average_loss(ours_d, mask))
    np.testing.assert_allclose(ours_avg, ref_avg, rtol=1e-5)

    ref_avg_nomask = ref_dsntnn.average_loss(ref_d).item()
    ours_avg_nomask = float(ops.average_loss(ours_d))
    np.testing.assert_allclose(ours_avg_nomask, ref_avg_nomask, rtol=1e-5)

    # All-zero mask: reference clamps the denominator to 1.
    zero_mask = np.zeros((4, 17), dtype=np.float32)
    ref_zero = ref_dsntnn.average_loss(ref_d, torch.from_numpy(zero_mask)).item()
    ours_zero = float(ops.average_loss(ours_d, zero_mask))
    np.testing.assert_allclose(ours_zero, ref_zero, rtol=0, atol=1e-7)


def test_coord_expectation_matches_reference(ref_dsntnn):
    # Note: the reference's _coord_variance (dsntnn.py:65-81) is dead code —
    # nothing calls it, and its broadcast ([s] coords minus [B,C] mu) raises
    # for general shapes — so only the expectation is pinned here.
    ops = importlib.import_module("margipose_tpu.ops.dsnt")

    raw = _rand_heatmaps((2, 7, 16, 24), seed=7)
    hm_t = ref_dsntnn.flat_softmax(torch.from_numpy(raw))
    hm = hm_t.numpy()
    for dim in (-1, -2):
        ref_e = ref_dsntnn._coord_expectation(hm_t, dim).numpy()
        ours_e = np.asarray(ops.coord_expectation(hm, dim))
        np.testing.assert_allclose(ours_e, ref_e, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("max_iters,lr_max,momentum", [
    (150 * 1000, 1.0, 0.9),  # the flagship training envelope
    (37, 0.25, 0.9),
    (10, 1.0, 0.0),          # momentum=0: reference clamps m_min to min(0, 0.85)=0
])
def test_1cycle_values_match_reference(ref_sched, max_iters, lr_max, momentum):
    """Drive the ACTUAL reference HyperparameterScheduler batch-by-batch and
    assert our optax schedules produce identical lr/momentum sequences.

    The reference increments batch_count BEFORE interpolating, so its value
    applied to batch k (0-indexed) is interp(k+1); our schedules are
    evaluated at count=k with milestones shifted by 1
    (margipose_tpu/train/schedules.py:onecycle_schedules).
    """
    from margipose_tpu.train.schedules import onecycle_schedules

    fake_opt = types.SimpleNamespace(param_groups=[{"lr": 0.0, "momentum": 0.0}])
    sched = ref_sched.make_1cycle(fake_opt, max_iters, lr_max, momentum=momentum)

    n_probe = min(max_iters + 5, 400)
    probe = sorted(set(
        list(range(min(n_probe, 40)))
        + list(np.linspace(0, max_iters + 4, 40, dtype=int))))
    ref_lr, ref_mom = [], []
    for _ in range(max(probe) + 1):
        sched.batch_step()
        ref_lr.append(fake_opt.param_groups[0]["lr"])
        ref_mom.append(fake_opt.param_groups[0]["momentum"])

    lr_fn, mom_fn = onecycle_schedules(max_iters, lr_max=lr_max, momentum=momentum)
    for k in probe:
        np.testing.assert_allclose(
            float(lr_fn(k)), ref_lr[k], rtol=1e-5, atol=1e-8,
            err_msg=f"lr mismatch at batch {k}")
        np.testing.assert_allclose(
            float(mom_fn(k)), ref_mom[k], rtol=1e-5, atol=1e-8,
            err_msg=f"momentum mismatch at batch {k}")
