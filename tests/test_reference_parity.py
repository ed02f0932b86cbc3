"""Parity tests that execute ACTUAL reference code, not a hand-built twin.

Four reference modules are executed directly in this environment:

- ``/root/reference/src/margipose/dsntnn.py`` (torch only) — the numeric
  contract for DSNT soft-argmax, flat softmax, Gaussian rendering, and the
  JS-divergence regulariser (reference: src/margipose/dsntnn.py:12-232).
- ``/root/reference/src/margipose/hyperparam_scheduler.py`` (numpy only) —
  the 1cycle hyperparameter interpolation
  (reference: src/margipose/hyperparam_scheduler.py:6-42).
- ``/root/reference/src/margipose/eval.py`` and
  ``/root/reference/src/margipose/data/skeleton.py`` (torch + scipy, plus a
  3-line ``pose3d_utils.coords`` shim — see ``_pose3d_coords_shim``) — the
  mpjpe/pck/auc metrics, Procrustes alignment, and skeleton algebra
  (reference: src/margipose/eval.py:9-85, data/skeleton.py:78-260).

These tests pin ``margipose_tpu.ops.dsnt``, ``margipose_tpu.train.schedules``,
``margipose_tpu.eval`` and ``margipose_tpu.geometry.skeleton`` (and the torch
twin's ``t_*`` helpers, which the full-model parity tests rest on) directly
to the reference's own executable code on random inputs. They caught a real
divergence: torch.median's lower-middle-value convention in
calc_relative_scale (see geometry/skeleton.py). If the reference checkout is
absent the tests skip, mirroring the dataset-absence skip pattern.
"""

import importlib.util
import os
import sys
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


def _pose3d_coords_shim():
    """Minimal torch implementation of the three ``pose3d_utils.coords``
    helpers the reference's eval.py / data/skeleton.py import. These are
    3-line coordinate conversions (append/divide-out the homogeneous w);
    everything of numeric substance in the modules under test (metrics,
    Procrustes alignment, skeleton algebra) is the reference's OWN code.
    """
    m = types.ModuleType("pose3d_utils.coords")

    def cartesian_to_homogeneous(cart):
        return torch.cat([cart, torch.ones_like(cart[..., :1])], -1)

    def homogeneous_to_cartesian(hom):
        return hom[..., :-1] / hom[..., -1:]

    def ensure_homogeneous(coords, d):
        if coords.size(-1) == d + 1:
            return coords
        assert coords.size(-1) == d
        return cartesian_to_homogeneous(coords)

    def ensure_cartesian(coords, d):
        if coords.size(-1) == d:
            return coords
        assert coords.size(-1) == d + 1
        return homogeneous_to_cartesian(coords)

    m.cartesian_to_homogeneous = cartesian_to_homogeneous
    m.homogeneous_to_cartesian = homogeneous_to_cartesian
    m.ensure_homogeneous = ensure_homogeneous
    m.ensure_cartesian = ensure_cartesian
    return m


@pytest.fixture(scope="module")
def ref_pkg():
    """Execute the ACTUAL reference ``eval.py`` and ``data/skeleton.py``.

    Their import chains (`margipose.dsntnn`, `margipose.data.skeleton`,
    `pose3d_utils.coords`) are satisfied by registering the reference's own
    files under the package names they expect, plus the coords shim above —
    no reference logic is substituted. Returns (ref_eval, ref_skeleton).
    """
    for name in ("eval", os.path.join("data", "skeleton")):
        if not os.path.isfile(os.path.join(REFERENCE_SRC, name + ".py")):
            pytest.skip("reference eval/skeleton modules not found")

    saved = {k: sys.modules.get(k) for k in
             ("pose3d_utils", "pose3d_utils.coords", "margipose",
              "margipose.data", "margipose.data.skeleton",
              "margipose.dsntnn", "margipose.eval")}
    try:
        p3u = types.ModuleType("pose3d_utils")
        coords = _pose3d_coords_shim()
        p3u.coords = coords
        sys.modules["pose3d_utils"] = p3u
        sys.modules["pose3d_utils.coords"] = coords

        pkg = types.ModuleType("margipose")
        pkg.__path__ = [REFERENCE_SRC]
        sys.modules["margipose"] = pkg
        data_pkg = types.ModuleType("margipose.data")
        data_pkg.__path__ = [os.path.join(REFERENCE_SRC, "data")]
        sys.modules["margipose.data"] = data_pkg

        def load(mod_name, rel_path):
            spec = importlib.util.spec_from_file_location(
                mod_name, os.path.join(REFERENCE_SRC, rel_path))
            module = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = module
            spec.loader.exec_module(module)
            return module

        load("margipose.dsntnn", "dsntnn.py")
        ref_skeleton = load("margipose.data.skeleton",
                            os.path.join("data", "skeleton.py"))
        ref_eval = load("margipose.eval", "eval.py")
        yield ref_eval, ref_skeleton
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


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


def _torch_trajectory(make_opt, n_steps, p0, step_epoch_end=None):
    """Drive a torch optimiser on loss = 0.5*||p||^2 (grad = p) and return
    the per-step parameter trajectory."""
    p = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt, sched = make_opt([p])
    traj = []
    for k in range(n_steps):
        opt.zero_grad()
        (0.5 * (p ** 2).sum()).backward()
        opt.step()
        traj.append(p.detach().numpy().copy())
        if sched is not None and step_epoch_end and (k + 1) % step_epoch_end == 0:
            sched.step()
    return np.stack(traj)


def _optax_trajectory(tx, n_steps, p0):
    import jax
    import jax.numpy as jnp
    import optax

    params = {"p": jnp.asarray(p0)}
    state = tx.init(params)
    traj = []
    for _ in range(n_steps):
        grads = params  # grad of 0.5*||p||^2 is p
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(np.asarray(params["p"]))
    return np.stack(traj)


@pytest.mark.parametrize("algorithm", ["sgd", "nesterov", "rmsprop"])
def test_multistep_optimisers_match_torch(algorithm):
    """The named optimiser presets must reproduce torch.optim trajectories
    — including torch RMSprop's alpha=0.99 / eps-outside-sqrt conventions
    and MultiStepLR's per-epoch decay (reference:
    src/margipose/train_helpers.py:57-78). Trajectory-level: 15 steps on
    grad = p with epoch milestones."""
    from margipose_tpu.train.schedules import make_optimiser

    torch_optim = pytest.importorskip("torch.optim")
    lr, milestones, gamma, steps_per_epoch = 0.1, [1, 2], 0.5, 5
    p0 = np.linspace(-2.0, 3.0, 7).astype(np.float32)

    def make_opt(params):
        if algorithm == "sgd":
            opt = torch_optim.SGD(params, lr=lr)
        elif algorithm == "nesterov":
            opt = torch_optim.SGD(params, lr=lr, momentum=0.8, nesterov=True)
        else:
            opt = torch_optim.RMSprop(params, lr=lr)
        sched = torch_optim.lr_scheduler.MultiStepLR(
            opt, milestones=milestones, gamma=gamma)
        return opt, sched

    want = _torch_trajectory(make_opt, 15, p0, step_epoch_end=steps_per_epoch)
    tx = make_optimiser(algorithm, lr, milestones=milestones, gamma=gamma,
                        steps_per_epoch=steps_per_epoch)
    got = _optax_trajectory(tx, 15, p0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_1cycle_sgd_trajectory_matches_reference(ref_sched):
    """The fused 1cycle SGD update must reproduce torch.optim.SGD driven by
    the ACTUAL reference HyperparameterScheduler, batch-for-batch (the
    reference calls batch_step() before each optimiser step; reference:
    src/margipose/bin/train_3d.py:155-186, hyperparam_scheduler.py:24-42)."""
    import jax.numpy as jnp

    from margipose_tpu.train.schedules import make_optimiser

    torch_optim = pytest.importorskip("torch.optim")
    max_iters, lr_max, n_steps = 40, 0.25, 40
    p0 = np.linspace(-1.5, 2.0, 5).astype(np.float64)

    p = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch_optim.SGD([p], lr=0.0, momentum=0.9)
    sched = ref_sched.make_1cycle(opt, max_iters, lr_max, momentum=0.9)
    want = []
    for _ in range(n_steps):
        sched.batch_step()
        opt.zero_grad()
        (0.5 * (p ** 2).sum()).backward()
        opt.step()
        want.append(p.detach().numpy().copy())
    want = np.stack(want)

    tx = make_optimiser("1cycle", lr_max, max_iters=max_iters)
    params = {"p": jnp.asarray(p0)}
    state = tx.init(params)
    got = []
    for _ in range(n_steps):
        grads = params
        params, state = tx.fused_apply(grads, state, params)
        got.append(np.asarray(params["p"]))
    # the optax side runs in float32 (jax default); torch in float64
    np.testing.assert_allclose(np.stack(got), want, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# Reference eval.py / data/skeleton.py — executed directly (see ref_pkg)
# --------------------------------------------------------------------- #

def _rand_skel(seed, n_joints=17, scale=250.0, d=3):
    rng = np.random.default_rng(seed)
    return rng.normal(scale=scale, size=(n_joints, d)).astype(np.float64)


@pytest.mark.parametrize("included", [None, [0, 1, 4, 9, 16], list(range(14))])
def test_metrics_match_reference_eval(ref_pkg, included):
    """mpjpe / pck / auc pinned to the reference's own eval.py
    (reference: src/margipose/eval.py:9-31)."""
    ref_eval, _ = ref_pkg
    import margipose_tpu.eval as ours

    actual, expected = _rand_skel(10), _rand_skel(11)
    ta, te = torch.from_numpy(actual), torch.from_numpy(expected)
    np.testing.assert_allclose(
        ours.mpjpe(actual, expected, included),
        ref_eval.mpjpe(ta, te, included), rtol=1e-10)
    np.testing.assert_allclose(
        ours.pck(actual, expected, included),
        ref_eval.pck(ta, te, included), rtol=0, atol=0)
    np.testing.assert_allclose(
        ours.auc(actual, expected, included),
        ref_eval.auc(ta, te, included), rtol=1e-10)


def test_gather_3d_metrics_matches_reference(ref_pkg):
    """The full six-metric dict, including the Procrustes-aligned variants
    (reference: src/margipose/eval.py:70-85)."""
    ref_eval, _ = ref_pkg
    import margipose_tpu.eval as ours

    expected, actual = _rand_skel(12), _rand_skel(13)
    ref = ref_eval.gather_3d_metrics(
        torch.from_numpy(expected), torch.from_numpy(actual))
    got = ours.gather_3d_metrics(expected, actual)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-9,
                                   err_msg=f"metric {k}")


def test_skeleton_tables_match_reference(ref_pkg):
    """Canonical skeleton description constants are the numeric contract for
    every joint mapping (reference: src/margipose/data/skeleton.py:9-75)."""
    _, ref_skel = ref_pkg
    from margipose_tpu.geometry.skeleton import (
        CanonicalSkeletonDesc, VNect_Common_Skeleton)

    assert CanonicalSkeletonDesc.joint_names == \
        ref_skel.CanonicalSkeletonDesc.joint_names
    assert CanonicalSkeletonDesc.joint_tree == \
        ref_skel.CanonicalSkeletonDesc.joint_tree
    assert CanonicalSkeletonDesc.hflip_indices == \
        ref_skel.CanonicalSkeletonDesc.hflip_indices
    assert VNect_Common_Skeleton == ref_skel.VNect_Common_Skeleton


def test_skeleton_algebra_matches_reference(ref_pkg):
    """Parent/root-relative transforms and the spherical round-trip
    (reference: src/margipose/data/skeleton.py:78-113)."""
    _, ref_skel = ref_pkg
    import margipose_tpu.geometry.skeleton as ours

    tree = ref_skel.CanonicalSkeletonDesc.joint_tree
    skel = _rand_skel(14)
    t = torch.from_numpy(skel)

    rel_ref = ref_skel.absolute_to_parent_relative(t, tree)
    np.testing.assert_allclose(
        ours.absolute_to_parent_relative(skel, tree), rel_ref.numpy(),
        rtol=1e-12)
    np.testing.assert_allclose(
        ours.parent_relative_to_absolute(rel_ref.numpy(), tree),
        ref_skel.parent_relative_to_absolute(rel_ref, tree).numpy(),
        rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(
        ours.absolute_to_root_relative(skel, 14),
        ref_skel.absolute_to_root_relative(t, 14).numpy(), rtol=1e-12)

    sph_ref = ref_skel.cartesian_to_spherical(t).numpy()
    np.testing.assert_allclose(
        ours.cartesian_to_spherical(skel), sph_ref, rtol=1e-10)
    np.testing.assert_allclose(
        ours.spherical_to_cartesian(sph_ref),
        ref_skel.spherical_to_cartesian(torch.from_numpy(sph_ref)).numpy(),
        rtol=1e-9, atol=1e-9)


def test_scale_and_height_match_reference(ref_pkg):
    """calc_relative_scale (median bone ratios) and knee-neck height
    (reference: src/margipose/data/skeleton.py:115-177)."""
    _, ref_skel = ref_pkg
    import margipose_tpu.geometry.skeleton as ours

    desc = ref_skel.CanonicalSkeletonDesc
    skel = _rand_skel(15)
    ref_sized = 1.37 * _rand_skel(16)

    ref_bones_t = ref_skel.cartesian_to_spherical(
        ref_skel.absolute_to_parent_relative(
            torch.from_numpy(ref_sized), desc.joint_tree))[:, 0]
    got = ours.calc_relative_scale(skel, ref_bones_t.numpy(), desc.joint_tree)
    want = ref_skel.calc_relative_scale(
        torch.from_numpy(skel), ref_bones_t, desc.joint_tree)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    np.testing.assert_allclose(
        ours.calculate_knee_neck_height(skel, desc.joint_names),
        ref_skel.calculate_knee_neck_height(
            torch.from_numpy(skel), desc.joint_names),
        rtol=1e-10)


def test_rigid_alignment_and_canonical_orientation_match_reference(ref_pkg):
    """Procrustes alignment and canonicalise_orientation
    (reference: src/margipose/data/skeleton.py:180-260)."""
    _, ref_skel = ref_pkg
    import margipose_tpu.geometry.skeleton as ours

    desc = ref_skel.CanonicalSkeletonDesc
    skel, ref_sk = _rand_skel(17), _rand_skel(18)
    np.testing.assert_allclose(
        ours.apply_rigid_alignment(skel, ref_sk),
        ref_skel.apply_rigid_alignment(
            torch.from_numpy(skel), torch.from_numpy(ref_sk)).numpy(),
        rtol=1e-9, atol=1e-9)

    got = ours.canonicalise_orientation(desc, skel)
    want = ref_skel.canonicalise_orientation(
        desc, torch.from_numpy(skel)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.fixture(scope="module")
def ref_preprocess():
    """Execute the ACTUAL reference ``data/mpi_inf_3dhp/preprocess.py``.

    Its import chain adds ``margipose.data.mpi_inf_3dhp.common`` (loaded
    from the reference tree with a real package spec so its
    ``read_text('margipose.data.mpi_inf_3dhp', 'sequence_info.json')``
    resolves against the reference's own JSON) and a one-line
    ``pose3d_utils.camera.CameraIntrinsics`` class shim (imported by
    common.py at module level; unused by the function under test)."""
    files = [
        os.path.join(REFERENCE_SRC, "data", "skeleton.py"),
        os.path.join(REFERENCE_SRC, "data", "mpi_inf_3dhp", "preprocess.py"),
    ]
    if not all(os.path.isfile(f) for f in files):
        pytest.skip("reference preprocess modules not found")
    pytest.importorskip("scipy")

    keys = ("pose3d_utils", "pose3d_utils.coords", "pose3d_utils.camera",
            "margipose", "margipose.data", "margipose.data.skeleton",
            "margipose.data.mpi_inf_3dhp",
            "margipose.data.mpi_inf_3dhp.common",
            "margipose.data.mpi_inf_3dhp.preprocess")
    saved = {k: sys.modules.get(k) for k in keys}
    try:
        p3u = types.ModuleType("pose3d_utils")
        coords = _pose3d_coords_shim()
        camera = types.ModuleType("pose3d_utils.camera")

        class CameraIntrinsics:  # constructor-only surface used by common.py
            def __init__(self, matrix):
                self.matrix = matrix

        camera.CameraIntrinsics = CameraIntrinsics
        p3u.coords = coords
        p3u.camera = camera
        sys.modules["pose3d_utils"] = p3u
        sys.modules["pose3d_utils.coords"] = coords
        sys.modules["pose3d_utils.camera"] = camera

        pkg = types.ModuleType("margipose")
        pkg.__path__ = [REFERENCE_SRC]
        sys.modules["margipose"] = pkg
        data_pkg = types.ModuleType("margipose.data")
        data_pkg.__path__ = [os.path.join(REFERENCE_SRC, "data")]
        sys.modules["margipose.data"] = data_pkg

        def load(mod_name, rel_path, execute=True):
            full = os.path.join(REFERENCE_SRC, rel_path)
            kwargs = ({"submodule_search_locations": [os.path.dirname(full)]}
                      if not execute else {})
            spec = importlib.util.spec_from_file_location(
                mod_name, full, **kwargs)
            module = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = module
            if execute:
                spec.loader.exec_module(module)
            return module

        load("margipose.data.skeleton", os.path.join("data", "skeleton.py"))
        # register the package spec WITHOUT executing its __init__ (which
        # imports torchvision, absent here): common.py's read_text()
        # resolves sequence_info.json through the registered loader
        load("margipose.data.mpi_inf_3dhp",
             os.path.join("data", "mpi_inf_3dhp", "__init__.py"),
             execute=False)
        load("margipose.data.mpi_inf_3dhp.common",
             os.path.join("data", "mpi_inf_3dhp", "common.py"))
        ref_pre = load("margipose.data.mpi_inf_3dhp.preprocess",
                       os.path.join("data", "mpi_inf_3dhp", "preprocess.py"))
        yield ref_pre
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_mpi3d_constants_match_reference(ref_preprocess):
    """The MPI-INF-3DHP constant tables — train/val sequence splits, VNect
    camera subset, blacklist, root joint, per-sequence metadata JSON — and
    the 28-joint skeleton description, against the reference's own loaded
    common.py (reference: src/margipose/data/mpi_inf_3dhp/common.py:11-70)."""
    from margipose_tpu.data.mpi_inf_3dhp import (
        Constants,
        MpiInf3dhpSkeletonDesc,
    )

    ref_common = sys.modules["margipose.data.mpi_inf_3dhp.common"]
    ref_c = ref_common.Constants
    assert Constants['train_seqs'] == ref_c['train_seqs']
    assert Constants['val_seqs'] == ref_c['val_seqs']
    assert Constants['vnect_cameras'] == ref_c['vnect_cameras']
    assert Constants['n_cameras'] == ref_c['n_cameras']
    assert Constants['root_joint'] == ref_c['root_joint']
    assert Constants['blacklist'] == ref_c['blacklist']
    # seq_info: ours is loaded from the in-repo JSON, the reference's from
    # its own packaged sequence_info.json — they must be identical
    assert Constants['seq_info'] == ref_c['seq_info']

    ref_desc = ref_common.MpiInf3dhpSkeletonDesc
    assert MpiInf3dhpSkeletonDesc.joint_names == ref_desc.joint_names
    assert MpiInf3dhpSkeletonDesc.joint_tree == ref_desc.joint_tree
    assert MpiInf3dhpSkeletonDesc.hflip_indices == ref_desc.hflip_indices


def test_univ_scale_factor_matches_reference(ref_preprocess):
    """calculate_univ_scale_factor — including torch.median's lower-middle
    convention on the (even-count) ratio array (reference:
    src/margipose/data/mpi_inf_3dhp/preprocess.py:105-125)."""
    from margipose_tpu.data.mpi3d_preprocess import calculate_univ_scale_factor
    from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dhpSkeletonDesc

    ref_desc = sys.modules["margipose.data.mpi_inf_3dhp.common"] \
        .MpiInf3dhpSkeletonDesc
    rnd = np.random.RandomState(20)
    # 4 frames x 23 included joints x 3 coords = 276 ratios — EVEN, so the
    # two median conventions pick different values (verified below)
    n_frames, scale = 4, 1.0717268
    univ = rnd.uniform(-900, 900, (n_frames, ref_desc.n_joints, 3))
    univ[:, ref_desc.root_joint_id] = rnd.uniform(-50, 50, (n_frames, 3))
    # perturb below the 1e-6 congruence tolerance so the ratio array is NOT
    # constant: the median's tie-break convention then matters at float64
    annot3 = univ * scale + rnd.uniform(-2e-7, 2e-7, univ.shape)

    ours = calculate_univ_scale_factor(annot3, univ, MpiInf3dhpSkeletonDesc)
    want = ref_preprocess._calculate_univ_scale_factor(
        annot3, univ, ref_desc)
    assert ours == want  # bit-exact: same lower-middle element

    # tripwire: this data MUST discriminate the conventions — if numpy's
    # middle-averaging median gave the same answer the test proves nothing
    from margipose_tpu.geometry.skeleton import absolute_to_root_relative
    rel_a = absolute_to_root_relative(annot3, ref_desc.root_joint_id)
    rel_u = absolute_to_root_relative(univ, ref_desc.root_joint_id)
    exclude = {'pelvis', 'left_knee', 'left_ankle', 'right_knee',
               'right_ankle'}
    inc = [i for i, n in enumerate(ref_desc.joint_names) if n not in exclude]
    nz = np.abs(rel_u[..., inc, :]) > 1e-6
    ratio = rel_a[..., inc, :][nz] / rel_u[..., inc, :][nz]
    assert ratio.size % 2 == 0
    assert float(np.median(ratio)) != want
