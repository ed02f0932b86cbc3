"""Parity against the reference's executed eval bin — the north-star gate
path.

Executes ``/root/reference/src/margipose/bin/eval_3d.py`` — the MPJPE /
PCK / AUC evaluator whose tables ARE the published-parity gate (reference:
src/margipose/bin/eval_3d.py:48-163) — with its logic-bearing imports being
the reference's OWN executed modules: ``margipose.eval`` (per-crop
prepare_for_3d_evaluation + gather_3d_metrics), ``margipose.data.skeleton``
(Procrustes, VNect subset, root-relative algebra), and ``margipose.dsntnn``
(average_loss / euclidean_losses). Shims carry no logic under test: sacred
is absent here, tele meters are never read back, tqdm/tabulate/cli are
glue, and ``pose3d_utils.coords`` is the 3-line homogeneous-coordinate
shim from test_reference_parity.

Both bins consume the IDENTICAL batch stream, materialised once from the
REAL ``MpiInf3dDataset`` on the fake processed corpus; the reference side
sees it through a logic-free torch adapter (tensor<->numpy conversion
only), so every geometry call (denormalise / untransform / to_canonical)
hits the same dataset object. The stub model is a pure strided-slice of
the input, multiplied by 0.25 (a power of two): bit-identical between
torch, numpy, and jax. What this pins that hand-written tests could not:

- the per-crop prepare -> mean-over-ACTUALS ordering of multicrop eval
  (reference: src/margipose/bin/eval_3d.py:69-79) — averaging happens in
  camera space after depth inference, not in normalised space;
- the per-batch loss / per-example metric assembly into the results
  DataFrame, including TS{subject}/Seq{sequence} seq_id strings;
- the known_depth root-z switch and the VNect-14 vs canonical-17
  included_joints switch in main (reference: eval_3d.py:138-146);
- the by-sequence / by-activity / overall groupby table assembly
  (reference: eval_3d.py:153-163).

If the reference checkout is absent the tests skip, mirroring the
dataset-absence skip pattern.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.reference_exec]

REFERENCE_SRC = "/root/reference/src/margipose"
REF_BIN = os.path.join(REFERENCE_SRC, "bin", "eval_3d.py")


# --------------------------------------------------------------------- #
# Reference-bin execution fixture
# --------------------------------------------------------------------- #

class _Meter:
    def __init__(self, *a, **kw):
        self.values = []

    def add(self, v, n=1):
        self.values.append(v)

    def value(self):
        return (np.mean(self.values), None) if self.values else (None, None)


from reference_shims import pose3d_coords_shim as _pose3d_coords_shim  # noqa: E402


@pytest.fixture(scope="module")
def ref_eval_bin():
    """Execute the reference eval bin; yields the module. The executed
    logic chain is bin/eval_3d.py + eval.py + data/skeleton.py + dsntnn.py
    — all the reference's own files."""
    if not os.path.isfile(REF_BIN):
        pytest.skip(f"{REF_BIN} not found")

    keys = (
        "pose3d_utils", "pose3d_utils.coords", "tele", "tele.meter", "tqdm",
        "margipose", "margipose.cli", "margipose.data",
        "margipose.data.skeleton", "margipose.data.get_dataset",
        "margipose.dsntnn", "margipose.eval", "margipose.models",
        "margipose.utils",
    )
    saved = {k: sys.modules.get(k) for k in keys}
    try:
        p3u = types.ModuleType("pose3d_utils")
        coords = _pose3d_coords_shim()
        p3u.coords = coords
        sys.modules["pose3d_utils"] = p3u
        sys.modules["pose3d_utils.coords"] = coords

        tele = types.ModuleType("tele")
        meter = types.ModuleType("tele.meter")
        meter.ValueMeter = _Meter
        meter.MeanValueMeter = _Meter
        meter.MedianValueMeter = _Meter
        tele.meter = meter
        sys.modules["tele"] = tele
        sys.modules["tele.meter"] = meter

        tqdm_mod = types.ModuleType("tqdm")
        tqdm_mod.tqdm = lambda it, *a, **kw: it
        tqdm_mod.__spec__ = importlib.machinery.ModuleSpec("tqdm", None)
        sys.modules["tqdm"] = tqdm_mod

        pkg = types.ModuleType("margipose")
        pkg.__path__ = [REFERENCE_SRC]
        sys.modules["margipose"] = pkg

        cli = types.ModuleType("margipose.cli")

        class Subcommand:
            def __init__(self, name=None, func=None, help=None):
                self.name, self.func, self.help = name, func, help

        cli.Subcommand = Subcommand
        sys.modules["margipose.cli"] = cli

        data_pkg = types.ModuleType("margipose.data")
        data_pkg.__path__ = [os.path.join(REFERENCE_SRC, "data")]

        def _unpatched(*a, **kw):
            raise NotImplementedError("patched per-test")

        data_pkg.make_dataloader = _unpatched
        data_pkg.make_unbatched_dataloader = _unpatched
        sys.modules["margipose.data"] = data_pkg

        get_ds = types.ModuleType("margipose.data.get_dataset")
        get_ds.get_dataset = _unpatched
        sys.modules["margipose.data.get_dataset"] = get_ds

        models = types.ModuleType("margipose.models")
        models.load_model = _unpatched
        sys.modules["margipose.models"] = models

        utils = types.ModuleType("margipose.utils")
        utils.seed_all = lambda seed: None
        utils.init_algorithms = lambda deterministic=False: None
        sys.modules["margipose.utils"] = utils

        def load(mod_name, rel_path):
            spec = importlib.util.spec_from_file_location(
                mod_name, os.path.join(REFERENCE_SRC, rel_path))
            module = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = module
            spec.loader.exec_module(module)
            return module

        # the logic-bearing imports: the reference's OWN modules
        load("margipose.dsntnn", "dsntnn.py")
        load("margipose.data.skeleton", os.path.join("data", "skeleton.py"))
        load("margipose.eval", "eval.py")

        spec = importlib.util.spec_from_file_location(
            "reference_eval_3d", REF_BIN)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# --------------------------------------------------------------------- #
# Shared miniature dataset + stub model
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def fake_ds(tmp_path_factory):
    from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
    from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dDataset
    from margipose_tpu.data.specs import DataSpecs, ImageSpecs, JointsSpecs
    from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc

    out = str(tmp_path_factory.mktemp("ref_eval_bin_mpi3d"))
    fake_dir = generate_fake_mpi3d(out, seqs=((1, 1), (2, 2)), camera_ids=(0,),
                                   n_frames=2, with_activities=True)
    specs = DataSpecs(ImageSpecs(256), JointsSpecs(CanonicalSkeletonDesc, n_dims=3))
    return MpiInf3dDataset(fake_dir, data_specs=specs)


class _TorchDatasetAdapter:
    """Logic-free torch facade over the rebuild's numpy dataset: every
    geometry call delegates to the SAME dataset object the rebuild's bin
    evaluates, converting tensors at the boundary only."""

    def __init__(self, ds):
        self._ds = ds
        self.skeleton_desc = ds.skeleton_desc

    @staticmethod
    def _np(x):
        return x.detach().numpy() if isinstance(x, torch.Tensor) else np.asarray(x)

    @staticmethod
    def _t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float64)))

    def denormalise_with_depth(self, norm_pred, z_ref, intrinsics):
        return self._t(self._ds.denormalise_with_depth(
            self._np(norm_pred), float(z_ref), intrinsics))

    def denormalise_with_skeleton_height(self, norm_pred, intrinsics, opts):
        return self._t(self._ds.denormalise_with_skeleton_height(
            self._np(norm_pred), intrinsics, opts))

    def untransform_skeleton(self, skel, opts):
        return self._t(self._ds.untransform_skeleton(self._np(skel), opts))

    def to_canonical_skeleton(self, skel):
        return self._t(self._ds.to_canonical_skeleton(self._np(skel)))


N_JOINTS = 17

# fixed per-joint offsets so predicted joints are always distinct (Procrustes
# needs >1 unique point); small-int / power-of-two arithmetic is bit-exact
# in torch, numpy, and jax alike
_JOINT_OFFSETS = ((np.arange(N_JOINTS * 3, dtype=np.float32) - 25.0)
                  / np.float32(64.0)).reshape(N_JOINTS, 3)


def _stub_pred_np(inp):
    """[B, H, W, 3] float32 -> [B, 17, 3] predictions in (-1, 1): a strided
    slice times 0.125 plus a fixed joint-offset grid."""
    inp = np.asarray(inp)
    b = inp.shape[0]
    flat = inp[:, ::16, ::16, :].reshape(b, -1)[:, :N_JOINTS * 3]
    return (flat * np.float32(0.125)).reshape(b, N_JOINTS, 3) + _JOINT_OFFSETS


class _StubTorchModel(torch.nn.Module):
    """Prediction = the same strided slice + offsets; 3D losses via the
    reference's own executed euclidean_losses."""

    def __init__(self, ref_dsntnn):
        super().__init__()
        self._dsntnn = ref_dsntnn

    def forward(self, x):  # NHWC, same layout both sides
        b = x.shape[0]
        flat = x[:, ::16, ::16, :].reshape(b, -1)[:, :N_JOINTS * 3]
        return (flat * 0.125).reshape(b, N_JOINTS, 3) + \
            torch.from_numpy(_JOINT_OFFSETS)

    def forward_3d_losses(self, out_var, target_var):
        return self._dsntnn.euclidean_losses(out_var[..., :3], target_var)


def _our_forward(in_var, target, mask, valid_depth):
    import jax.numpy as jnp

    from margipose_tpu.ops.dsnt import average_loss, euclidean_losses

    inp = jnp.asarray(in_var)
    b = inp.shape[0]
    flat = inp[:, ::16, ::16, :].reshape(b, -1)[:, :N_JOINTS * 3]
    xyz = (flat * jnp.float32(0.125)).reshape(b, N_JOINTS, 3) + \
        jnp.asarray(_JOINT_OFFSETS)
    loss = average_loss(euclidean_losses(xyz, target))
    return xyz, loss


class _ListLoader:
    def __init__(self, batches, dataset):
        self.batches = batches
        self.dataset = dataset

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _materialise_batches(ds, multicrop):
    from margipose_tpu.data.loader import make_dataloader, make_unbatched_dataloader

    ds.multicrop = multicrop
    try:
        if multicrop:
            loader = make_unbatched_dataloader(ds)
        else:
            loader = make_dataloader(ds, batch_size=1)
        return list(loader)
    finally:
        ds.multicrop = False


def _to_torch_batch(batch):
    """Convert one rebuild-loader batch into the reference bin's expected
    torch format. frame_ref becomes the reference's list-of-refs layout
    (collate passes FrameRef objects through as a list — reference:
    src/margipose/data/__init__.py:157-186)."""
    out = {
        'input': torch.from_numpy(np.asarray(batch['input'], np.float32)),
        'target': torch.from_numpy(np.asarray(batch['target'], np.float32)),
        'original_skel': [torch.from_numpy(np.asarray(s, np.float64))
                          for s in np.asarray(batch['original_skel'])],
        'camera_intrinsic': list(batch['camera_intrinsic']),
        'transform_opts': list(batch['transform_opts']),
    }
    if 'frame_ref' in batch:
        fr = batch['frame_ref']
        if isinstance(fr, dict):  # collated dict-of-arrays layout
            n = len(out['original_skel'])
            fr = [{k: np.asarray(v)[i] for k, v in fr.items()}
                  for i in range(n)]
        out['frame_ref'] = [dict(r) for r in fr]
    return out


def _run_reference(ref_eval_bin, ds, batches, known_depth, included_joints):
    adapter = _TorchDatasetAdapter(ds)
    loader = _ListLoader([_to_torch_batch(b) for b in batches], adapter)
    model = _StubTorchModel(sys.modules["margipose.dsntnn"])
    with torch.no_grad():
        return ref_eval_bin.run_evaluation_3d(
            model, torch.device('cpu'), loader, included_joints,
            known_depth=known_depth)


def _run_ours(ds, batches, known_depth, included_joints):
    from margipose_tpu.bin.eval_3d import run_evaluation_3d

    multicrop = np.asarray(batches[0]['input']).ndim == 4 and \
        np.asarray(batches[0]['input']).shape[0] == 10
    loader = _ListLoader(batches, ds)
    df, stats = run_evaluation_3d(
        _our_forward, loader, included_joints, known_depth=known_depth,
        multicrop=multicrop, batch_size=1)
    return df, stats


def _assert_tables_match(df_ref, df_ours):
    assert list(df_ref.columns) == list(df_ours.columns)
    assert df_ref['seq_id'].tolist() == df_ours['seq_id'].tolist()
    assert [str(a) for a in df_ref['activity_id']] == \
        [str(a) for a in df_ours['activity_id']]
    metric_cols = [c for c in df_ref.columns if c not in ('seq_id', 'activity_id')]
    for c in metric_cols:
        # float64 geometry on both sides; residual is summation-order noise
        np.testing.assert_allclose(
            df_ours[c].to_numpy(), df_ref[c].to_numpy(), rtol=1e-6, atol=1e-9,
            err_msg=f'metric column {c} diverges from the reference bin')


def _vnect_joints():
    ref_skel = sys.modules["margipose.data.skeleton"]
    ref = [ref_skel.CanonicalSkeletonDesc.joint_names.index(n)
           for n in ref_skel.VNect_Common_Skeleton]

    from margipose_tpu.geometry.skeleton import (
        CanonicalSkeletonDesc,
        VNect_Common_Skeleton,
    )

    ours = [CanonicalSkeletonDesc.joint_names.index(n)
            for n in VNect_Common_Skeleton]
    assert ours == ref, 'VNect joint subset diverges from the reference'
    return ref


def test_eval_bin_batch1_matches_reference(ref_eval_bin, fake_ds):
    """Batch-1 evaluation (the reference's primary mode — reference:
    src/margipose/bin/eval_3d.py:136): the full results DataFrame — seq_id
    strings, activity ids, all six metric columns — matches the reference's
    executed run_evaluation_3d on the identical stream."""
    batches = _materialise_batches(fake_ds, multicrop=False)
    joints = _vnect_joints()
    df_ref = _run_reference(ref_eval_bin, fake_ds, batches,
                            known_depth=False, included_joints=joints)
    df_ours, _ = _run_ours(fake_ds, batches, known_depth=False,
                           included_joints=joints)
    assert len(df_ref) == len(batches)
    _assert_tables_match(df_ref, df_ours)


def test_eval_bin_known_depth_matches_reference(ref_eval_bin, fake_ds):
    """known_depth=True (the h36m branch): the ground-truth root z is read
    from original_skel and drives denormalise_with_depth on both sides
    (reference: src/margipose/eval.py:51-53)."""
    batches = _materialise_batches(fake_ds, multicrop=False)
    joints = list(range(N_JOINTS))
    df_ref = _run_reference(ref_eval_bin, fake_ds, batches,
                            known_depth=True, included_joints=joints)
    df_ours, _ = _run_ours(fake_ds, batches, known_depth=True,
                           included_joints=joints)
    _assert_tables_match(df_ref, df_ours)
    # and the branch actually matters: unknown-depth tables differ
    df_unk = _run_reference(ref_eval_bin, fake_ds, batches,
                            known_depth=False, included_joints=joints)
    assert not np.allclose(df_unk['mpjpe'].to_numpy(),
                           df_ref['mpjpe'].to_numpy())


def test_eval_bin_multicrop_matches_reference(ref_eval_bin, fake_ds):
    """Multicrop: each item is a 10-crop batch; predictions are prepared
    per crop (full depth inference each) and averaged in CAMERA space —
    the mean is over prepared ACTUALS, not normalised predictions
    (reference: src/margipose/bin/eval_3d.py:67-79). One row per example."""
    batches = _materialise_batches(fake_ds, multicrop=True)
    assert np.asarray(batches[0]['input']).shape[0] == 10
    joints = _vnect_joints()
    df_ref = _run_reference(ref_eval_bin, fake_ds, batches,
                            known_depth=False, included_joints=joints)
    df_ours, _ = _run_ours(fake_ds, batches, known_depth=False,
                           included_joints=joints)
    assert len(df_ref) == len(batches)  # one row per EXAMPLE, not per crop
    _assert_tables_match(df_ref, df_ours)


def test_eval_bin_prediction_stream_matches_reference(ref_eval_bin, fake_ds):
    """Per-prediction granularity: expected / actual skeletons and the
    per-batch loss stream out of obtain_predictions match the reference's
    executed generator (reference: src/margipose/bin/eval_3d.py:48-94)."""
    batches = _materialise_batches(fake_ds, multicrop=False)
    joints = _vnect_joints()
    del joints  # stream-level comparison needs no subset

    adapter = _TorchDatasetAdapter(fake_ds)
    ref_loader = _ListLoader([_to_torch_batch(b) for b in batches], adapter)
    model = _StubTorchModel(sys.modules["margipose.dsntnn"])
    with torch.no_grad():
        ref_preds = list(ref_eval_bin.obtain_predictions(
            model, torch.device('cpu'), ref_loader, known_depth=False))

    from margipose_tpu.bin.eval_3d import obtain_predictions

    our_preds = list(obtain_predictions(
        _our_forward, _ListLoader(batches, fake_ds), known_depth=False,
        batch_size=1))

    assert len(ref_preds) == len(our_preds) == len(batches)
    for r, o in zip(ref_preds, our_preds):
        np.testing.assert_allclose(np.asarray(o['expected']),
                                   r['expected'].numpy(), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(o['actual']),
                                   r['actual'].numpy(), rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(o['loss'], r['loss'], rtol=1e-5)


# --------------------------------------------------------------------- #
# main(): the known_depth / included_joints switch and table assembly
# --------------------------------------------------------------------- #

def _fabricated_df():
    rng = np.random.RandomState(11)
    n = 8
    d = dict(
        seq_id=[f'TS{1 + i % 2}/Seq{1 + i % 2}' for i in range(n)],
        activity_id=[1 + (i // 2) % 2 for i in range(n)],
    )
    for col in ('aligned_auc', 'aligned_mpjpe', 'aligned_pck', 'auc',
                'mpjpe', 'pck'):
        d[col] = rng.uniform(0, 100, size=n).tolist()
    return pd.DataFrame(d)


def _run_reference_main(mod, argv, df, monkeypatch):
    captured = {'tables': []}

    class _Model(torch.nn.Module):
        data_specs = None

        def forward(self, x):
            return x

    class _DS:
        multicrop = False

    monkeypatch.setattr(mod, 'load_model', lambda p: _Model())
    monkeypatch.setattr(mod, 'get_dataset',
                        lambda name, specs, use_aug: _DS())
    monkeypatch.setattr(mod, 'make_dataloader', lambda ds, batch_size: [])
    monkeypatch.setattr(mod, 'make_unbatched_dataloader', lambda ds: [])

    def fake_run(model, device, loader, included_joints, known_depth=False,
                 print_progress=False):
        captured['known_depth'] = known_depth
        captured['included_joints'] = list(included_joints)
        return df.copy()

    monkeypatch.setattr(mod, 'run_evaluation_3d', fake_run)
    monkeypatch.setattr(
        mod, 'tabulate',
        lambda frame, **kw: captured['tables'].append(frame) or '')
    # The reference's main() flips the INTERPRETER-GLOBAL autograd switch
    # (reference: src/margipose/bin/eval_3d.py:125); left off, it breaks any
    # later torch-executing test in the same pytest process (the
    # reference-training pins do real loss.backward() calls).
    prev_grad = torch.is_grad_enabled()
    try:
        mod.main(argv, {'device': 'cpu'})
    finally:
        torch.set_grad_enabled(prev_grad)
    return captured


def _run_our_main(argv, df, monkeypatch):
    import margipose_tpu.bin.eval_3d as ours

    captured = {'tables': []}

    class _Model:
        def apply(self, *a, **kw):
            raise AssertionError('forward must not run in this test')

    desc = {'type': 'margipose', 'version': '6.0.1', 'settings': {}}

    class _DS:
        multicrop = False

    monkeypatch.setattr(ours, 'load_model', lambda p: (_Model(), {}, desc))
    monkeypatch.setattr(ours, 'get_dataset',
                        lambda name, specs, use_aug: _DS())
    monkeypatch.setattr(ours, 'make_dataloader',
                        lambda ds, batch_size, num_workers: [])
    monkeypatch.setattr(ours, 'make_unbatched_dataloader',
                        lambda ds, num_workers: [])

    def fake_run(forward, loader, included_joints, known_depth=False,
                 print_progress=False, multicrop=False, batch_size=1,
                 ship_specs=None, sharding=None):
        captured['known_depth'] = known_depth
        captured['included_joints'] = list(included_joints)
        return df.copy(), dict(median_inference_time=None, mean_loss=None)

    monkeypatch.setattr(ours, 'run_evaluation_3d', fake_run)
    monkeypatch.setattr(
        ours, '_print_table', lambda frame: captured['tables'].append(frame))
    ours.main(argv, {'device': 'cpu'})
    return captured


@pytest.mark.parametrize('dataset,multicrop', [
    ('mpi3d-test', False), ('h36m-test', False), ('mpi3d-test', True)])
def test_eval_main_switch_and_tables_match_reference(
        ref_eval_bin, monkeypatch, dataset, multicrop):
    """main()-level parity: the dataset-name -> (known_depth,
    included_joints) switch (reference: src/margipose/bin/eval_3d.py:138-146)
    and the three groupby tables printed from the SAME results frame
    (reference: eval_3d.py:153-163) match the rebuild's main()."""
    df = _fabricated_df()
    argv = ['eval', '--model', 'stub.pth', '--dataset', dataset] + \
        (['--multicrop'] if multicrop else [])

    ref = _run_reference_main(ref_eval_bin, argv, df, monkeypatch)
    ours = _run_our_main(argv, df, monkeypatch)

    assert ours['known_depth'] == ref['known_depth'] == \
        dataset.startswith('h36m-')
    assert ours['included_joints'] == ref['included_joints']
    assert len(ref['tables']) == len(ours['tables']) == 3
    for t_ref, t_ours in zip(ref['tables'], ours['tables']):
        pd.testing.assert_frame_equal(t_ours, t_ref)


def test_eval_parse_args_shared_defaults(ref_eval_bin):
    """CLI surface: the shared arguments' defaults equal the reference's
    (reference: src/margipose/bin/eval_3d.py:29-45)."""
    from margipose_tpu.bin.eval_3d import parse_args as ours_parse

    ref = ref_eval_bin.parse_args(['eval', '--model', 'm.pth'])
    ours = ours_parse(['eval', '--model', 'm.pth'])
    assert ours.dataset == ref.dataset == 'mpi3d-test'
    assert ours.multicrop == ref.multicrop is False
