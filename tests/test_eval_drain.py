"""Drain-window semantics of the eval prediction pipeline.

`obtain_predictions` reads device results back in a sliding window (one
`jax.device_get` per drained batch) so the remote-relay readback overlaps
subsequent batches' device compute (reference surface:
src/margipose/bin/eval_3d.py:48-94, which syncs per batch). The window is a
scheduling detail only — these tests pin that the yielded prediction stream
is IDENTICAL for every window size, including the end-of-stream drain and
padded tail batches.
"""

import numpy as np
import pytest

import margipose_tpu.bin.eval_3d as eval_3d


class _FakeLoader:
    """Minimal loader: batches of variable n_real with a trailing short one."""

    dataset = None

    def __init__(self, batch_sizes, n_joints=17, seed=0):
        rnd = np.random.RandomState(seed)
        self.batches = []
        for i, n in enumerate(batch_sizes):
            self.batches.append(dict(
                input=rnd.randn(n, 4).astype(np.float32),
                target=rnd.uniform(-0.9, 0.9, (n, n_joints, 3)).astype(np.float32),
                valid_depth=np.ones((n,), np.int32),
                joint_mask=np.ones((n, n_joints), np.float32),
                original_skel=[rnd.randn(n_joints, 4) for _ in range(n)],
                camera_intrinsic=[None] * n,
                transform_opts=[{'batch': i, 'row': j} for j in range(n)],
            ))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _fake_forward(in_var, target, mask, valid_depth):
    import jax.numpy as jnp

    # deterministic function of the inputs so padded rows are distinguishable
    xyz = target + jnp.mean(in_var).astype(jnp.float32)
    loss = jnp.sum(in_var)
    return xyz, loss


@pytest.fixture
def _stub_geometry(monkeypatch):
    # prepare_for_3d_evaluation does float64 camera geometry that needs a
    # real dataset; stub it with a pure passthrough so the test isolates the
    # drain machinery (ordering, padding, loss/time assignment)
    def stub(original_skel, norm_pred, dataset, intrinsic, opts,
             known_depth=False):
        return np.asarray(original_skel)[..., :3], np.asarray(norm_pred)[..., :3]

    monkeypatch.setattr(eval_3d, 'prepare_for_3d_evaluation', stub)


def _collect(loader, batch_size, drain_window):
    preds = list(eval_3d.obtain_predictions(
        _fake_forward, loader, batch_size=batch_size,
        drain_window=drain_window))
    return preds


@pytest.mark.parametrize('drain_window', [0, 1, 3, 16])
def test_drain_window_is_invisible(_stub_geometry, drain_window):
    """Every window size yields the same predictions in the same order."""
    batch_sizes = [4, 4, 4, 2]  # trailing short batch exercises tail padding
    ref = _collect(_FakeLoader(batch_sizes), 4, drain_window=0)
    got = _collect(_FakeLoader(batch_sizes), 4, drain_window=drain_window)

    assert len(ref) == len(got) == sum(batch_sizes)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r['expected'], g['expected'])
        np.testing.assert_array_equal(r['actual'], g['actual'])
        assert (r['loss'] is None) == (g['loss'] is None)
        if r['loss'] is not None:
            assert r['loss'] == pytest.approx(g['loss'])
        assert r['loss_n'] == g['loss_n']


def test_padded_tail_yields_only_real_rows(_stub_geometry):
    """A short tail batch is padded on device but yields n_real predictions,
    and its per-batch loss is attributed with loss_n == n_real."""
    loader = _FakeLoader([4, 3])
    preds = _collect(loader, 4, drain_window=2)
    assert len(preds) == 7
    # first prediction of each batch carries the batch loss; others None
    losses = [p['loss'] for p in preds]
    assert losses[0] is not None and losses[4] is not None
    assert all(l is None for i, l in enumerate(losses) if i not in (0, 4))
    assert preds[4]['loss_n'] == 3


def test_drain_window_preserves_example_identity(_stub_geometry):
    """Predictions come back in loader order: the stubbed geometry echoes
    norm_pred, which is a deterministic function of each batch's inputs."""
    loader = _FakeLoader([4, 4])
    preds = _collect(loader, 4, drain_window=8)  # window larger than stream
    for batch_i, batch in enumerate(_FakeLoader([4, 4]).batches):
        expected_xyz = (batch['target']
                        + np.float32(np.mean(batch['input'])))
        for row in range(4):
            got = preds[batch_i * 4 + row]['actual']
            # atol: device f32 mean accumulation vs host f64-then-cast
            np.testing.assert_allclose(
                got, expected_xyz[row].astype(np.float64),
                rtol=1e-5, atol=1e-6)
