"""REAL 2-process ``jax.distributed`` integration tests.

tests/test_multihost.py exercises the multi-host batch-assembly MATH by
faking two processes inside one; these tests spawn two actual OS processes
(CPU backend, gloo collectives, 4 virtual devices each → one global
8-device mesh) so the behaviour-switching multi-process branches run for
real: ``jax.make_array_from_process_local_data``, the orbax multi-host
checkpoint branch (collective save, process-0-only swap —
margipose_tpu/train/checkpoint.py), ``host_local_values`` on
non-fully-addressable arrays, per-process loader slices/seeds and
process-0-only file sinks in bin/train_3d.

Writing these caught two real bugs: both processes raced the checkpoint
directory swap (now process-0-only behind barriers), and
``restore_checkpoint`` returned orbax-committed arrays that could not be
re-placed onto the global mesh (CPU backends have no cross-host device
transfers; leaves now return to host numpy first).

The reference has no analogue of any of this — it is strictly
single-process (reference: src/margipose/bin/train_3d.py; SURVEY.md §5.8).
"""

import json
import os
import socket
import subprocess
import sys
from os import path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO_ROOT = path.dirname(path.dirname(path.abspath(__file__)))
WORKER = path.join(REPO_ROOT, 'tests', 'multihost_worker.py')


def _free_port() -> int:
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(mode: str, out_dir: str, timeout: float = 540):
    """Run both worker processes to completion; returns their result JSONs."""
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env['PYTHONPATH'] = REPO_ROOT + os.pathsep + env.get('PYTHONPATH', '')
    port = _free_port()
    procs, logs = [], []
    for pid in (0, 1):
        log = open(path.join(out_dir, f'w{pid}.log'), 'w')
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, '--process-id', str(pid),
             '--port', str(port), '--out', out_dir, '--mode', mode],
            env=env, stdout=log, stderr=subprocess.STDOUT, cwd=REPO_ROOT))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for log in logs:
            log.close()
    if [p.returncode for p in procs] != [0, 0]:
        tails = []
        for pid in (0, 1):
            with open(path.join(out_dir, f'w{pid}.log')) as f:
                tails.append(f'--- worker {pid} (rc={procs[pid].returncode}) '
                             f'---\n' + ''.join(f.readlines()[-30:]))
        pytest.fail('multihost worker failed\n' + '\n'.join(tails))
    results = []
    for pid in (0, 1):
        with open(path.join(out_dir, f'proc{pid}.json')) as f:
            results.append(json.load(f))
    return results


def test_real_two_process_training_matches_single_process(tmp_path):
    """Train/checkpoint/restore/train on a REAL 2-process 8-device mesh and
    compare against the identical recipe run single-process on 8 local
    devices.

    Parity bounds: the step-0 loss is EXACT (identical params and inputs,
    no collective-reduced update applied yet). Later steps accumulate
    cross-process reduction-order drift — gloo's all-reduce sums in a
    different order than XLA's in-process all-reduce — amplified by the
    SGD updates; measured max deltas were 2.4e-7 (loss, step 1), 4.4e-4
    (loss, step 2) and 4.1e-4 (params) at lr=0.05, asserted at 2e-3. The
    save→restore round-trip inside the 2-process run is asserted BIT-exact
    by the worker itself (multihost_worker.run_recipe)."""
    import multihost_worker as mw

    r0, r1 = _spawn_workers('recipe', str(tmp_path))
    # the loss is a replicated global scalar: identical on both processes
    assert r0 == r1, (r0, r1)
    assert r0['meta_epoch'] == 1

    single = mw.run_recipe(str(tmp_path / 'single_ckpt'))
    assert single['losses'][0] == r0['losses'][0], 'step-0 must be exact'
    np.testing.assert_allclose(single['losses'], r0['losses'],
                               rtol=0, atol=2e-3)
    two_params = np.load(tmp_path / 'params.npz')
    assert set(two_params.files) == set(single['params'])
    for key, value in single['params'].items():
        np.testing.assert_allclose(value, two_params[key], rtol=0, atol=2e-3,
                                   err_msg=key)


def test_real_two_process_train_bin_and_resume(tmp_path):
    """The REAL training entry (bin/train_3d.run_training) under 2
    processes: per-process loader slices + seeds (bin/train_3d.py:201-217),
    device_prefetch batch assembly, a collective checkpoint save each
    epoch, then a full-state ``resume=`` through the multi-host orbax
    restore branch — finishing with the checkpoint strict-loading as an
    inference model in this (single-process) test process."""
    from margipose_tpu.train.checkpoint import load_meta, load_model

    r0, r1 = _spawn_workers('bin', str(tmp_path), timeout=560)
    for r in (r0, r1):
        assert np.isfinite(r['result1']['train_mpjpe'])
        assert np.isfinite(r['result2']['train_mpjpe'])
        assert 0.0 <= r['result2']['train_pck'] <= 1.0

    # run 1 omitted experiment_id: both processes must have agreed on
    # process 0's broadcast timestamp (divergent ids would strand the
    # non-primary checkpoint shards in a directory nobody swaps)
    assert r0['ckpt_dir'] == r1['ckpt_dir'], (r0['ckpt_dir'], r1['ckpt_dir'])
    exp = tmp_path / 'train_out' / r0['result1']['experiment_id']
    assert load_meta(str(exp / 'model-latest'))['epoch'] == 2
    # process-0-only file sinks: one metrics line per epoch, not one per
    # process per epoch; config.json written once without interleaving
    lines = [json.loads(line) for line in open(exp / 'metrics.jsonl')]
    assert [line['epoch'] for line in lines] == [0, 1]
    assert json.load(open(exp / 'config.json'))['batch_size'] == 8

    model, variables, desc = load_model(str(exp / 'model-latest'))
    assert desc['settings']['input_size'] == 96
    assert 'params' in variables and 'batch_stats' in variables
