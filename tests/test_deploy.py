"""GKE/TPU-VM deployment manifest generation (deploy/tpu_vm.py — the
analogue of the reference's k8s/deploy.py single-GPU pod)."""

import sys
from os import path

sys.path.insert(0, path.join(path.dirname(__file__), '..', 'deploy'))

import tpu_vm


def _args(**kw):
    argv = ['--backend', 'gke', '--name', 't', '--dry-run']
    for k, v in kw.items():
        argv += [f'--{k.replace("_", "-")}', str(v)]
    argv += ['--', 'train', 'with', 'margipose_model', 'mpi3d']
    args = tpu_vm.make_parser().parse_args(argv)
    args.command = args.command[1:]
    return args


def test_gke_manifest_v5e_multihost():
    m = tpu_vm.gke_manifest(_args(accelerator_type='v5litepod-16'))
    assert 'completions: 4' in m and 'parallelism: 4' in m
    assert '"google.com/tpu": "4"' in m
    assert 'gke-tpu-topology: 4x4' in m


def test_gke_manifest_v5e_single_host():
    m = tpu_vm.gke_manifest(_args(accelerator_type='v5litepod-8'))
    assert 'completions: 1' in m
    assert '"google.com/tpu": "8"' in m


def test_gke_manifest_v5p_counts_tensorcores():
    """v4/v5p accelerator-type suffixes count TensorCores (2 per chip), and
    hosts carry 4 chips: v5p-16 = 8 chips = 2 hosts."""
    m = tpu_vm.gke_manifest(_args(accelerator_type='v5p-16', topology='2x2x2'))
    assert 'completions: 2' in m and 'parallelism: 2' in m
    assert '"google.com/tpu": "4"' in m


def test_gke_manifest_v4_single_host():
    """v4-8 = 4 chips on one host — must not request 8 TPUs per pod."""
    m = tpu_vm.gke_manifest(_args(accelerator_type='v4-8', topology='2x2x1'))
    assert 'completions: 1' in m
    assert '"google.com/tpu": "4"' in m
