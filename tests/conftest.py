import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax is imported.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Force the CPU backend for tests. Note: the JAX_PLATFORMS env var is NOT
# reliably honoured when a TPU plugin (axon) is installed; the config update
# is. Must run before any jax computation.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the test host has a single CPU core, and
# model-sized XLA compiles dominate suite wall-clock. Cached executables
# make re-runs fast. Keyed per host CPU (margipose_tpu/_cache.py) — loading
# an XLA:CPU AOT entry compiled on a host with different CPU flags SIGILLs.
from margipose_tpu._cache import enable_compile_cache

enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def skeleton_canonical_univ():
    """Canonical universal skeleton for S1,Seq1,camera0,frame0 of MPI-INF-3DHP
    (fixture values from reference tests/conftest.py:9-33)."""
    return np.array([
        [ -14.1671, -334.8410, 3685.4099],
        [  -1.8908,  -78.7086, 3697.4800],
        [  12.3105,   -6.8914, 3570.3000],
        [  28.6693,   53.3262, 3259.5300],
        [  65.5078,   80.3900, 3018.8301],
        [ -21.9359,    6.5647, 3823.5701],
        [ -48.9321,    9.3914, 4139.3799],
        [ -48.1227,   29.9672, 4383.5200],
        [  26.1703,  404.6510, 3596.6575],
        [ -15.4026,  957.8070, 3670.3301],
        [ -87.2411, 1390.7700, 3718.3999],
        [ -22.8190,  401.2070, 3829.8625],
        [ -45.7490,  956.8290, 3800.5901],
        [-137.3620, 1388.2400, 3780.2000],
        [   1.6757,  402.9290, 3713.2600],
        [ -11.7886,  176.2583, 3705.0913],
        [  11.9904, -164.0930, 3696.2600],
    ], dtype=np.float64)


@pytest.fixture
def skeleton_mpi3d_univ():
    """28-joint universal skeleton for S1,Seq1,camera0,frame0 of MPI-INF-3DHP
    (fixture values from reference tests/conftest.py:36-65)."""
    return np.array([
        [ -26.0276,   98.0811, 3699.6000],
        [ -45.5924,   -6.8788, 3691.5100],
        [ -11.8660,  175.6800, 3705.0600],
        [ -11.7886,  176.2583, 3705.0914],
        [   1.6757,  402.9290, 3713.2600],
        [  -1.8908,  -78.7086, 3697.4800],
        [  11.9904, -164.0930, 3696.2600],
        [ -14.1671, -334.8410, 3685.4100],
        [  10.8534,  -43.9395, 3744.1400],
        [ -21.9359,    6.5647, 3823.5700],
        [ -48.9321,    9.3914, 4139.3800],
        [ -48.1227,   29.9672, 4383.5200],
        [ -57.2134,   51.5208, 4469.8200],
        [  27.8253,  -40.3641, 3662.9000],
        [  12.3105,   -6.8914, 3570.3000],
        [  28.6693,   53.3262, 3259.5300],
        [  65.5078,   80.3900, 3018.8300],
        [  74.3912,   90.6255, 2930.4500],
        [ -22.8190,  401.2070, 3829.8625],
        [ -45.7490,  956.8290, 3800.5900],
        [-137.3620, 1388.2400, 3780.2000],
        [ -43.9510, 1416.6700, 3807.9400],
        [ -17.2509, 1412.7200, 3812.4200],
        [  26.1703,  404.6510, 3596.6575],
        [ -15.4026,  957.8070, 3670.3300],
        [ -87.2411, 1390.7700, 3718.4000],
        [  10.3942, 1414.7500, 3704.4200],
        [  36.6540, 1407.8400, 3701.0500],
    ], dtype=np.float64)


@pytest.fixture
def base_data_dir():
    from margipose_tpu.data import get_dataset

    data_dir = get_dataset.base_data_dir()
    if not os.path.isdir(data_dir):
        pytest.skip("base data directory not found")
    return data_dir


@pytest.fixture
def mpi3d_data_dir(base_data_dir):
    dir_path = os.path.join(base_data_dir, "mpi3d")
    if not os.path.isdir(dir_path):
        pytest.skip("mpi3d data directory not found")
    return dir_path
