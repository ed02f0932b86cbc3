"""Compile-only GSPMD coverage of the FLAGSHIP graph on the 8-device mesh.

`dryrun_multichip` deliberately downsizes to 2 stages / resnet18 / 32x32:
round 1 showed that EXECUTING the flagship's sharded step on this host's
single CPU core serialises the collective rendezvous for minutes
(MULTICHIP_r01.json rc=124). Compilation has no such constraint — GSPMD
partitioning is a compiler pass — so this test proves the production graph
(margipose v6.0.1: 4 stages, InceptionV4 stem, 256x256, mixed 2D/3D masked
loss, BN stats, fused optimiser) lowers and compiles over a real
jax.sharding.Mesh without needing 8 chips or paying one-core execution.

In the default (full) suite since round 4 — the driver's dryrun_multichip
now runs this same compile as a recorded artifact step every round, so the
persistent compilation cache keeps this warm (cold: measured 26 s lower +
93 s compile, BASELINE.md "Flagship multi-chip evidence"). Deselectable via
the quick tier (-m 'not slow').
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_flagship_train_step_compiles_over_8_device_mesh():
    import jax

    from margipose_tpu.models import Default_MargiPose_Desc, create_model
    from margipose_tpu.parallel import make_mesh, shard_batch, shard_variables
    from margipose_tpu.train.schedules import make_optimiser
    from margipose_tpu.train.steps import (
        TrainState,
        create_train_state,
        make_train_step,
    )

    devices = jax.devices()[:8]
    assert len(devices) == 8
    mesh = make_mesh(devices, shape=(8, 1))

    model = create_model(Default_MargiPose_Desc)
    opt = make_optimiser('1cycle', lr=0.1, max_iters=10)
    state = create_train_state(model, jax.random.PRNGKey(0), opt,
                               input_shape=(1, 256, 256, 3))
    state = TrainState(
        step=jax.device_put(state.step),
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=jax.device_put(state.opt_state),
    )

    batch = 16
    rng = np.random.RandomState(0)
    host_batch = {
        'input': rng.randn(batch, 256, 256, 3).astype(np.float32),
        'target': rng.uniform(-0.9, 0.9, (batch, 17, 3)).astype(np.float32),
        'joint_mask': np.ones((batch, 17), np.float32),
        'valid_depth': (np.arange(batch) % 2).astype(np.int32),
    }
    device_batch = shard_batch(host_batch, mesh)

    step = make_train_step(model, opt, pixelwise_loss='jsd', donate=False,
                           mesh=mesh)
    compiled = step.lower(state, device_batch).compile()

    # partitioned executable exists and reports the full-graph cost
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get('flops', 0.0))
    # shared floor (see the constant's comment for the analytic derivation)
    # so this test and the driver artifact assert the same notion of
    # "really the flagship graph was compiled"
    import __graft_entry__ as ge

    assert flops > ge.FLAGSHIP_MIN_PER_DEVICE_FLOPS, flops

    # and the partitioning STRUCTURE matches the pure-DP expectation
    # (psum-only collectives, replicated params, data-sharded batch) — see
    # test_sharding_structure for the rationale
    from test_sharding_structure import assert_data_parallel_structure

    assert_data_parallel_structure(compiled, state=state, batch=device_batch)
