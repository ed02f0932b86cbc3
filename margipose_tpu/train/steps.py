"""Compiled train / eval steps.

The full update — forward, masked 2D/3D loss, backward, optax update, BN
running-stat update — is one jit-ed function. Under a sharded mesh, GSPMD
partitions it: batch over 'data' (gradient all-reduce via psum), optional
conv-channel tensor parallelism over 'model'. Replaces the reference's
eager loop (reference: src/margipose/bin/train_3d.py:145-196).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from margipose_tpu.models.margipose import (
    margipose_masked_loss,
)
from margipose_tpu.parallel.precision import (
    compute_dtype_scope,
    resolve_dtype,
    shard_axis_scope,
)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, rng, optimiser, input_shape=(1, 256, 256, 3),
                       variables=None) -> TrainState:
    if variables is None:
        # jit the init: eager init dispatches thousands of tiny ops, which is
        # extremely slow over a remote-TPU tunnel.
        variables = jax.jit(model.init)(rng, jnp.zeros(input_shape, jnp.float32))
    opt_state = optimiser.init(variables["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
    )


def shard_map_axis(mesh) -> str | None:
    """The mesh axis the shard_map step paths shard the batch over, or None
    when the GSPMD/jit path should be used instead.

    Pure data parallelism (mesh 'model' axis absent or size 1) runs the
    step under jax.shard_map: per-device batches, explicit psums for grads /
    loss / BN stats. Rationale: the vmapped stacked columns lower to grouped
    convolutions (feature_group_count=3), and XLA's SPMD partitioner has no
    batch-partitioning rule for grouped convs — under pjit/GSPMD it
    replicates them (all-gather the batch, compute it ALL on every device,
    dynamic-slice back), silently destroying data-parallel scaling. Caught
    by tests/test_sharding_structure.py; shard_map takes the partitioner
    out of the hot path so each device runs the same efficient local-batch
    graph it runs single-chip. Hybrid data x model meshes keep the GSPMD
    path (tensor parallelism needs the partitioner), and single-device
    meshes keep the plain jit graph (identical semantics, no wrapper)."""
    if mesh is None or mesh.shape.get("model", 1) != 1:
        return None
    if mesh.shape.get("data", 1) <= 1:
        return None
    return "data"


def make_train_step(model, optimiser, pixelwise_loss="jsd", donate=True,
                    compute_dtype=None, mesh=None):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    ``batch`` needs: input [B,H,W,3] f32, target [B,J,>=3] f32,
    joint_mask [B,J] f32, valid_depth [B] i32.

    ``compute_dtype='bfloat16'`` enables mixed precision: params/activations
    cast to bf16 inside the step (f32 master weights, f32 BN stats, f32
    softmax/DSNT/loss — see margipose_tpu.parallel.precision).

    ``mesh``: a ('data', 'model') jax.sharding.Mesh for the multi-device
    step. Pure-DP meshes use jax.shard_map (see ``shard_map_axis``); state
    must be replicated and the batch sharded over 'data' (parallel.mesh
    shard_variables / shard_batch do exactly this).
    """
    compute_dtype = resolve_dtype(compute_dtype)
    axis = shard_map_axis(mesh)

    def train_step(state: TrainState, batch):
        def loss_fn(params):
            with compute_dtype_scope(compute_dtype), shard_axis_scope(axis):
                (xyz, out), new_model_state = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["input"].astype(compute_dtype or batch["input"].dtype),
                    train=True,
                    mutable=["batch_stats"],
                )
            loss = margipose_masked_loss(
                out,
                batch["target"][..., :3],
                batch["joint_mask"],
                batch["valid_depth"],
                pixelwise_loss,
                axis_name=axis,
            )
            return loss, (new_model_state, xyz)

        (loss, (new_model_state, xyz)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # No explicit grad psum: under shard_map the loss is the GLOBAL
        # masked mean (psum'd inside average_loss) and params are unvaried
        # (replicated) inputs, so shard_map's typed AD inserts the
        # cross-device gradient sum itself — the transpose of the implicit
        # params broadcast. An explicit lax.psum here would double-count
        # (measured: exactly n_devices x the true gradient).
        if hasattr(optimiser, "fused_apply"):
            # Single-pytree-pass update (one fusion per leaf) — see
            # margipose_tpu.train.schedules.FusedGradientTransformation.
            new_params, new_opt_state = optimiser.fused_apply(
                grads, state.opt_state, state.params)
        else:
            updates, new_opt_state = optimiser.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state["batch_stats"],
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss, "pred": xyz}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if axis is not None:
        P = jax.sharding.PartitionSpec
        train_step = jax.shard_map(
            train_step, mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(), {"loss": P(), "pred": P(axis)}),
        )
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(model, pixelwise_loss="jsd", compute_dtype=None, mesh=None):
    """Jitted eval step: (params, batch_stats, batch) -> metrics dict with
    predictions and the 3D loss (reference: src/margipose/bin/eval_3d.py:59-63).

    ``mesh``: as in make_train_step — pure-DP meshes run under shard_map
    (replicated variables, batch sharded over 'data')."""
    compute_dtype = resolve_dtype(compute_dtype)
    axis = shard_map_axis(mesh)

    def eval_step(params, batch_stats, batch):
        with compute_dtype_scope(compute_dtype):
            (xyz, out), _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["input"].astype(compute_dtype or batch["input"].dtype),
                train=False,
                mutable=[],
            )
        loss = margipose_masked_loss(
            out,
            batch["target"][..., :3],
            batch["joint_mask"],
            batch["valid_depth"],
            pixelwise_loss,
            axis_name=axis,
        )
        return {"loss": loss, "pred": xyz}

    if axis is not None:
        P = jax.sharding.PartitionSpec
        eval_step = jax.shard_map(
            eval_step, mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs={"loss": P(), "pred": P(axis)},
        )
    return jax.jit(eval_step)


def make_forward_fn(model, compute_dtype=None, mesh=None):
    """Jitted inference-only forward: (variables, images) -> coords.

    ``mesh``: as in make_train_step — pure-DP meshes run under shard_map
    (replicated variables, images sharded over 'data')."""
    compute_dtype = resolve_dtype(compute_dtype)
    axis = shard_map_axis(mesh)

    def forward(variables, images):
        with compute_dtype_scope(compute_dtype):
            xyz, _ = model.apply(
                variables, images.astype(compute_dtype or images.dtype),
                train=False)
        return xyz.astype(jnp.float32)

    if axis is not None:
        P = jax.sharding.PartitionSpec
        forward = jax.shard_map(
            forward, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis))
    return jax.jit(forward)
