"""Device mesh construction and sharding rules.

The reference is single-device (no distributed training of any kind; see
SURVEY.md §2.3); this module is the TPU-native scaling layer it lacks:

  * a ('data', 'model') mesh over all available chips;
  * batch sharding over 'data' (data parallelism — gradients all-reduced by
    XLA ``psum`` emitted from the jit-ed ``value_and_grad``);
  * optional tensor parallelism: conv kernels shard their output-channel
    dimension over 'model' where divisible (XLA inserts the collectives);
  * BatchNorm statistics are computed over the *global* batch under GSPMD,
    matching single-device reference semantics exactly.

Collectives ride ICI within a slice; multi-slice DCN handling is
transparent to this code.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, shape=None, axis_names=("data", "model")) -> Mesh:
    """Build a mesh over ``devices`` (default: all).

    ``shape`` defaults to (n_devices, 1) — pure data parallelism. Pass e.g.
    (n//2, 2) for a data x model hybrid.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, value, model_axis_size: int) -> P:
    """Tensor-parallel rule: shard conv kernels' output-channel (minor) dim
    over 'model' when divisible; replicate everything else. Kernels are 4D
    (HWIO) or 5D for the vmapped column stacks ([3, H, W, I, O])."""
    v = np.asarray(value) if not hasattr(value, "shape") else value
    ndim = getattr(v, "ndim", 0)
    if model_axis_size > 1 and ndim in (4, 5):
        out_ch = v.shape[-1]
        if out_ch % model_axis_size == 0 and out_ch >= 2 * model_axis_size:
            return P(*([None] * (ndim - 1)), "model")
    return P()


def param_shardings(mesh: Mesh, variables) -> dict:
    """A pytree of NamedShardings matching ``variables``."""
    model_axis = mesh.shape.get("model", 1)

    def to_sharding(path, value):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return NamedSharding(mesh, _param_spec(keys, value, model_axis))

    return jax.tree_util.tree_map_with_path(to_sharding, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree onto the mesh per the sharding rules."""
    shardings = param_shardings(mesh, variables)
    return jax.tree.map(jax.device_put, variables, shardings)


def shard_batch(batch_arrays: dict, mesh: Mesh) -> dict:
    """Place batch arrays with the leading dim sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(np.asarray(v), sharding) for k, v in batch_arrays.items()}
