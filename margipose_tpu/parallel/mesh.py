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


def host_local_slice(global_batch_size: int, process_index=None,
                     process_count=None) -> slice:
    """Rows of the global batch this process is responsible for loading.

    On a multi-host TPU slice each process runs its own input pipeline and
    loads ``global_batch_size / process_count`` examples (SURVEY.md §5.8);
    the global device array is then assembled from the per-process shards by
    ``put_batch_array``. Processes own contiguous row blocks in process-index
    order, matching jax.make_array_from_process_local_data's layout for a
    batch-dim-sharded array over devices enumerated in process order.
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    assert global_batch_size % pc == 0, (
        f"global batch {global_batch_size} must divide over {pc} processes")
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def put_batch_array(arr, sharding: NamedSharding):
    """Place one batch array on the mesh, multi-process aware.

    Single process: a plain ``device_put`` (the host sees the global batch).
    Multi-process: ``arr`` is this process's local shard of the batch
    (rows ``host_local_slice(global_batch)``) and the global jax.Array is
    assembled with ``jax.make_array_from_process_local_data`` — the per-host
    batch-assembly path the reference has no analogue of (SURVEY.md §5.8).
    """
    arr = np.asarray(arr)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, arr)
    return jax.device_put(arr, sharding)


def host_local_values(arr) -> np.ndarray:
    """This process's addressable rows of a batch-sharded global array,
    concatenated in global row order (the inverse of ``put_batch_array`` for
    host-side metric/visualisation paths — a multi-process ``np.asarray``)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    # Keep one shard per batch-row block: arrays replicated over a 'model'
    # axis expose each row block once per replica in addressable_shards.
    by_start = {}
    for s in arr.addressable_shards:
        by_start.setdefault(s.index[0].start or 0, s)
    shards = [by_start[k] for k in sorted(by_start)]
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def shard_batch(batch_arrays: dict, mesh: Mesh) -> dict:
    """Place batch arrays with the leading dim sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return {k: put_batch_array(v, sharding) for k, v in batch_arrays.items()}
