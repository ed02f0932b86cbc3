"""Mixed-precision policy for TPU training/inference.

TPU MXU throughput roughly doubles (and HBM traffic halves) with bfloat16
activations/weights. The policy used here is the standard one:

  * **master parameters stay float32** — the cast to the compute dtype
    happens *inside* the jitted step, so gradients and optimiser updates
    are float32 (the cast is linear, XLA fuses it into the conv reads);
  * **batch-norm running statistics stay float32** — flax computes batch
    statistics in float32 internally regardless of input dtype, and the
    running-stat EMA update (momentum 0.1) needs float32 accumulation;
  * **softmax / DSNT / losses stay float32** — the model heads upcast
    before `flat_softmax` (see margipose_tpu/models/margipose.py), so the
    tiny numerically-sensitive tail is unaffected.

The reference has no analogue (PyTorch 1.1 fp32-only training,
reference: src/margipose/bin/train_3d.py:179-186); checkpoint-parity
evaluation should therefore use float32 (the default everywhere).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

# Trace-time compute-dtype scope. Layers (TorchConv/BatchNorm/...) consult
# this when they are *traced*; jitted step functions enter the scope inside
# their Python body, so each compiled executable bakes in one policy and the
# module tree needs no dtype plumbing.
_COMPUTE_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "margipose_compute_dtype", default=None
)


def current_compute_dtype():
    """The active compute dtype (None = full float32)."""
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    """Run layer tracing under a compute dtype ('bfloat16' or None)."""
    token = _COMPUTE_DTYPE.set(resolve_dtype(dtype))
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(token)

# Trace-time shard-map axis scope, same pattern as the compute dtype above:
# when a step function is traced inside jax.shard_map over the 'data' mesh
# axis, modules that must reduce over the GLOBAL batch (BatchNorm batch
# statistics) consult this to emit the pmean — no axis_name plumbing through
# the module tree, and the same model code serves the single-device, GSPMD
# and shard_map paths.
_SHARD_AXIS: contextvars.ContextVar = contextvars.ContextVar(
    "margipose_shard_axis", default=None
)


def current_shard_axis():
    """Mesh axis name cross-device batch reductions must span (or None)."""
    return _SHARD_AXIS.get()


@contextlib.contextmanager
def shard_axis_scope(axis_name):
    """Run layer tracing under a shard_map data axis (e.g. 'data' or None)."""
    token = _SHARD_AXIS.set(axis_name)
    try:
        yield
    finally:
        _SHARD_AXIS.reset(token)


_DTYPES = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def resolve_dtype(name):
    """'float32' / 'bfloat16' / dtype / None -> jnp dtype or None."""
    if name is None:
        return None
    if isinstance(name, str):
        try:
            return _DTYPES[name]
        except KeyError:
            raise ValueError(
                f"unknown precision {name!r}; expected one of {sorted(_DTYPES)}"
            ) from None
    return jnp.dtype(name).type


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``.

    Non-float leaves (step counters, int masks) pass through unchanged.
    ``dtype=None`` is the identity.
    """
    if dtype is None:
        return tree

    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree.map(cast, tree)
