"""Checkpoint save/restore.

Native format: Orbax checkpoints holding the full train state — params,
batch_stats, optimiser state, step, model_desc — fixing the reference's
resume asymmetry, which saved but never restored optimiser state and epoch
(reference: src/margipose/bin/train_3d.py:285-291,374-382).

Reference .pth pickles are importable transparently via
``margipose_tpu.train.torch_import`` — ``load_model`` dispatches on file
type.
"""

from __future__ import annotations

import json
import os
from os import path

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _bulk_to_host(tree):
    """One pipelined device->host fetch of the whole pytree before
    serialisation. Orbax awaits leaves one-by-one during save, which on a
    remote-relay runtime costs ~one round-trip per leaf — measured 792.6 s
    for the flagship's 1,122-leaf / 463 MB train state vs 8.2 s for a
    single ``jax.device_get`` of the same pytree (BASELINE.md
    "Checkpoint-save path"). Multi-host sharded states keep the
    orbax-native path: each process must write only its addressable
    shards, which orbax coordinates itself."""
    if _is_multihost():
        return tree
    return jax.device_get(tree)


def _is_multihost() -> bool:
    return jax.process_count() > 1


def _is_primary() -> bool:
    return jax.process_index() == 0


def _sync(tag: str):
    """Cross-process barrier (no-op single-process). Multi-host saves are
    collective — every process calls orbax with its addressable shards —
    but the directory swap and meta write are process-0-only and must not
    race the other processes' save calls (or their subsequent restores)."""
    if _is_multihost():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _write_and_swap(ckpt_dir: str, payload: dict, meta: dict):
    """Serialise ``payload`` (host arrays) and swap it in crash-safely.

    Multi-host: the orbax save is collective (all processes participate,
    each writing only its addressable shards), while the stale-state
    cleanup, directory swap and meta write run on process 0 only, fenced by
    barriers — without the fence both processes would race the
    ``state.next`` -> ``state`` rename (the second rename lands inside the
    already-swapped directory or fails outright; caught by the real
    2-process test in tests/test_multihost_real.py)."""
    import glob as _glob
    import shutil

    ocp = _ocp()
    nxt = path.join(ckpt_dir, "state.next")
    old = path.join(ckpt_dir, "state.old")
    final = path.join(ckpt_dir, "state")
    if _is_primary():
        # stale leftovers from an interrupted save
        shutil.rmtree(nxt, ignore_errors=True)
        for stale in _glob.glob(path.join(ckpt_dir, "*.orbax-checkpoint-tmp*")):
            shutil.rmtree(stale, ignore_errors=True)
    _sync("margipose:ckpt:pre_save")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(nxt, payload)
    _sync("margipose:ckpt:post_save")
    if _is_primary():
        shutil.rmtree(old, ignore_errors=True)
        if path.isdir(final):
            os.rename(final, old)
        os.rename(nxt, final)
        meta_tmp = path.join(ckpt_dir, "meta.json.tmp")
        with open(meta_tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(meta_tmp, path.join(ckpt_dir, "meta.json"))
        shutil.rmtree(old, ignore_errors=True)
    _sync("margipose:ckpt:post_swap")


class _BackgroundSave:
    """Daemon save thread whose ``join()`` re-raises any save exception —
    a silently-dead background save would let training run on with a stale
    (or no) checkpoint on disk."""

    def __init__(self, target, args):
        import threading

        self._exc: BaseException | None = None

        def _run():
            try:
                target(*args)
            except BaseException as exc:  # re-raised on join()
                self._exc = exc

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def join(self, timeout: float | None = None):
        self._thread.join(timeout)
        if self._exc is not None and not self._thread.is_alive():
            exc, self._exc = self._exc, None
            raise exc


def save_checkpoint(ckpt_dir: str, state, model_desc: dict,
                    extra: dict | None = None, background: bool = False):
    """Save train state + model_desc to ``ckpt_dir`` (overwrites).

    Crash-safe: the new state is written to a fresh directory and swapped in
    with renames, keeping the previous state as ``state.old`` until the new
    one is fully on disk. A process killed mid-save therefore never loses
    the last good checkpoint (restore falls back to ``state.old``).

    With ``background=True`` the device->host fetch still happens
    synchronously (the state's buffers may be donated to the next train
    step), but the disk serialisation + swap run in a returned daemon
    thread — callers MUST ``.join()`` it before starting another save to
    the same directory and before relying on the checkpoint being on disk;
    ``join()`` re-raises any exception the save hit. Returns the thread
    wrapper, or None when synchronous. Multi-host runs force a synchronous
    save: there the payload still references live device shards (orbax must
    see each process's addressable shards), which the next donated train
    step would delete out from under a background writer."""
    ckpt_dir = path.abspath(ckpt_dir)
    payload = _bulk_to_host({
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    })
    meta = {"model_desc": model_desc}
    if extra:
        meta.update(extra)
    if background and not _is_multihost():
        return _BackgroundSave(_write_and_swap, (ckpt_dir, payload, meta))
    _write_and_swap(ckpt_dir, payload, meta)
    return None


def _state_dir_with_fallback(ckpt_dir: str) -> str:
    state_dir = path.join(ckpt_dir, "state")
    if path.isdir(state_dir):
        return state_dir
    old = path.join(ckpt_dir, "state.old")
    if path.isdir(old):
        print(f"checkpoint: '{state_dir}' missing (interrupted save?); "
              f"falling back to '{old}'")
        return old
    return state_dir  # let orbax raise its not-found error


def _restore_numpy(directory: str, template, partial_restore: bool = False):
    """Restore a pytree to HOST NUMPY regardless of how or where it was
    saved. Left to its defaults, orbax restores jax.Arrays: (a) COMMITTED
    to specific devices — mixed with mesh-sharded params the train step's
    dispatch fails with "incompatible devices", and under multi-process,
    re-placing a committed array onto the global mesh is a cross-host
    transfer the CPU backend does not support; (b) using the sharding
    recorded at SAVE time — unresolvable when the checkpoint was written
    under a different process topology (loading a 2-process-saved
    checkpoint in a single-process eval raises "sharding ... Got None").
    Both caught by the real 2-process runs in tests/test_multihost_real.py.
    Host-numpy leaves let every caller re-place onto its own mesh exactly
    like a fresh state."""
    ocp = _ocp()
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            directory,
            args=ocp.args.PyTreeRestore(item=template,
                                        restore_args=restore_args,
                                        partial_restore=partial_restore))


def restore_checkpoint(ckpt_dir: str, template_state):
    """Restore a full train state saved by ``save_checkpoint``. Leaves come
    back as host numpy (see _restore_numpy); callers re-place them onto
    their mesh exactly like a fresh state (bin/train_3d.py:252-257)."""
    ckpt_dir = path.abspath(ckpt_dir)
    payload = {
        "step": template_state.step,
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
    }
    restored = _restore_numpy(_state_dir_with_fallback(ckpt_dir), payload)
    return template_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def load_meta(ckpt_dir: str) -> dict:
    with open(path.join(ckpt_dir, "meta.json")) as f:
        return json.load(f)


def save_model(ckpt_dir: str, variables, model_desc: dict):
    """Save inference weights only (params + batch_stats) — the analogue of
    the reference's stripped export (reference: src/margipose/bin/export_model.py:44-50)."""
    ckpt_dir = path.abspath(ckpt_dir)
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.join(ckpt_dir, "variables"),
                   _bulk_to_host(dict(variables)), force=True)
    _sync("margipose:ckpt:post_save_model")
    if _is_primary():
        with open(path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump({"model_desc": model_desc}, f, indent=2, sort_keys=True)
    _sync("margipose:ckpt:post_meta_model")


def load_model(model_file: str):
    """Load a model + weights from either a margipose_tpu Orbax checkpoint
    directory or a reference torch .pth file
    (reference: src/margipose/models/__init__.py:30-34).

    Returns (model, variables, model_desc).
    """
    import jax.numpy as jnp

    from margipose_tpu.models import create_model

    if path.isfile(model_file) and model_file.endswith((".pth", ".pt")):
        from margipose_tpu.train.torch_import import import_torch_model

        return import_torch_model(model_file)

    meta = load_meta(model_file)
    model_desc = meta["model_desc"]
    model = create_model(model_desc)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    # saved either as full train state or variables-only
    state_dir = _state_dir_with_fallback(model_file)
    var_dir = path.join(model_file, "variables")
    if path.isdir(var_dir):
        variables = _restore_numpy(var_dir, dict(template))
    else:
        payload = _restore_numpy(
            state_dir,
            {"params": template["params"],
             "batch_stats": template["batch_stats"]},
            partial_restore=True)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
    return model, variables, model_desc
