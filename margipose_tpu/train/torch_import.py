"""Import reference PyTorch checkpoints into flax variable trees.

The published reference checkpoints (``margipose-mpi3d.pth`` /
``margipose-h36m.pth``, reference: README.md:113-118) are torch pickles
``{state_dict, model_desc, train_datasets, optimizer, epoch}``
(reference: src/margipose/bin/train_3d.py:374-382). This module converts the
``state_dict`` to this framework's flax ``{params, batch_stats}`` tree:

  * key mapping is driven by the *flax* tree (every leaf must be fed, so
    missing/mistyped keys fail loudly);
  * conv kernels transpose OIHW -> HWIO; transposed-conv kernels flip+swap
    from torch's IOHW layout (disambiguated by structural patterns and
    verified by shape);
  * BatchNorm weight/bias/running_mean/running_var map to
    scale/bias/mean/var.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

from margipose_tpu.ops.convs import (
    torch_conv_weight_to_hwio,
    torch_convtranspose_weight_to_hwio,
)

# Flax path components that exist only as implementation details.
_DROP_COMPONENTS = {"BatchNorm_0"}

# Leaf-name renames (flax -> torch).
_LEAF_RENAMES = {
    "scale": "weight",
    "mean": "running_mean",
    "var": "running_var",
}

# Transposed-conv weight locations (margipose up-stride blocks; chatterbox
# up path). Everything else with a 4D 'weight' is a regular conv.
_TRANSPOSE_PATTERNS = [
    re.compile(r"up_layers\.2\.(module|shortcut)\.0\.weight$"),
    re.compile(r"(zy|xz)_hm_cnn\.up_convs\.0\.weight$"),
    re.compile(r"(zy|xz)_hm_cnn\.up_convs\.[3-6]\.(conv1|resample\.0)\.weight$"),
]


# MargiPose stacks the three per-stage columns (xy/zy/xz) on a leading axis
# of size 3 via nn.vmap (see models/margipose.py); one flax leaf corresponds
# to THREE torch keys in this plane order.
_STACK_PLANES = ("xy", "zy", "xz")
_STACKED_COLUMN_RE = re.compile(r"hm_cnns_(down|up)_(\d+)")


def flax_path_to_torch_keys(path: tuple[str, ...]) -> list[str]:
    """Map a flax variable path to the reference torch state_dict key(s).

    Returns one key for ordinary leaves, or three (xy/zy/xz) for the
    vmapped column leaves whose values are stacked on a leading axis."""
    for i, c in enumerate(path):
        m = _STACKED_COLUMN_RE.fullmatch(c)
        if m:
            section = f"{m.group(1)}_layers"  # down_layers / up_layers
            stage = m.group(2)
            return [
                flax_path_to_torch_key(
                    path[:i]
                    + (f"{plane}_hm_cnns_{stage}", section)
                    + path[i + 1:]
                )
                for plane in _STACK_PLANES
            ]
    return [flax_path_to_torch_key(path)]


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    """Map a flax variable path to the reference torch state_dict key."""
    comps = [c for c in path if c not in _DROP_COMPONENTS]
    if comps:
        comps[-1] = _LEAF_RENAMES.get(comps[-1], comps[-1])
    out = []
    for c in comps:
        # list-attribute flattening: xy_hm_cnns_0 -> xy_hm_cnns.0
        m = re.fullmatch(r"(xy_hm_cnns|zy_hm_cnns|xz_hm_cnns|hm_combiners)_(\d+)", c)
        if m:
            out.extend([m.group(1), m.group(2)])
            continue
        # chatterbox sequential indices: down_0 -> down_convs.0, up_3 -> up_convs.3
        m = re.fullmatch(r"(down|up)_(\d+)", c)
        if m:
            out.extend([f"{m.group(1)}_convs", m.group(2)])
            continue
        # chatterbox resample shortcut: resample_0 -> resample.0
        m = re.fullmatch(r"resample_(\d+)", c)
        if m:
            out.extend(["resample", m.group(1)])
            continue
        out.append(c)
    return ".".join(out)


def _is_transpose_conv(torch_key: str) -> bool:
    return any(p.search(torch_key) for p in _TRANSPOSE_PATTERNS)


def _leaf_shape(value) -> tuple:
    """Shape of a template leaf — works for arrays AND jax.ShapeDtypeStruct
    (so templates can come from jax.eval_shape, which never allocates)."""
    return tuple(value.shape) if hasattr(value, "shape") else np.asarray(value).shape


def _leaf_dtype(value):
    return value.dtype if hasattr(value, "dtype") else np.asarray(value).dtype


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _unflatten(flat: dict):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for c in path[:-1]:
            node = node.setdefault(c, {})
        node[path[-1]] = v
    return tree


def convert_state_dict(flax_variables, torch_state_dict) -> dict:
    """Produce a flax variables dict matching ``flax_variables``' structure,
    with values taken from ``torch_state_dict``.

    Raises KeyError/ValueError on any missing key or shape mismatch, and
    reports torch keys that were never consumed (except num_batches_tracked).
    """
    torch_state = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in torch_state_dict.items()
    }
    used = set()
    out = {}
    for collection, tree in flax_variables.items():
        flat_out = {}
        for path, value in _flatten(tree):
            keys = flax_path_to_torch_keys(path)
            stacked = len(keys) > 1
            expected = tuple(_leaf_shape(value)[1:] if stacked else _leaf_shape(value))
            parts = []
            for key in keys:
                if key not in torch_state:
                    raise KeyError(
                        f"torch checkpoint is missing '{key}' "
                        f"(for flax {collection}/{'/'.join(path)})"
                    )
                w = torch_state[key]
                used.add(key)
                if w.ndim == 4 and path[-1] == "weight":
                    if _is_transpose_conv(key):
                        w = torch_convtranspose_weight_to_hwio(w)
                    else:
                        w = torch_conv_weight_to_hwio(w)
                if tuple(w.shape) != expected:
                    raise ValueError(
                        f"shape mismatch for {key}: {w.shape} "
                        f"vs expected {expected}"
                    )
                parts.append(w)
            w = np.stack(parts) if stacked else parts[0]
            flat_out[path] = np.asarray(w, dtype=_leaf_dtype(value))
        out[collection] = _unflatten(flat_out)

    leftovers = [
        k for k in torch_state
        if k not in used and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        raise ValueError(f"unconsumed torch keys: {leftovers[:10]} (+{len(leftovers) - 10 if len(leftovers) > 10 else 0} more)")
    return out


def export_state_dict(flax_variables) -> dict:
    """Inverse of ``convert_state_dict``: flax ``{params, batch_stats}`` ->
    reference-format torch state_dict values (numpy; conv weights back to
    OIHW, transposed-conv weights back to torch's IOHW, BN running stats,
    zeroed ``num_batches_tracked`` bookkeeping keys). Keys match
    ``MargiPoseModel.state_dict()`` in the reference
    (reference: src/margipose/bin/train_3d.py:374-382), so the result loads
    into the reference implementation with ``strict=True``."""
    out = {}
    for collection, tree in flax_variables.items():
        for path, value in _flatten(tree):
            keys = flax_path_to_torch_keys(path)
            arr = np.asarray(value)
            parts = list(arr) if len(keys) > 1 else [arr]
            for key, w in zip(keys, parts):
                if w.ndim == 4 and path[-1] == "weight":
                    if _is_transpose_conv(key):
                        # flipped HWIO -> torch IOHW
                        w = np.flip(np.transpose(w, (2, 3, 0, 1)), axis=(2, 3))
                    else:
                        # HWIO -> torch OIHW
                        w = np.transpose(w, (3, 2, 0, 1))
                # fresh C-order copy: ascontiguousarray keeps negative
                # strides on size-1 dims (e.g. flipped 1x1 transposed-conv
                # kernels), which torch.from_numpy rejects
                out[key] = np.array(w)
    for key in [k for k in out if k.endswith("running_mean")]:
        out[key.replace("running_mean", "num_batches_tracked")] = np.asarray(
            0, np.int64)
    return out


# --- ImageNet-pretrained stem import -------------------------------------
#
# The reference initialises the margipose in_cnn from ImageNet weights
# (pretrainedmodels ``inceptionv4(pretrained=...)`` / torchvision
# ``resnet{18,34,50}(pretrained=True)``; reference:
# src/margipose/models/margipose_model.py:104-138). This framework consumes
# the same state_dicts from a local .pth file.

# flax in_cnn child -> torchvision resnet attribute (Sequential wrapper
# indices 0=conv1, 1=bn1, 4=layer1, 5=layer2; 6/7 are the fresh 1x1
# reduction for resnet50 and stay randomly initialised).
_RESNET_STEM_HEADS = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2"}
# inceptionv4: flax children '0'..'6' are pretrainedmodels features.0..6;
# '7'/'8' are the fresh 1x1 conv + BN.
_INCEPTION_PRETRAINED_BLOCKS = {str(i) for i in range(7)}


def _stem_torch_key(path: tuple[str, ...], feature_extractor: str) -> str | None:
    """Torch state_dict key for an in_cnn-relative flax path, or None if the
    leaf is not covered by the pretrained backbone."""
    if feature_extractor == "inceptionv4":
        if path[0] not in _INCEPTION_PRETRAINED_BLOCKS:
            return None
        return "features." + flax_path_to_torch_key(path)
    if feature_extractor.startswith("resnet"):
        head = _RESNET_STEM_HEADS.get(path[0])
        if head is None:
            return None
        rest = flax_path_to_torch_key(path[1:])
        return f"{head}.{rest}" if rest else head
    raise ValueError(f"unsupported feature extractor: {feature_extractor}")


def convert_pretrained_stem(variables, torch_state_dict, feature_extractor: str):
    """Overwrite the in_cnn stem leaves of ``variables`` with ImageNet
    weights from a backbone ``state_dict`` (pretrainedmodels inceptionv4 or
    torchvision resnet18/34/50 format).

    Leaves the fresh layers (the 1x1 reduction conv + BN) and everything
    outside in_cnn untouched. Raises on missing keys or shape mismatches;
    surplus torch keys (deeper backbone blocks, classifier head) are
    expected and ignored. Returns a new variables dict.
    """
    torch_state = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in torch_state_dict.items()
    }
    n_loaded = 0
    out = {}
    for collection, tree in variables.items():
        flat = {}
        for path, value in _flatten(tree):
            if "in_cnn" in path:
                rel = path[path.index("in_cnn") + 1:]
                key = _stem_torch_key(rel, feature_extractor)
                if key is not None:
                    if key not in torch_state:
                        raise KeyError(
                            f"pretrained state_dict is missing '{key}' "
                            f"(for flax {collection}/{'/'.join(path)})")
                    w = torch_state[key]
                    if w.ndim == 4 and path[-1] == "weight":
                        w = torch_conv_weight_to_hwio(w)
                    if tuple(w.shape) != _leaf_shape(value):
                        raise ValueError(
                            f"shape mismatch for {key}: {w.shape} vs "
                            f"expected {_leaf_shape(value)}")
                    flat[path] = np.asarray(w, dtype=_leaf_dtype(value))
                    n_loaded += 1
                    continue
            flat[path] = value
        out[collection] = _unflatten(flat)
    if n_loaded == 0:
        raise ValueError("no stem leaves matched the pretrained state_dict")
    return out


def load_pretrained_stem(variables, path: str, feature_extractor: str):
    """Load a backbone .pth file (a bare state_dict, or a dict with a
    'state_dict' entry) and graft it onto ``variables``' in_cnn stem."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return convert_pretrained_stem(variables, obj, feature_extractor)


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint (torch pickle). Returns the raw dict
    with ``state_dict`` / ``model_desc`` / etc."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def import_torch_model(path: str):
    """Load a reference checkpoint and build (model, variables).

    Returns (model, variables, model_desc). This is the converter required
    for output-parity evaluation against the published checkpoints.
    """
    import jax
    import jax.numpy as jnp

    from margipose_tpu.models import create_model

    details = load_torch_checkpoint(path)
    model_desc = details["model_desc"]
    model = create_model(model_desc)
    # eval_shape: conversion only needs the tree structure + leaf shapes, so
    # never pay a real init/compile for the template.
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32)
    )
    variables = convert_state_dict(template, details["state_dict"])
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, model_desc
