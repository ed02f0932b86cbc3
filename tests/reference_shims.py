"""Shared dependency shims for the reference-exec test modules.

The reference imports ``pose3d_utils`` (not installed here); these are the
minimal torch implementations of its 3-line coordinate helpers that the
reference's eval.py / data/skeleton.py / models import. One copy, imported
by every reference-exec module — these shims are parity-critical glue, so
a divergence fix must reach all of them. No reference logic lives here:
everything of numeric substance in the modules under test is the
reference's OWN code, importlib-executed from /root/reference.
"""

import types

import torch


def pose3d_coords_shim():
    """Module shim for ``pose3d_utils.coords`` (append/divide-out the
    homogeneous w; reference: pose3d_utils package, SURVEY.md §2.2)."""
    m = types.ModuleType("pose3d_utils.coords")

    def cartesian_to_homogeneous(cart):
        return torch.cat([cart, torch.ones_like(cart[..., :1])], -1)

    def homogeneous_to_cartesian(hom):
        return hom[..., :-1] / hom[..., -1:]

    def ensure_homogeneous(coords, d):
        if coords.size(-1) == d + 1:
            return coords
        assert coords.size(-1) == d
        return cartesian_to_homogeneous(coords)

    def ensure_cartesian(coords, d):
        if coords.size(-1) == d:
            return coords
        assert coords.size(-1) == d + 1
        return homogeneous_to_cartesian(coords)

    m.cartesian_to_homogeneous = cartesian_to_homogeneous
    m.homogeneous_to_cartesian = homogeneous_to_cartesian
    m.ensure_homogeneous = ensure_homogeneous
    m.ensure_cartesian = ensure_cartesian
    return m
