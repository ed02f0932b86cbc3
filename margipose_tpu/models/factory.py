"""Versioned model factory registry.

Mirrors the reference registry semantics (reference:
src/margipose/model_factory.py:1-18, src/margipose/models/__init__.py:10-27):
a ``model_desc`` dict ``{type, version, settings}`` is dispatched to a
factory by model type and a caret semver range (e.g. ``^6.0.0``). A minimal
semver matcher is implemented here (the full semantic_version dependency is
unnecessary for caret ranges).
"""

from __future__ import annotations

from abc import ABC, abstractmethod


def parse_version(version: str) -> tuple[int, int, int]:
    parts = version.split("-")[0].split("+")[0].split(".")
    nums = [int(p) for p in parts[:3]]
    while len(nums) < 3:
        nums.append(0)
    return tuple(nums)


def caret_match(spec: str, version: str) -> bool:
    """True iff ``version`` satisfies a caret range ``^X.Y.Z``
    (compatible-with: >= X.Y.Z, < next major; for 0.x, < next minor)."""
    assert spec.startswith("^"), f"only caret ranges are supported, got {spec!r}"
    base = parse_version(spec[1:])
    v = parse_version(version)
    if v < base:
        return False
    if base[0] > 0:
        return v[0] == base[0]
    if base[1] > 0:
        return v[0] == 0 and v[1] == base[1]
    return v[:2] == (0, 0)


class ModelFactory(ABC):
    def __init__(self, model_type: str, version_spec: str):
        self.model_type = model_type
        self.version_spec = version_spec

    def is_for(self, model_type: str, version: str) -> bool:
        return model_type == self.model_type and caret_match(self.version_spec, version)

    @abstractmethod
    def create(self, model_desc: dict):
        """Build the model for a ``model_desc`` this factory ``is_for``
        (dispatch and validation happen in ``models.create_model``)."""
