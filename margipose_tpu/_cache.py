"""Persistent XLA compilation-cache setup, shared by tests, bench and the
driver entry points.

The cache dir is keyed by a host-CPU fingerprint: XLA:CPU AOT executables
record the *compile-time* machine features and loading one on a host with
different features can SIGILL (cpu_aot_loader.cc warns exactly this). The
repo directory persists across rounds that may run on different hosts, so a
flat shared cache dir is a crash hazard — each host gets its own subdir.
No heavy imports here; this runs before jax is configured.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(
        (platform.machine() + platform.processor()).encode()).hexdigest()[:10]


def compile_cache_dir(repo_root: str) -> str:
    """Host-keyed cache dir (honours JAX_COMPILATION_CACHE_DIR verbatim)."""
    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit:
        return explicit
    path = os.path.join(repo_root, ".jax_cache", _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    return path


def enable_compile_cache(repo_root: str, min_compile_secs: float = 1.0) -> str:
    import jax

    path = compile_cache_dir(repo_root)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
