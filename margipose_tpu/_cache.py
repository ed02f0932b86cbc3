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
    """Key the cache dir by everything that determines XLA:CPU AOT target
    features.

    XLA records *derived* LLVM target features in AOT results (tuning flags
    like ``+prefer-no-gather``), which are a function of (a) the CPU's raw
    feature flags, (b) the CPU model/family (uarch-specific tuning), and
    (c) the LLVM baked into jaxlib. Keying on all three means two hosts can
    share a cache entry only when the derived features provably match, so
    cross-host loads can never SIGILL. (The cpu_aot_loader.cc mismatch
    message that still appears on SAME-host loads is an upstream cosmetic
    artefact: the loader compares the recorded LLVM feature string, tuning
    flags included, against plain host-detected features that never list
    tuning flags — see __graft_entry__.dryrun_multichip for how the driver
    tail stays clean.)
    """
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "model name", "cpu family", "model",
                           "stepping", "vendor_id"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                if line.strip() == "" and parts:
                    break  # first CPU block is enough
    except OSError:
        pass
    if not parts:
        import platform

        parts = [platform.machine(), platform.processor()]
    try:
        from importlib.metadata import version

        parts.append("jaxlib=" + version("jaxlib"))
    except Exception:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


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
