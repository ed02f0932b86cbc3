"""Crash resilience of the driver's dryrun_multichip gate.

MULTICHIP_r03.json recorded rc=134: XLA:CPU's collective rendezvous
abort()ed the whole process when a participant thread was starved past the
40 s terminate timeout on this one-core host — a raw abort(), unrecoverable
in-process by design (the same dryrun passes deterministically when
re-run). dryrun_multichip now runs each step in a subprocess and retries on
abnormal termination. These tests inject SIGABRT via the
MARGIPOSE_DRYRUN_TEST_ABORT_UNTIL hook (the child abort()s before any model
build/compile on attempts <= N) to prove the retry path converts the exact recorded
failure mode into a green artifact, and — in the slow tier — that the
artifact survives a real CPU-starved host (a spinning sibling process on
this single-core box).
"""

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow  # 42s measured (r4 durations profile)
def test_retry_recovers_from_abort(monkeypatch, capsys):
    """First attempt dies with SIGABRT (the r03 failure mode); the retry
    succeeds and the artifact line is still printed."""
    import __graft_entry__ as ge

    monkeypatch.setenv("MARGIPOSE_DRYRUN_TEST_ABORT_UNTIL", "1")
    monkeypatch.setenv("MARGIPOSE_DRYRUN_ATTEMPTS", "2")
    # flagship compile is covered by test_graft_entry; keep this one cheap
    monkeypatch.setenv("MARGIPOSE_DRYRUN_SKIP_FLAGSHIP", "1")
    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out


def test_exhausted_retries_raise(monkeypatch):
    """If every attempt aborts, the failure surfaces (rc recorded) rather
    than hanging or silently passing. Cheap relative to a real dryrun: the
    injected abort fires before any model build or compile — though each
    attempt still pays the child's jax import (__graft_entry__ imports jax
    at module top level under JAX_PLATFORMS=cpu)."""
    import __graft_entry__ as ge

    monkeypatch.setenv("MARGIPOSE_DRYRUN_TEST_ABORT_UNTIL", "99")
    monkeypatch.setenv("MARGIPOSE_DRYRUN_ATTEMPTS", "2")
    monkeypatch.setenv("MARGIPOSE_DRYRUN_SKIP_FLAGSHIP", "1")
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        ge.dryrun_multichip(8)


def test_deterministic_failure_fails_fast(monkeypatch, capsys):
    """A positive child rc (deterministic Python/assertion failure) must
    surface after ONE attempt: retrying it would fail identically while
    multiplying time-to-failure by MARGIPOSE_DRYRUN_ATTEMPTS on this
    slow-compile host. Only abnormal termination (signal / timeout) — the
    starvation SIGABRT mode the retry exists for — is retried."""
    import __graft_entry__ as ge

    monkeypatch.setenv("MARGIPOSE_DRYRUN_TEST_FAIL_UNTIL", "99")
    monkeypatch.setenv("MARGIPOSE_DRYRUN_ATTEMPTS", "3")
    monkeypatch.setenv("MARGIPOSE_DRYRUN_SKIP_FLAGSHIP", "1")
    with pytest.raises(RuntimeError, match="after 1 attempts"):
        ge.dryrun_multichip(8)
    assert "retrying" not in capsys.readouterr().err


@pytest.mark.slow
def test_dryrun_survives_cpu_starvation(monkeypatch, capsys):
    """Forced starvation: a spinning sibling process halves this one-core
    host's CPU for the whole dryrun. The raised collective terminate
    timeout (600 s via compiler_options) plus subprocess retries must still
    deliver a green artifact — the exact scenario that turned
    MULTICHIP_r03.json red."""
    import __graft_entry__ as ge

    monkeypatch.setenv("MARGIPOSE_DRYRUN_SKIP_FLAGSHIP", "1")
    hog = subprocess.Popen(
        [sys.executable, "-c",
         "import time\nend = time.monotonic() + 900\n"
         "while time.monotonic() < end: pass"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        start = time.monotonic()
        ge.dryrun_multichip(8)
        elapsed = time.monotonic() - start
    finally:
        hog.kill()
        hog.wait()
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert elapsed < 900, f"dryrun under starvation took {elapsed:.0f}s"
