"""The driver's multi-chip gate artifact, run in-suite.

Executing ``dryrun_multichip(8)`` here both proves the sharded train step
end-to-end on the virtual 8-device CPU mesh and pre-warms the persistent
compilation cache (shared ``.jax_cache`` dir) so the driver's own
invocation hits cached executables on this single-core host.
"""

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


@pytest.mark.slow  # 91s measured (r4 durations profile)
def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    start = time.monotonic()
    ge.dryrun_multichip(8)
    elapsed = time.monotonic() - start
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    # Round 4: the dryrun also records flagship GSPMD evidence every run
    # (compile-only second child step).
    assert "flagship GSPMD compile OK" in out
    # Driver budget guard: even with a cold cache both child steps must
    # compile + run in well under the driver timeout; warm runs take
    # seconds (persistent cache shared with the rest of the suite).
    assert elapsed < 600, f"dryrun took {elapsed:.0f}s — over driver budget"


def test_entry_traces():
    # The driver compile-checks entry() on the real chip; here just verify
    # it traces to the expected output shape (cheap — no XLA compile).
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert tuple(out.shape) == (8, 17, 3)
