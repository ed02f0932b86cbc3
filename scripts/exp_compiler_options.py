#!/usr/bin/env python3
"""Experiment: per-compile XLA ``compiler_options`` on the TPU hot graphs.

BASELINE.md's train-MFU irreducibility record rested on "server-side XLA
scheduling flags are unreachable — the axon client rejects XLA_FLAGS" (the
21.7 ms reduce-fusion stall is attributed to XLA's internal HBM prefetch
scheduling). Round 4 proved this jaxlib DOES accept per-compile
``compiler_options`` (__graft_entry__.py uses them for CPU collective
timeouts); this script closes the last untried avenue by compiling the
flagship bf16 train step — or, with ``--target infer``, the headline
inference forward at its winning batch — with candidate scheduler / fusion
/ memory-space-assignment DebugOptions and FIFO-timing each variant against
the stock compile, interleaved to cancel link drift.

Usage (real chip): python scripts/exp_compiler_options.py [--target infer]
Results are appended to BASELINE.md by hand; see "Round-5 compiler_options
experiment".
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from os import path

REPO = path.dirname(path.dirname(path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 32
INFER_BATCH = 64  # bench.py's winning headline batch (BASELINE.md)
ITERS = 10
ROUNDS = 3

# Candidate DebugOptions. Names must exist in this libtpu's DebugOptions
# proto — unknown names make compile() raise, which is recorded as
# "rejected" rather than failing the experiment.
CANDIDATES = {
    # async-op overlap scheduler (public scaling-guide flag)
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # larger scoped-vmem budget lets fusions keep more operands resident
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    # memory-space-assignment prefetch aggressiveness: the r2 attribution
    # blames concurrently-scheduled prefetch DMAs for the reduce-fusion
    # stall; scaling MSA's assumed copy bandwidth changes how aggressively
    # it schedules those prefetches
    "msa_half_bw": {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"},
    "msa_double_bw": {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"},
    # combo of the accepted-most-likely pair
    "lhs+vmem": {"xla_tpu_enable_latency_hiding_scheduler": "true",
                 "xla_tpu_scoped_vmem_limit_kib": "65536"},
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=("train", "infer"), default="train")
    args = ap.parse_args()

    from margipose_tpu._cache import enable_compile_cache

    enable_compile_cache(REPO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.default_backend() == "tpu", "run on the real chip"

    from margipose_tpu.models import Default_MargiPose_Desc, create_model
    from margipose_tpu.train.schedules import make_optimiser
    from margipose_tpu.train.steps import (
        create_train_state,
        make_forward_fn,
        make_train_step,
    )

    model = create_model(Default_MargiPose_Desc)
    rng = jax.random.PRNGKey(0)
    opt = make_optimiser("1cycle", lr=1.0, max_iters=1000)

    rnd = np.random.RandomState(1)
    state = create_train_state(model, rng, opt, input_shape=(1, 256, 256, 3))
    jax.block_until_ready(state.params)

    if args.target == "train":
        batch = {
            "input": jnp.asarray(rnd.randn(BATCH, 256, 256, 3), jnp.float32),
            "target": jnp.asarray(rnd.uniform(-0.9, 0.9, (BATCH, 17, 3)),
                                  jnp.float32),
            "joint_mask": jnp.ones((BATCH, 17), np.float32),
            "valid_depth": jnp.ones((BATCH,), jnp.int32),
        }
        # donate=False so ONE state feeds every variant (no state chaining);
        # relative step times are what matters and all variants share the
        # donation behaviour.
        step = make_train_step(model, opt, donate=False,
                               compute_dtype="bfloat16")
        fn_args = (state, batch)
        lowered = step.lower(*fn_args)  # lower() reads avals only
    else:
        # the headline metric's exact graph: bench.py's bf16 forward at the
        # winning batch size
        images = jnp.asarray(
            rnd.randn(INFER_BATCH, 256, 256, 3), jnp.float32)
        forward = make_forward_fn(model, compute_dtype="bfloat16")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fn_args = (variables, images)
        lowered = forward.lower(*fn_args)

    compiled = {}
    for name, opts in [("baseline", None)] + list(CANDIDATES.items()):
        t0 = time.perf_counter()
        try:
            compiled[name] = (lowered.compile(compiler_options=opts)
                              if opts else lowered.compile())
            log(f"compile[{name}]: {time.perf_counter() - t0:.1f}s")
        except Exception as e:
            log(f"compile[{name}]: REJECTED ({type(e).__name__}: "
                f"{str(e)[:160]})")

    # bench.py's FIFO methodology (calibrated relay read latency, one
    # scalar read per timed drain) — imported, not re-implemented, so a
    # future timing-bias fix there propagates here
    from bench import _bench, _read_latency

    _read_latency()  # calibrate before any timed drain

    times = {name: [] for name in compiled}
    for r in range(ROUNDS):
        for name, fn in compiled.items():
            dt = _bench(fn, fn_args, iters=ITERS, warmup=2)
            times[name].append(dt)
            log(f"round {r} {name}: {dt * 1e3:.2f} ms/step")

    base = min(times["baseline"])
    summary = {}
    for name in compiled:
        best = min(times[name])
        summary[name] = {
            "best_ms": round(best * 1e3, 2),
            "all_ms": [round(t * 1e3, 2) for t in times[name]],
            "vs_baseline": round(best / base, 4),
        }
    for name in CANDIDATES:
        if name not in compiled:
            summary[name] = {"rejected": True}
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
