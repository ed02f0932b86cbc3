#!/usr/bin/env python3
"""Benchmark: flagship-model throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The headline metric is inference images/sec/chip at 256x256 on the flagship
MargiPose model (4 stages, InceptionV4 stem) — the reference's measurement
surface (reference: src/margipose/bin/eval_3d.py:60-62). Train-step
throughput and latency details go to stderr.

``vs_baseline``: the reference publishes no numbers (BASELINE.md) and no
CUDA GPU exists in this environment, so the recorded baseline is this
framework's own round-1 measurement stored in bench_baseline.json —
i.e. vs_baseline tracks round-over-round improvement.
"""

from __future__ import annotations

import json
import sys
import time
from os import path


def _bench(fn, args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from margipose_tpu.models import Default_MargiPose_Desc, create_model
    from margipose_tpu.train.schedules import make_optimiser
    from margipose_tpu.train.steps import create_train_state, make_train_step

    model = create_model(Default_MargiPose_Desc)
    batch = 32
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0).randn(batch, 256, 256, 3),
                         jnp.float32)
    variables = jax.jit(model.init)(rng, images[:1])

    # ---- inference ----
    @jax.jit
    def forward(variables, images):
        xyz, _ = model.apply(variables, images, train=False)
        return xyz

    t = _bench(forward, (variables, images))
    infer_ips = batch / t
    print(f"inference: batch {batch}, {t * 1e3:.2f} ms/step, "
          f"{infer_ips:.1f} images/sec", file=sys.stderr)

    # ---- training ----
    opt = make_optimiser("1cycle", lr=1.0, max_iters=1000)
    state = create_train_state(model, rng, opt, input_shape=(1, 256, 256, 3),
                               variables=variables)
    train_step = make_train_step(model, opt, donate=False)
    rnd = np.random.RandomState(1)
    train_batch = {
        "input": jnp.asarray(rnd.randn(batch, 256, 256, 3), jnp.float32),
        "target": jnp.asarray(rnd.uniform(-0.9, 0.9, (batch, 17, 3)), jnp.float32),
        "joint_mask": jnp.ones((batch, 17), jnp.float32),
        "valid_depth": jnp.ones((batch,), jnp.int32),
    }

    def step(state, batch):
        new_state, metrics = train_step(state, batch)
        return metrics["loss"]

    t_train = _bench(step, (state, train_batch), iters=10, warmup=2)
    train_ips = batch / t_train
    print(f"train: batch {batch}, {t_train * 1e3:.2f} ms/step, "
          f"{train_ips:.1f} images/sec", file=sys.stderr)

    # ---- baseline bookkeeping ----
    baseline_file = path.join(path.dirname(path.abspath(__file__)),
                              "bench_baseline.json")
    if path.isfile(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f)
    else:
        baseline = {"infer_images_per_sec": infer_ips,
                    "train_images_per_sec": train_ips,
                    "device": str(dev)}
        with open(baseline_file, "w") as f:
            json.dump(baseline, f, indent=2)

    vs_baseline = infer_ips / baseline["infer_images_per_sec"]
    print(json.dumps({
        "metric": "margipose_infer_images_per_sec_per_chip_256px",
        "value": round(infer_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
