#!/usr/bin/env python3
"""Verify the full-schedule soak (scripts/soak_full_schedule.sh):

1. the recorded metrics traverse the ENTIRE reference 1cycle trajectory —
   warmup from lr_max/10, peak lr_max at 0.45T, anneal through lr_max/10 at
   0.9T down to lr_max/1e4 at T, momentum 0.9 -> 0.85 -> 0.9
   (reference: src/margipose/hyperparam_scheduler.py:6-21);
2. training converged monotone-ish through the anneal (median loss of the
   last schedule decade below the first post-warmup decade; no terminal
   blow-up);
3. the final checkpoint restores (params + optimiser step counter at T) and
   its export strict-loads into the reference's OWN executed MargiPoseModel
   (reuses tests/test_reference_models.py's module loader + shims).

Run from the repo root after the soak: python scripts/soak_verify.py [exp_dir]
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(exp_dir):
    ok = True

    def check(name, cond, detail=""):
        nonlocal ok
        status = "PASS" if cond else "FAIL"
        print(f"[{status}] {name}" + (f" — {detail}" if detail else ""))
        ok = ok and cond

    with open(os.path.join(exp_dir, "config.json")) as f:
        cfg = json.load(f)
    records = [json.loads(l) for l in open(os.path.join(exp_dir, "metrics.jsonl"))]
    epochs = int(cfg["epochs"])
    lr_max = float(cfg["lr"])
    check("all epochs recorded", len(records) == epochs,
          f"{len(records)}/{epochs}")

    lrs = np.array([r["lr"] for r in records])
    moms = np.array([r["momentum"] for r in records])
    losses = np.array([r["train_loss"] for r in records])

    # the recorded trajectory must equal the schedule function (itself
    # trajectory-pinned to the reference's executed scheduler in
    # tests/test_reference_parity.py) evaluated at each epoch's LAST update
    from margipose_tpu.train.schedules import schedule_values

    # floor division: the training loader drops the last partial batch
    # (train/helpers.py drop_last=True; loader.__len__), so the trainer's
    # steps_per_epoch/max_iters are floors, not ceilings
    steps_per_epoch = int(cfg["train_examples"]) // int(cfg["batch_size"])
    max_iters = epochs * steps_per_epoch
    expected = np.array([
        schedule_values(cfg["optim_algorithm"], lr_max,
                        e * steps_per_epoch - 1, max_iters=max_iters)
        for e in range(1, epochs + 1)])
    lr_err = np.abs(lrs - expected[:, 0]).max()
    mom_err = np.abs(moms - expected[:, 1]).max()
    # meters round-trip through float32, so compare at float32 precision
    check("recorded lr trajectory == reference schedule at epoch boundaries",
          lr_err < 1e-6, f"max |lr delta| {lr_err:.2e}")
    check("recorded momentum trajectory == reference schedule",
          mom_err < 1e-6, f"max |momentum delta| {mom_err:.2e}")

    # 1cycle endpoints (epoch-boundary samples straddle the exact 0.45T
    # peak, so the max recorded lr sits within one epoch's slope of lr_max)
    peak_tol = 0.9 * lr_max / (0.45 * epochs)
    check("peak lr reaches lr_max mid-cycle (within one epoch's slope)",
          abs(lrs.max() - lr_max) < peak_tol and 0.3 < lrs.argmax() / epochs < 0.6,
          f"max lr {lrs.max():.4g} at epoch {lrs.argmax()}")
    check("terminal anneal endpoint lr_max/1e4",
          abs(lrs[-1] - lr_max * 1e-4) < lr_max * 2e-5, f"final lr {lrs[-1]:.3g}")
    at_09T = lrs[int(0.9 * epochs) - 1]
    check("lr back at lr_max/10 at 0.9T",
          abs(at_09T - lr_max * 0.1) < lr_max * 0.02, f"lr(0.9T) {at_09T:.4g}")
    check("momentum dips to 0.85 mid-cycle and returns to 0.9",
          abs(moms.min() - 0.85) < 1e-3 and abs(moms[-1] - 0.9) < 1e-3
          and abs(moms[0] - 0.9) < 0.05,
          f"min {moms.min():.3f}, final {moms[-1]:.3f}")

    # convergence through the anneal: compare decade medians, and the tail
    # must not blow up
    d = max(epochs // 10, 1)
    first = np.median(losses[d:2 * d])   # post-warmup decade
    last = np.median(losses[-d:])        # the anneal decade
    check("monotone-ish convergence (last decade < post-warmup decade)",
          last < first, f"median loss {first:.4f} -> {last:.4f}")
    check("no terminal blow-up", np.isfinite(losses).all()
          and losses[-1] < 1.5 * last,
          f"final loss {losses[-1]:.4f}")

    # final checkpoint restores with the optimiser at step T
    from margipose_tpu.train import checkpoint as ckpt

    model, variables, model_desc = ckpt.load_model(
        os.path.join(exp_dir, "model-latest"))
    meta = ckpt.load_meta(os.path.join(exp_dir, "model-latest"))
    check("final checkpoint restores at epoch T",
          int(meta.get("epoch", -1)) == epochs, f"epoch {meta.get('epoch')}")

    # export -> reference strict-load (the reference's OWN executed model)
    import torch

    import test_reference_models as trm
    from margipose_tpu.train.torch_import import export_state_dict

    # drive the module-scoped fixture's generator directly (its shims +
    # loader are exactly what we need outside pytest)
    ref_models_gen = trm.ref_models.__wrapped__()
    ref_mm, _ = next(ref_models_gen)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_state_dict(dict(variables)).items()}
    ref_model = ref_mm.MargiPoseModelFactory().create(model_desc)
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()
    check("export strict-loads into reference-executed MargiPoseModel", True)

    # and the reference forward on the trained weights matches ours
    import jax.numpy as jnp

    size = model_desc["settings"].get("input_size", 256)
    x = np.random.RandomState(5).randn(2, 3, size, size).astype(np.float32)
    with torch.no_grad():
        ref_xyz = ref_model(torch.from_numpy(x)).numpy()
    xyz, _ = jax.jit(model.apply, static_argnames="train")(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    err = np.abs(np.asarray(xyz) - ref_xyz).max()
    check("reference forward agrees on the trained weights", err < 5e-3,
          f"max coord delta {err:.2e}")

    print("soak verification:", "ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_out/soak150"
    raise SystemExit(main(exp))
