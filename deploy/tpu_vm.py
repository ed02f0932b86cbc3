#!/usr/bin/env python3
"""Launch margipose-tpu training on a Cloud TPU VM or GKE TPU slice.

TPU-native replacement for the reference's single-GPU Kubernetes launcher
(reference: k8s/deploy.py:33-174 — builds a Docker image and schedules one
1-GPU pod per experiment). Two backends:

  * ``tpu-vm``  — `gcloud compute tpus tpu-vm` create/ssh/delete: provisions
    a TPU VM of the requested accelerator type, rsyncs this repo, installs
    deps, and runs `margipose train ...` under nohup.
  * ``gke``     — emits a JobSet-style Kubernetes manifest requesting
    `google.com/tpu` resources for multi-host slices, to be applied with
    kubectl (multi-host data parallelism via jax.distributed; the in-repo
    training stack shards the batch over all chips with pjit —
    margipose_tpu/parallel/mesh.py).

Every gcloud/kubectl interaction goes through ``run()`` so ``--dry-run``
prints the exact commands/manifests without side effects (also used by the
unit tests; there is no cloud access in CI).
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from os import path

REPO_ROOT = path.dirname(path.dirname(path.abspath(__file__)))

SETUP_CMDS = (
    "sudo apt-get install -y g++ ffmpeg || true && "
    "pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && "
    "pip install flax optax orbax-checkpoint einops h5py pillow pandas tabulate tqdm scipy && "
    "pip install -e ~/margipose-tpu && sh ~/margipose-tpu/native/build.sh"
)


def run(cmd: list, dry_run: bool):
    print("+ " + " ".join(shlex.quote(c) for c in cmd), flush=True)
    if dry_run:
        return 0
    return subprocess.run(cmd).returncode


def deploy_tpu_vm(args) -> int:
    name = args.name
    gcloud_tpu = ["gcloud", "compute", "tpus", "tpu-vm"]
    zone = ["--zone", args.zone]

    rc = run(gcloud_tpu + ["create", name, *zone,
                           "--accelerator-type", args.accelerator_type,
                           "--version", args.runtime_version], args.dry_run)
    if rc:
        return rc

    rc = run(["gcloud", "compute", "tpus", "tpu-vm", "scp", "--recurse",
              REPO_ROOT, f"{name}:~/margipose-tpu", *zone, "--worker=all"],
             args.dry_run)
    if rc:
        return rc

    rc = run(gcloud_tpu + ["ssh", name, *zone, "--worker=all",
                           "--command", SETUP_CMDS], args.dry_run)
    if rc:
        return rc

    train_cmd = "cd ~/margipose-tpu && nohup ./run.sh " + " ".join(
        shlex.quote(c) for c in args.command) + " > train.log 2>&1 &"
    rc = run(gcloud_tpu + ["ssh", name, *zone, "--worker=all",
                           "--command", train_cmd], args.dry_run)
    if rc:
        return rc

    print(f"# started; follow with: gcloud compute tpus tpu-vm ssh {name} "
          f"--zone {args.zone} --command 'tail -f ~/margipose-tpu/train.log'")
    if args.auto_delete:
        print(f"# delete with: gcloud compute tpus tpu-vm delete {name} "
              f"--zone {args.zone}")
    return 0


# GKE nodeSelector label values per TPU family
# (cloud.google.com/gke-tpu-accelerator).
_GKE_ACCELERATORS = {
    "v5litepod": "tpu-v5-lite-podslice",
    "v5p": "tpu-v5p-slice",
    "v4": "tpu-v4-podslice",
    "v6e": "tpu-v6e-slice",
}

# Standard v5e slice topologies by chip count.
_V5E_TOPOLOGIES = {1: "1x1", 4: "2x2", 8: "2x4", 16: "4x4", 32: "4x8",
                   64: "8x8", 128: "8x16", 256: "16x16"}


def gke_manifest(args) -> str:
    """An Indexed Job requesting a TPU slice (one pod per host) plus the
    headless Service GKE needs to give pods stable hostnames. On GKE the TPU
    device plugin injects TPU_WORKER_ID / TPU_WORKER_HOSTNAMES into the
    pods, and the trainer calls jax.distributed.initialize() when it sees a
    multi-host environment (margipose_tpu/bin/train_3d.py)."""
    family, _, suffix = args.accelerator_type.rpartition("-")
    gke_accel = _GKE_ACCELERATORS.get(family)
    if gke_accel is None:
        raise SystemExit(
            f"unknown accelerator family {family!r}; known: "
            f"{sorted(_GKE_ACCELERATORS)}")
    # The accelerator-type suffix counts CHIPS for v5e/v6e but TENSORCORES
    # (2 per chip) for v4/v5p (cloud naming convention).
    n_chips = int(suffix) // 2 if family in ("v4", "v5p") else int(suffix)
    topology = args.topology
    if topology is None:
        if family != "v5litepod" or n_chips not in _V5E_TOPOLOGIES:
            raise SystemExit(
                f"--topology is required for {args.accelerator_type}")
        topology = _V5E_TOPOLOGIES[n_chips]
    if family in ("v4", "v5p"):
        # v4/v5p hosts always carry 4 chips
        chips_per_host = min(n_chips, 4)
    else:
        # v5e/v6e: single-host machines carry up to 8 chips; larger slices
        # have 4 chips per host
        chips_per_host = n_chips if n_chips <= 8 else 4
    n_hosts = max(1, n_chips // chips_per_host)
    arg_list = "[" + ", ".join(repr(c) for c in args.command) + "]"
    return f"""\
apiVersion: v1
kind: Service
metadata:
  name: {args.name}
spec:
  clusterIP: None
  selector:
    app: {args.name}
---
apiVersion: batch/v1
kind: Job
metadata:
  name: {args.name}
spec:
  completions: {n_hosts}
  parallelism: {n_hosts}
  completionMode: Indexed
  backoffLimit: 0
  template:
    metadata:
      labels: {{app: {args.name}}}
    spec:
      restartPolicy: Never
      subdomain: {args.name}
      nodeSelector:
        cloud.google.com/gke-tpu-accelerator: {gke_accel}
        cloud.google.com/gke-tpu-topology: {topology}
      containers:
      - name: train
        image: {args.image}
        command: ["./run.sh"]
        args: {arg_list}
        resources:
          requests: {{"google.com/tpu": "{chips_per_host}"}}
          limits: {{"google.com/tpu": "{chips_per_host}"}}
        volumeMounts:
        - {{name: datasets, mountPath: /datasets, readOnly: true}}
        env:
        - {{name: MARGIPOSE_BASE_DATA_DIR, value: /datasets}}
      volumes:
      - name: datasets
        persistentVolumeClaim: {{claimName: {args.datasets_pvc}}}
"""


def deploy_gke(args) -> int:
    manifest = gke_manifest(args)
    print(manifest)
    if args.dry_run:
        return 0
    proc = subprocess.run(["kubectl", "apply", "-f", "-"], input=manifest,
                          text=True)
    return proc.returncode


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backend", choices=["tpu-vm", "gke"], default="tpu-vm")
    parser.add_argument("--name", required=True, help="TPU VM / job name")
    parser.add_argument("--zone", default="us-central1-a")
    parser.add_argument("--accelerator-type", default="v5litepod-8")
    parser.add_argument("--runtime-version", default="tpu-ubuntu2204-base")
    parser.add_argument("--topology", default=None, help="GKE TPU topology")
    parser.add_argument("--image", default="margipose-tpu:latest")
    parser.add_argument("--datasets-pvc", default="margipose-datasets")
    parser.add_argument("--auto-delete", action="store_true")
    parser.add_argument("--dry-run", action="store_true",
                        help="print commands/manifests without executing")
    parser.add_argument("command", nargs=argparse.REMAINDER,
                        help="margipose command, e.g. -- train with margipose_model mpi3d")
    return parser


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    if args.command and args.command[0] == "--":
        args.command = args.command[1:]
    if not args.command:
        args.command = ["train", "with", "margipose_model", "mpi3d"]
    if args.backend == "tpu-vm":
        return deploy_tpu_vm(args)
    return deploy_gke(args)


if __name__ == "__main__":
    sys.exit(main())
