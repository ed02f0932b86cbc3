#!/bin/sh
# Convenience launcher (reference: run.sh). Runs the margipose CLI from the
# repo checkout, building the native host-ops library if needed.
set -e
cd "$(dirname "$0")"
[ -f native/libmargipose_host_ops.so ] || sh native/build.sh
exec python -m margipose_tpu.bin "$@"
