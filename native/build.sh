#!/bin/sh
# Build the native host-ops shared library.
# margipose_tpu/native.py builds it automatically on first import if the
# library is missing or stale; both paths compile to a temp file and rename
# it into place so concurrent builders never expose a half-written .so.
set -e
cd "$(dirname "$0")"
tmp="libmargipose_host_ops.so.build.$$"
g++ -O3 -fPIC -shared -std=c++17 -o "$tmp" margipose_host_ops.cpp
mv -f "$tmp" libmargipose_host_ops.so
echo "built native/libmargipose_host_ops.so"
