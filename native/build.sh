#!/bin/sh
# Build the native host-ops shared library.
# margipose_tpu/native.py also invokes this automatically on first import
# if the library is missing or stale.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libmargipose_host_ops.so margipose_host_ops.cpp
echo "built native/libmargipose_host_ops.so"
