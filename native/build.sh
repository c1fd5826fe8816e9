#!/bin/sh
# Build the native helpers into nnpde_tpu/_native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../nnpde_tpu/_native
g++ -O3 -shared -fPIC -o ../nnpde_tpu/_native/libnnpde_native.so \
    tridiag_eigh.cpp
echo "built nnpde_tpu/_native/libnnpde_native.so"
