#!/bin/sh
# Build the native geometry kernels (ctypes shared library).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libgeom.so geom.cpp
echo "built $(pwd)/libgeom.so"
