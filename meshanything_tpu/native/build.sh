#!/bin/sh
# Build the native geometry kernels (ctypes shared library).
#
#   ./build.sh        build libgeom.so
#   ./build.sh test   also build + run the ASan/UBSan test harness
set -e
cd "$(dirname "$0")"
# Reproducible output (ADVICE r3): no linker build-id (it hashes link-time
# inputs incl. temp paths), no host paths in debug strings, and a PINNED
# ISA level — -march=native made the blob depend on which host in the
# fleet last ran the build (the hash churned across sessions with zero
# source changes; measured r4). x86-64-v3 (AVX2/FMA baseline) keeps the
# vectorization that matters for the UDF grid while making rebuilds
# byte-identical everywhere.
g++ -O3 -march=x86-64-v3 -shared -fPIC -pthread \
    -Wl,--build-id=none -ffile-prefix-map="$(pwd)"=. \
    -o libgeom.so geom.cpp
echo "built $(pwd)/libgeom.so ($(sha256sum libgeom.so | cut -c1-12))"

if [ "$1" = "test" ]; then
  g++ -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer -pthread \
      -o test_geom geom.cpp test_geom.cpp
  ./test_geom
fi
