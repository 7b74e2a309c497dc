#!/bin/sh
# Build the native geometry kernels (ctypes shared library).
#
#   ./build.sh        build libgeom.so
#   ./build.sh test   also build + run the ASan/UBSan test harness
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libgeom.so geom.cpp
echo "built $(pwd)/libgeom.so"

if [ "$1" = "test" ]; then
  g++ -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
      -o test_geom geom.cpp test_geom.cpp
  ./test_geom
fi
