#!/bin/sh
# Build the native geometry kernels (ctypes shared library).
#
#   ./build.sh        build libgeom.so
#   ./build.sh test   also build + run the ASan/UBSan test harness
set -e
cd "$(dirname "$0")"
# Reproducible output (ADVICE r3): no linker build-id (it hashes link-time
# inputs incl. temp paths), no host paths in debug strings — so rebuilding
# unchanged sources yields a byte-identical .so and version control only
# churns when geom.cpp actually changes.
g++ -O3 -march=native -shared -fPIC \
    -Wl,--build-id=none -ffile-prefix-map="$(pwd)"=. \
    -o libgeom.so geom.cpp
echo "built $(pwd)/libgeom.so ($(sha256sum libgeom.so | cut -c1-12))"

if [ "$1" = "test" ]; then
  g++ -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
      -o test_geom geom.cpp test_geom.cpp
  ./test_geom
fi
