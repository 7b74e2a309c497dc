// Sanitizer test harness for the native geometry kernels.
//
// Built by build.sh's `test` mode with -fsanitize=address,undefined and
// run immediately — memory-safety coverage for the C++ side (the
// reference tree has no native code of its own to sanitize;
// SURVEY.md §5.2).

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" void udf_grid(const double* vertices, int nv,
                         const int64_t* faces, int nf,
                         int size, double lo, double spacing,
                         float* out);

int main() {
  // unit cube centered at the origin
  const double h = 0.5;
  std::vector<double> v = {
      -h, -h, -h,  h, -h, -h,  h, h, -h,  -h, h, -h,
      -h, -h,  h,  h, -h,  h,  h, h,  h,  -h, h,  h,
  };
  std::vector<int64_t> f = {
      0, 2, 1,  0, 3, 2,  4, 5, 6,  4, 6, 7,  0, 1, 5,  0, 5, 4,
      2, 3, 7,  2, 7, 6,  1, 2, 6,  1, 6, 5,  3, 0, 4,  3, 4, 7,
  };

  for (int size : {8, 32, 33}) {  // odd size exercises non-aligned paths
    const double lo = -1.0;
    const double spacing = 2.0 / (size - 1);
    std::vector<float> out(static_cast<size_t>(size) * size * size, -1.0f);
    udf_grid(v.data(), 8, f.data(), 12, size, lo, spacing, out.data());

    // every value must be finite and non-negative
    for (float x : out) {
      assert(std::isfinite(x));
      assert(x >= 0.0f);
    }
    // the center is ~0.5 from every face (exact-band or Chamfer approx)
    int c = size / 2;
    float center = out[(static_cast<int64_t>(c) * size + c) * size + c];
    assert(center > 0.25f && center < 0.9f);
    // a grid node on the surface has near-zero distance
    int ix = static_cast<int>(std::lround((h - lo) / spacing));
    int iy = static_cast<int>(std::lround((0.0 - lo) / spacing));
    int iz = static_cast<int>(std::lround((0.0 - lo) / spacing));
    float surf = out[(static_cast<int64_t>(ix) * size + iy) * size + iz];
    assert(surf < 2.5f * spacing);
    std::printf("size=%d ok (center=%.3f surf=%.4f)\n", size, center, surf);
  }

  // degenerate inputs must not crash: zero faces
  {
    std::vector<float> out(8 * 8 * 8);
    udf_grid(v.data(), 8, f.data(), 0, 8, -1.0, 2.0 / 7, out.data());
  }

  // the threaded x-slab path (GEOM_THREADS override — this fleet host
  // may have one core) must be bit-identical to the serial path: the
  // slabs are disjoint and the Chamfer pass is serial either way
  {
    const int size = 32;
    const double lo = -1.0, spacing = 2.0 / (size - 1);
    std::vector<float> serial(static_cast<size_t>(size) * size * size);
    std::vector<float> threaded(serial.size());
    setenv("GEOM_THREADS", "1", 1);
    udf_grid(v.data(), 8, f.data(), 12, size, lo, spacing, serial.data());
    setenv("GEOM_THREADS", "4", 1);
    udf_grid(v.data(), 8, f.data(), 12, size, lo, spacing, threaded.data());
    unsetenv("GEOM_THREADS");
    for (size_t i = 0; i < serial.size(); ++i) assert(serial[i] == threaded[i]);
    std::puts("threaded == serial (bit-identical)");
  }
  std::puts("native geom sanitizer test passed");
  return 0;
}
