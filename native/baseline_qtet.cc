// Single-core CPU baseline for the q_tet benchmark.
//
// Faithful reimplementation of the reference's hot path for the tetrahedral
// order parameter (allNearNeighbors, waterlib.f90:830-862 + per-water 4-NN
// argsort + tetraCosAng, water_properties.py:364-388) as straight-line C++
// with the same algorithmic structure the Fortran/f2py pipeline executes:
// an O(N^2) minimum-image neighbor scan followed by per-center 4-nearest
// selection and 6 pair angles. No threading, no SIMD intrinsics — this is
// the "single x86 core" baseline that BASELINE.md calls for (the reference
// ships CPython-3.7 .so files and no Fortran compiler exists in this image,
// so an equivalent C++ build is the stand-in).
//
// Build: g++ -O3 -o baseline_qtet baseline_qtet.cc
// Run:   ./baseline_qtet [n_waters=4096] [n_frames=3]
// Output: one line "frames_per_sec <value>"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <vector>
#include <random>
#include <algorithm>

static inline double min_image(double d, double box, double ibox) {
  return d - box * std::nearbyint(d * ibox);
}

int main(int argc, char** argv) {
  const int n = argc > 1 ? std::atoi(argv[1]) : 4096;
  const int frames = argc > 2 ? std::atoi(argv[2]) : 3;
  const double density = 0.033456;
  const double box = std::cbrt(n / density);
  const double ibox = 1.0 / box;
  const double high = 10.0, high_sq = high * high;

  std::mt19937 rng(42);
  std::uniform_real_distribution<double> uni(0.0, box);
  std::vector<double> x(n), y(n), z(n);

  double qsum_total = 0.0;
  auto t0 = std::chrono::steady_clock::now();
  for (int f = 0; f < frames; ++f) {
    for (int i = 0; i < n; ++i) { x[i] = uni(rng); y[i] = uni(rng); z[i] = uni(rng); }

    // per-center: scan all atoms, keep 4 nearest within (0, high]
    double qsum = 0.0;
    for (int i = 0; i < n; ++i) {
      double best_d[4] = {1e30, 1e30, 1e30, 1e30};
      double best_v[4][3];
      int cnt = 0;
      for (int j = 0; j < n; ++j) {
        if (j == i) continue;
        double dx = min_image(x[j] - x[i], box, ibox);
        double dy = min_image(y[j] - y[i], box, ibox);
        double dz = min_image(z[j] - z[i], box, ibox);
        double dsq = dx * dx + dy * dy + dz * dz;
        if (dsq > 0.0 && dsq <= high_sq) {
          ++cnt;
          // insertion into the 4-best list
          if (dsq < best_d[3]) {
            int k = 3;
            while (k > 0 && dsq < best_d[k - 1]) {
              best_d[k] = best_d[k - 1];
              best_v[k][0] = best_v[k - 1][0];
              best_v[k][1] = best_v[k - 1][1];
              best_v[k][2] = best_v[k - 1][2];
              --k;
            }
            best_d[k] = dsq;
            best_v[k][0] = dx; best_v[k][1] = dy; best_v[k][2] = dz;
          }
        }
      }
      if (cnt == 0) continue;
      int m = std::min(cnt, 4);
      double s = 0.0;
      int pairs = 0;
      for (int a = 0; a < m; ++a) {
        for (int b = a + 1; b < m; ++b) {
          double na = std::sqrt(best_d[a]), nb = std::sqrt(best_d[b]);
          double c = (best_v[a][0] * best_v[b][0] + best_v[a][1] * best_v[b][1] +
                      best_v[a][2] * best_v[b][2]) / (na * nb);
          c = std::min(1.0, std::max(-1.0, c));
          s += (c + 1.0 / 3.0) * (c + 1.0 / 3.0);
          ++pairs;
        }
      }
      // pad to 6 angles with cos = -1 (the reference's 180-degree padding)
      s += (6 - pairs) * (4.0 / 9.0);
      qsum += 1.0 - 0.375 * s;
    }
    qsum_total += qsum / n;
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::printf("frames_per_sec %.6f\n", frames / secs);
  std::printf("mean_q %.6f\n", qsum_total / frames);
  return 0;
}
