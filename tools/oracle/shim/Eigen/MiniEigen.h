// Minimal Eigen subset for compiling the reference LinearSFM as a test
// oracle. The reference uses only Matrix3d (comma-init, inverse, operator())
// at LinearSFMImp.cpp:3027-3040 and VectorXi (resize/size/data/operator())
// at :2383-2440. This is NOT Eigen; it exists so the unmodified reference
// sources build without external dependencies.
#pragma once
#include <vector>
#include <cstddef>

namespace Eigen {

class Matrix3d {
 public:
  double d[9];
  Matrix3d() { for (int k = 0; k < 9; ++k) d[k] = 0.0; }
  double& operator()(int r, int c) { return d[3 * r + c]; }
  double operator()(int r, int c) const { return d[3 * r + c]; }

  struct Loader {
    Matrix3d* m; int k;
    Loader& operator,(double v) { m->d[k++] = v; return *this; }
  };
  Loader operator<<(double v) { d[0] = v; return Loader{this, 1}; }

  Matrix3d inverse() const {
    const double* a = d;
    double A = a[4] * a[8] - a[5] * a[7];
    double B = a[5] * a[6] - a[3] * a[8];
    double C = a[3] * a[7] - a[4] * a[6];
    double det = a[0] * A + a[1] * B + a[2] * C;
    double id = det != 0.0 ? 1.0 / det : 0.0;
    Matrix3d r;
    r.d[0] = A * id;
    r.d[1] = (a[2] * a[7] - a[1] * a[8]) * id;
    r.d[2] = (a[1] * a[5] - a[2] * a[4]) * id;
    r.d[3] = B * id;
    r.d[4] = (a[0] * a[8] - a[2] * a[6]) * id;
    r.d[5] = (a[2] * a[3] - a[0] * a[5]) * id;
    r.d[6] = C * id;
    r.d[7] = (a[1] * a[6] - a[0] * a[7]) * id;
    r.d[8] = (a[0] * a[4] - a[1] * a[3]) * id;
    return r;
  }
};

class VectorXi {
 public:
  std::vector<int> v;
  int size() const { return (int)v.size(); }
  void resize(std::ptrdiff_t n) { v.resize(n); }
  int* data() { return v.data(); }
  int& operator()(std::ptrdiff_t i) { return v[i]; }
  const int& operator()(std::ptrdiff_t i) const { return v[i]; }
};

}  // namespace Eigen
