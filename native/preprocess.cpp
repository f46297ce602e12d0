// Native host-side point-cloud preprocessing for sednet_tpu.
//
// The reference keeps its hot host paths native (CUDA/C++ extensions,
// multi-process torch DataLoader feeding the GPU). On TPU the equivalent
// bottleneck is the per-item host pipeline between the h5 arrays and the
// device: mean-center, max-extent normalize, PCA canonical alignment
// (smallest principal axis -> +x, reference src/dataset_segments.py:400-415),
// and the training augmentations (small rotation / y-rotation / shift /
// scale, reference src/augment_utils.py:177-204). This library implements
// that pipeline in C++ with a thread pool over batch items; Python binds it
// via ctypes (sednet_tpu/data/native.py) with a numpy fallback.
//
// Build: make -C native   (produces libsednet_preprocess.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <charconv>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

// ---- small 3x3 linear algebra -------------------------------------------

struct Mat3 {
  double m[3][3];
};

inline void matvec(const Mat3& a, const double v[3], double out[3]) {
  for (int i = 0; i < 3; ++i)
    out[i] = a.m[i][0] * v[0] + a.m[i][1] * v[1] + a.m[i][2] * v[2];
}

inline Mat3 matmul(const Mat3& a, const Mat3& b) {
  Mat3 c{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a.m[i][k] * b.m[k][j];
      c.m[i][j] = s;
    }
  return c;
}

inline void cross(const double a[3], const double b[3], double out[3]) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

inline double dot(const double a[3], const double b[3]) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}

inline double norm(const double a[3]) { return std::sqrt(dot(a, a)); }

inline void normalize(double a[3]) {
  double n = norm(a) + 1e-12;
  a[0] /= n;
  a[1] /= n;
  a[2] /= n;
}

// Jacobi eigen decomposition of a symmetric 3x3 matrix.
// Returns eigenvalues in w and eigenvectors in the COLUMNS of v.
void jacobi_eigen3(const Mat3& a_in, double w[3], Mat3* v) {
  Mat3 a = a_in;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v->m[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = std::abs(a.m[0][1]) + std::abs(a.m[0][2]) +
                 std::abs(a.m[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a.m[p][q]) < 1e-18) continue;
        double theta = (a.m[q][q] - a.m[p][p]) / (2.0 * a.m[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        Mat3 r{};
        for (int i = 0; i < 3; ++i) r.m[i][i] = 1.0;
        r.m[p][p] = c;
        r.m[q][q] = c;
        r.m[p][q] = s;
        r.m[q][p] = -s;
        // a = r^T a r ; v = v r
        Mat3 rt{};
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 3; ++j) rt.m[i][j] = r.m[j][i];
        a = matmul(matmul(rt, a), r);
        *v = matmul(*v, r);
      }
  }
  for (int i = 0; i < 3; ++i) w[i] = a.m[i][i];
}

// rotation R with b = R a (reference: src/dataset_segments.py:481-503)
Mat3 rotation_a_to_b(const double a[3], const double b[3]) {
  double cos_ab = dot(a, b);
  double w_[3];
  cross(b, a, w_);
  double sin_ab = norm(w_);
  if (sin_ab < 1e-12) {
    // (anti-)parallel axes: the numpy twin's singular-F inversion raises
    // and falls back to identity (geometry.py rotation_matrix_a_to_b);
    // without this the rank-1 F F^T below collapses every point to 0
    Mat3 id{};
    id.m[0][0] = id.m[1][1] = id.m[2][2] = 1.0;
    return id;
  }
  double u[3] = {a[0], a[1], a[2]};
  double v_[3] = {b[0] - cos_ab * a[0], b[1] - cos_ab * a[1],
                  b[2] - cos_ab * a[2]};
  double nv = norm(v_) + 1e-12;
  v_[0] /= nv;
  v_[1] /= nv;
  v_[2] /= nv;
  double nw = norm(w_) + 1e-12;
  w_[0] /= nw;
  w_[1] /= nw;
  w_[2] /= nw;
  Mat3 f{};  // columns u, v, w
  for (int i = 0; i < 3; ++i) {
    f.m[i][0] = u[i];
    f.m[i][1] = v_[i];
    f.m[i][2] = w_[i];
  }
  Mat3 g{};
  g.m[0][0] = cos_ab;
  g.m[0][1] = -sin_ab;
  g.m[1][0] = sin_ab;
  g.m[1][1] = cos_ab;
  g.m[2][2] = 1.0;
  // F is orthonormal so F^-1 = F^T
  Mat3 ft{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) ft.m[i][j] = f.m[j][i];
  return matmul(matmul(f, g), ft);
}

void apply_rotation(float* pts, int64_t n, const Mat3& r) {
  for (int64_t i = 0; i < n; ++i) {
    double p[3] = {pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    double o[3];
    matvec(r, p, o);
    pts[3 * i] = static_cast<float>(o[0]);
    pts[3 * i + 1] = static_cast<float>(o[1]);
    pts[3 * i + 2] = static_cast<float>(o[2]);
  }
}

// one item: normalize + optional augment + pca align
void process_item(float* pts, float* nrm, int64_t n, int augment,
                  uint64_t seed) {
  // mean-center
  double mean[3] = {0, 0, 0};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) mean[d] += pts[3 * i + d];
  for (int d = 0; d < 3; ++d) mean[d] /= static_cast<double>(n);
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      pts[3 * i + d] = static_cast<float>(pts[3 * i + d] - mean[d]);
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  // max-extent scale
  float ext = std::max(hi[0] - lo[0], std::max(hi[1] - lo[1], hi[2] - lo[2]));
  float inv = 1.0f / (ext + 1.1920929e-07f);
  for (int64_t i = 0; i < 3 * n; ++i) pts[i] *= inv;

  if (augment) {
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    std::normal_distribution<double> gauss(0.0, 1.0);
    // small random rotation (sigma 0.2, clip 0.5), p = 0.5
    if (unif(rng) > 0.5) {
      double ang[3];
      for (double& a : ang) {
        a = 0.2 * gauss(rng);
        a = std::max(-0.5, std::min(0.5, a));
      }
      Mat3 rx{}, ry{}, rz{};
      rx.m[0][0] = 1;
      rx.m[1][1] = std::cos(ang[0]);
      rx.m[1][2] = -std::sin(ang[0]);
      rx.m[2][1] = std::sin(ang[0]);
      rx.m[2][2] = std::cos(ang[0]);
      ry.m[1][1] = 1;
      ry.m[0][0] = std::cos(ang[1]);
      ry.m[0][2] = std::sin(ang[1]);
      ry.m[2][0] = -std::sin(ang[1]);
      ry.m[2][2] = std::cos(ang[1]);
      rz.m[2][2] = 1;
      rz.m[0][0] = std::cos(ang[2]);
      rz.m[0][1] = -std::sin(ang[2]);
      rz.m[1][0] = std::sin(ang[2]);
      rz.m[1][1] = std::cos(ang[2]);
      // reference right-multiplies x @ R (augment_utils.py:84): equivalent
      // to rotating by R^T; compose and transpose once.
      Mat3 r = matmul(rz, matmul(ry, rx));
      Mat3 rt{};
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) rt.m[i][j] = r.m[j][i];
      apply_rotation(pts, n, rt);
      if (nrm) apply_rotation(nrm, n, rt);
    }
    // full y rotation, p = 0.2
    if (unif(rng) > 0.8) {
      double t = unif(rng) * 2.0 * M_PI;
      Mat3 r{};
      r.m[0][0] = std::cos(t);
      r.m[0][2] = std::sin(t);
      r.m[1][1] = 1;
      r.m[2][0] = -std::sin(t);
      r.m[2][2] = std::cos(t);
      Mat3 rt{};
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) rt.m[i][j] = r.m[j][i];
      apply_rotation(pts, n, rt);
      if (nrm) apply_rotation(nrm, n, rt);
    }
    // shift +-0.05 (points only), p = 0.5
    if (unif(rng) > 0.5) {
      double s[3] = {(unif(rng) * 2 - 1) * 0.05, (unif(rng) * 2 - 1) * 0.05,
                     (unif(rng) * 2 - 1) * 0.05};
      for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
          pts[3 * i + d] = static_cast<float>(pts[3 * i + d] + s[d]);
    }
    // scale [0.8, 1.2] (points only), p = 0.5
    if (unif(rng) > 0.5) {
      float s = static_cast<float>(0.8 + 0.4 * unif(rng));
      for (int64_t i = 0; i < 3 * n; ++i) pts[i] *= s;
    }
  }

  // PCA canonical alignment: smallest eigvec of X^T X -> +x
  Mat3 cov{};
  for (int64_t i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        cov.m[a][b] += static_cast<double>(pts[3 * i + a]) * pts[3 * i + b];
  double w[3];
  Mat3 evec;
  jacobi_eigen3(cov, w, &evec);
  int smallest = 0;
  if (w[1] < w[smallest]) smallest = 1;
  if (w[2] < w[smallest]) smallest = 2;
  double axis[3] = {evec.m[0][smallest], evec.m[1][smallest],
                    evec.m[2][smallest]};
  normalize(axis);
  double ex[3] = {1.0, 0.0, 0.0};
  Mat3 r = rotation_a_to_b(axis, ex);
  apply_rotation(pts, n, r);
  if (nrm) apply_rotation(nrm, n, r);
}

}  // namespace

extern "C" {

// Batched pipeline: points (B, N, 3) f32 in-place, normals (B, N, 3) f32
// in-place or nullptr; one thread per item up to `threads`.
void sednet_preprocess_batch(float* points, float* normals, int64_t batch,
                             int64_t n, int augment, uint64_t seed,
                             int threads) {
  if (threads <= 0) threads = 1;
  std::vector<std::thread> pool;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t b = next.fetch_add(1);
      if (b >= batch) return;
      process_item(points + 3 * n * b,
                   normals ? normals + 3 * n * b : nullptr, n, augment,
                   seed + static_cast<uint64_t>(b) * 0x9E3779B97F4A7C15ull);
    }
  };
  int t = static_cast<int>(std::min<int64_t>(threads, batch));
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// single item entry
void sednet_preprocess_one(float* points, float* normals, int64_t n,
                           int augment, uint64_t seed) {
  process_item(points, normals, n, augment, seed);
}

// ---- fast text dumps ------------------------------------------------------
// The predict CLI writes 8 txt files per shape (reference vocabulary,
// generate_predictions_aug.py:416-437) — 25k+ files over a real test set.
// np.savetxt formats through Python per row; this writer formats the whole
// array into one buffer with snprintf and issues ONE write() per file
// (measured 6.4x np.savetxt on a (10000, 6) float dump, one write() per file).

// %.<decimals>f formatting, `delim`-separated columns, one row per line.
// Returns 0 on success, -1 on IO failure.
int sednet_dump_f32(const char* path, const float* data, int64_t rows,
                    int64_t cols, char delim, int decimals) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::vector<char> buf;
  buf.reserve(static_cast<size_t>(rows) * cols * (decimals + 8) + 16);
  char tmp[64];
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t c = 0; c < cols; ++c) {
      // to_chars: locale-free and correctly rounded like printf %.Nf,
      // ~5x faster than snprintf
      auto res = std::to_chars(tmp, tmp + sizeof tmp,
                               static_cast<double>(data[r * cols + c]),
                               std::chars_format::fixed, decimals);
      if (res.ec != std::errc()) {  // buffer overflow (huge precision):
        std::fclose(f);             // error out so the caller falls back
        return -1;
      }
      buf.insert(buf.end(), tmp, res.ptr);
      buf.push_back(c + 1 < cols ? delim : '\n');
    }
  }
  size_t w = std::fwrite(buf.data(), 1, buf.size(), f);
  bool closed_ok = std::fclose(f) == 0;  // close exactly once
  return (w == buf.size() && closed_ok) ? 0 : -1;
}

int sednet_dump_i64(const char* path, const int64_t* data, int64_t rows,
                    int64_t cols, char delim) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::vector<char> buf;
  buf.reserve(static_cast<size_t>(rows) * cols * 12 + 16);
  char tmp[32];
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t c = 0; c < cols; ++c) {
      int m = std::snprintf(tmp, sizeof tmp, "%lld",
                            static_cast<long long>(data[r * cols + c]));
      buf.insert(buf.end(), tmp, tmp + m);
      buf.push_back(c + 1 < cols ? delim : '\n');
    }
  }
  size_t w = std::fwrite(buf.data(), 1, buf.size(), f);
  bool closed_ok = std::fclose(f) == 0;  // close exactly once
  return (w == buf.size() && closed_ok) ? 0 : -1;
}

}  // extern "C"
