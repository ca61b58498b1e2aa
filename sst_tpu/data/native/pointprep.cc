// pointprep — native host-side point-cloud preprocessing for sst_tpu.
//
// TPU-native counterpart of the host work the reference leaves to Python
// dataloader workers (mmdet3d pipelines) and to CUDA voxelization kernels
// (ops/voxel/src/voxelization.h — here voxelization runs on-device in XLA,
// but the host must keep 8 TPU cores fed: file decode, range filter,
// augmentation transforms, subsample+pad to the static cap; SURVEY §7.3.6).
//
// C ABI for ctypes (no pybind11 in this image). All functions are
// thread-safe and operate on caller-provided buffers.
//
// Build: see build.py (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>

extern "C" {

// Read a float32 .bin file into out (capacity cap_floats). Returns number of
// floats read, or -1 on error. Plain fread — the kernel page cache makes
// this the fastest portable path.
int64_t pp_read_bin(const char* path, float* out, int64_t cap_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t n = (int64_t)fread(out, sizeof(float), (size_t)cap_floats, f);
  fclose(f);
  return n;
}

// In-place filter of points [n, c] to the xy/z range; returns new count.
int64_t pp_range_filter(float* pts, int64_t n, int64_t c, const float* pcr) {
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * c;
    if (p[0] >= pcr[0] && p[0] < pcr[3] && p[1] >= pcr[1] && p[1] < pcr[4] &&
        p[2] >= pcr[2] && p[2] < pcr[5]) {
      if (w != i) memcpy(pts + w * c, p, sizeof(float) * (size_t)c);
      ++w;
    }
  }
  return w;
}

// Global rotation (about z), scale, translation — applied to points [n, c]
// (xyz in cols 0..2) and boxes [g, bdim] (xyz 0..2, dims 3..5, yaw 6,
// optional velocity 7..8). Matches pipelines.GlobalRotScaleTrans semantics:
// x' = x cos + y sin; y' = -x sin + y cos; yaw += angle.
void pp_global_rot_scale_trans(float* pts, int64_t n, int64_t c, float* boxes,
                               int64_t g, int64_t bdim, float angle,
                               float scale, const float* trans) {
  const float cs = cosf(angle), sn = sinf(angle);
  for (int64_t i = 0; i < n; ++i) {
    float* p = pts + i * c;
    const float x = p[0], y = p[1];
    p[0] = (x * cs + y * sn) * scale + trans[0];
    p[1] = (-x * sn + y * cs) * scale + trans[1];
    p[2] = p[2] * scale + trans[2];
  }
  for (int64_t i = 0; i < g; ++i) {
    float* b = boxes + i * bdim;
    const float x = b[0], y = b[1];
    b[0] = (x * cs + y * sn) * scale + trans[0];
    b[1] = (-x * sn + y * cs) * scale + trans[1];
    b[2] = b[2] * scale + trans[2];
    b[3] *= scale;
    b[4] *= scale;
    b[5] *= scale;
    b[6] += angle;
    if (bdim > 8) {
      const float vx = b[7], vy = b[8];
      b[7] = (vx * cs + vy * sn) * scale;
      b[8] = (-vx * sn + vy * cs) * scale;
    }
  }
}

// BEV flip: axis 0 = horizontal (y *= -1, yaw = -yaw + pi), 1 = vertical
// (x *= -1, yaw = -yaw) — lidar_box3d.flip with the v0.15 (sin, cos)
// heading unit vector.
void pp_flip(float* pts, int64_t n, int64_t c, float* boxes, int64_t g,
             int64_t bdim, int axis) {
  const int col = axis == 0 ? 1 : 0;
  for (int64_t i = 0; i < n; ++i) pts[i * c + col] = -pts[i * c + col];
  for (int64_t i = 0; i < g; ++i) {
    float* b = boxes + i * bdim;
    b[col] = -b[col];
    b[6] = axis == 0 ? -b[6] + (float)M_PI : -b[6];
    if (bdim > 8) b[7 + col] = -b[7 + col];
  }
}

// Fisher-Yates subsample+shuffle of points [n, c] into out [cap, c] with a
// validity count returned: if n > cap, a uniform random subset (without
// replacement); else all points (shuffled) + zero padding.
int64_t pp_shuffle_pad(const float* pts, int64_t n, int64_t c, float* out,
                       int64_t cap, uint64_t seed) {
  std::mt19937_64 rng(seed);
  const int64_t keep = n < cap ? n : cap;
  // reservoir-free: sample indices by partial Fisher-Yates over [0, n)
  // using a lazily-initialized index map (hash map would allocate; for
  // n <= a few hundred k a full index array is cheap).
  int64_t* idx = new int64_t[(size_t)n];
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  for (int64_t i = 0; i < keep; ++i) {
    const int64_t j = i + (int64_t)(rng() % (uint64_t)(n - i));
    std::swap(idx[i], idx[j]);
    memcpy(out + i * c, pts + idx[i] * c, sizeof(float) * (size_t)c);
  }
  delete[] idx;
  if (keep < cap)
    memset(out + keep * c, 0, sizeof(float) * (size_t)((cap - keep) * c));
  return keep;
}

// tanh over feature columns [start, end) of points [n, c] (the WOD
// intensity/elongation hack, single_stage_fsd.py:287-295) — done on host to
// keep the jitted graph shape-only.
void pp_tanh_cols(float* pts, int64_t n, int64_t c, int64_t start,
                  int64_t end) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = start; j < end; ++j) pts[i * c + j] = tanhf(pts[i * c + j]);
}

// Full prep fused in one pass per sample (decode file → filter → aug →
// shuffle+pad). Returns kept count or -1 on read error.
int64_t pp_prepare_sample(const char* path, int64_t load_dim,
                          const int32_t* use_dims, int64_t n_use,
                          const float* pcr, float angle, float scale,
                          const float* trans, int flip_h, int flip_v,
                          float* out, int64_t cap, uint64_t seed,
                          float* scratch, int64_t scratch_floats) {
  int64_t nf = pp_read_bin(path, scratch, scratch_floats);
  if (nf < 0) return -1;
  int64_t n = nf / load_dim;
  // select columns in place (compact to n_use stride)
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < n_use; ++j)
      scratch[i * n_use + j] = scratch[i * load_dim + use_dims[j]];
  if (flip_h) pp_flip(scratch, n, n_use, nullptr, 0, 7, 0);
  if (flip_v) pp_flip(scratch, n, n_use, nullptr, 0, 7, 1);
  pp_global_rot_scale_trans(scratch, n, n_use, nullptr, 0, 7, angle, scale,
                            trans);
  n = pp_range_filter(scratch, n, n_use, pcr);
  return pp_shuffle_pad(scratch, n, n_use, out, cap, seed);
}

}  // extern "C"
