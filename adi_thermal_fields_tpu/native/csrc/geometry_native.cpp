// Native geometry kernels for the host-side STL pipeline.
//
// The device compute path is JAX/XLA/Pallas; this library accelerates the
// host preprocessing that feeds it — chiefly solid voxelization, whose
// Python implementation loops per triangle (geometry/voxelize.py) and
// becomes the bottleneck for production STL meshes (10^5+ triangles at the
// reference's 12M-voxel budget, waam_from_stl_v7_mm.py:219).
//
// The algorithm is IDENTICAL to geometry/voxelize.py::voxelize_solid —
// even-odd parity of ray-triangle crossings below each cell center along
// +z, on a jittered ray lattice — with one optimization: instead of adding
// a "below" indicator over all k per crossing, each crossing increments a
// single counter at its first affected cell and a suffix cumulative sum
// recovers the counts (O(1) per crossing).
//
// Exact-match requirement: the jitter constants and the barycentric
// inside test mirror the Python version so native and numpy paths produce
// the same mask.
//
// Build: g++ -O3 -shared -fPIC (see native/loader.py; no external deps).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// tris: (ntri, 3, 3) float64 vertex coordinates
// origin: (3,) float64 grid origin (min corner of voxel (0,0,0))
// d: (3,) float64 per-axis cell sizes (dx, dy, dz) — anisotropic voxels
// out_mask: (nx*ny*nz) uint8, C-order (x, y, z) — filled with 0/1
int voxelize_parity(const double* tris, int64_t ntri, const double* origin,
                    const double* d, int64_t nx, int64_t ny, int64_t nz,
                    uint8_t* out_mask) {
  const double ox = origin[0], oy = origin[1], oz = origin[2];
  const double dx = d[0], dy = d[1], dz = d[2];
  // jitter constants must match geometry/voxelize.py
  const double jx = 1.1283791670955126e-4 * dx;
  const double jy = 0.7071067811865476e-4 * dy;

  std::vector<int32_t> counts((size_t)nx * ny * nz, 0);

  for (int64_t t = 0; t < ntri; ++t) {
    const double* a = tris + t * 9;
    const double* b = a + 3;
    const double* c = a + 6;

    const double xmin = std::fmin(a[0], std::fmin(b[0], c[0]));
    const double xmax = std::fmax(a[0], std::fmax(b[0], c[0]));
    const double ymin = std::fmin(a[1], std::fmin(b[1], c[1]));
    const double ymax = std::fmax(a[1], std::fmax(b[1], c[1]));

    int64_t i0 = (int64_t)std::floor((xmin - ox) / dx - 0.5);
    int64_t i1 = (int64_t)std::ceil((xmax - ox) / dx - 0.5);
    int64_t j0 = (int64_t)std::floor((ymin - oy) / dy - 0.5);
    int64_t j1 = (int64_t)std::ceil((ymax - oy) / dy - 0.5);
    if (i0 < 0) i0 = 0;
    if (j0 < 0) j0 = 0;
    if (i1 > nx - 1) i1 = nx - 1;
    if (j1 > ny - 1) j1 = ny - 1;
    if (i1 < i0 || j1 < j0) continue;

    const double d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1]);
    if (std::fabs(d) < 1e-300) continue;
    const double inv_d = 1.0 / d;

    for (int64_t i = i0; i <= i1; ++i) {
      const double X = ox + (i + 0.5) * dx + jx;
      for (int64_t j = j0; j <= j1; ++j) {
        const double Y = oy + (j + 0.5) * dy + jy;
        const double w0 = ((b[1] - c[1]) * (X - c[0]) + (c[0] - b[0]) * (Y - c[1])) * inv_d;
        const double w1 = ((c[1] - a[1]) * (X - c[0]) + (a[0] - c[0]) * (Y - c[1])) * inv_d;
        const double w2 = 1.0 - w0 - w1;
        if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) continue;
        const double z_hit = w0 * a[2] + w1 * b[2] + w2 * c[2];
        // first cell whose center z exceeds z_hit
        int64_t k0 = (int64_t)std::floor((z_hit - oz) / dz - 0.5) + 1;
        if (k0 < 0) k0 = 0;
        if (k0 >= nz) continue;
        counts[((size_t)i * ny + j) * nz + k0] += 1;
      }
    }
  }

  // suffix-cumulative parity along z
  for (int64_t i = 0; i < nx; ++i) {
    for (int64_t j = 0; j < ny; ++j) {
      int32_t cum = 0;
      size_t base = ((size_t)i * ny + j) * nz;
      for (int64_t k = 0; k < nz; ++k) {
        cum += counts[base + k];
        out_mask[base + k] = (uint8_t)(cum & 1);
      }
    }
  }
  return 0;
}

}  // extern "C"

extern "C" {

// 6-connected BFS flood fill of 'outside air': void cells reachable from the
// domain boundary.  Replaces the O(diameter * N) iterated-dilation fallback
// (geometry/morphology.py::flood_fill_outside) with a single O(N) pass.
// solid: (nx*ny*nz) uint8 C-order; out_outside: same shape, set to 0/1.
int flood_fill_outside(const uint8_t* solid, int64_t nx, int64_t ny,
                       int64_t nz, uint8_t* out_outside) {
  const size_t n = (size_t)nx * ny * nz;
  std::memset(out_outside, 0, n);
  std::vector<int64_t> stack;
  stack.reserve(1 << 16);

  auto idx = [=](int64_t i, int64_t j, int64_t k) {
    return ((size_t)i * ny + j) * nz + k;
  };
  auto push_if = [&](int64_t i, int64_t j, int64_t k) {
    size_t p = idx(i, j, k);
    if (!solid[p] && !out_outside[p]) {
      out_outside[p] = 1;
      stack.push_back((int64_t)p);
    }
  };

  // seed: all boundary faces
  for (int64_t i = 0; i < nx; ++i)
    for (int64_t j = 0; j < ny; ++j) {
      push_if(i, j, 0);
      push_if(i, j, nz - 1);
    }
  for (int64_t i = 0; i < nx; ++i)
    for (int64_t k = 0; k < nz; ++k) {
      push_if(i, 0, k);
      push_if(i, ny - 1, k);
    }
  for (int64_t j = 0; j < ny; ++j)
    for (int64_t k = 0; k < nz; ++k) {
      push_if(0, j, k);
      push_if(nx - 1, j, k);
    }

  while (!stack.empty()) {
    int64_t p = stack.back();
    stack.pop_back();
    int64_t k = p % nz;
    int64_t j = (p / nz) % ny;
    int64_t i = p / ((int64_t)ny * nz);
    if (i > 0) push_if(i - 1, j, k);
    if (i < nx - 1) push_if(i + 1, j, k);
    if (j > 0) push_if(i, j - 1, k);
    if (j < ny - 1) push_if(i, j + 1, k);
    if (k > 0) push_if(i, j, k - 1);
    if (k < nz - 1) push_if(i, j, k + 1);
  }
  return 0;
}

}  // extern "C"
