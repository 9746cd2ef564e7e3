// Native ray-parity voxelizer: triangle soup -> inside mask.
//
// C++ data-path replacement for the Palabos VoxelizedDomain3D classification
// used by getFlagMatrixFromSTL (reference: helper/voxelizeDomain.cpp:75-151,
// ray test helper/mollerTrumbore.h:30-76).  Same algorithm as the numpy
// fallback in hemocell_tpu/utils/voxelize.py (_inside_by_parity): count +x
// Moller-Trumbore ray crossings per (y, z) column, bucket the crossing x
// into cell boundaries, node (x, y, z) is inside iff an odd number of
// crossings lie at larger x.  The numpy path is O(T * Y * Z); here each
// triangle only visits its own (y, z) footprint, which makes vessel-scale
// STLs (cases/AR2, 408^3) classify in well under a second instead of ~20 s.
//
// Built as libhemocell_native.so (see Makefile); loaded via ctypes by
// hemocell_tpu/native.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// tris: [nt][3 vertices][xyz] doubles, already scaled to lattice units with
// the caller's sub-voxel shift applied.  inside: [X*Y*Z] uint8 out.
void hemo_voxelize_parity(const double *tris, int64_t nt, int64_t X,
                          int64_t Y, int64_t Z, uint8_t *inside) {
  const size_t plane = (size_t)Y * (size_t)Z;
  std::vector<int32_t> cnt(((size_t)X + 1) * plane, 0);

#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t t = 0; t < nt; ++t) {
    const double *v0 = tris + t * 9;
    const double *v1 = v0 + 3;
    const double *v2 = v0 + 6;
    const double e1x = v1[0] - v0[0], e1y = v1[1] - v0[1], e1z = v1[2] - v0[2];
    const double e2x = v2[0] - v0[0], e2y = v2[1] - v0[1], e2z = v2[2] - v0[2];
    // ray direction +x: h = cross(d, e2) = (0, -e2z, e2y)
    const double hy = -e2z, hz = e2y;
    const double a = e1y * hy + e1z * hz;
    if (std::fabs(a) <= 1e-12) continue;  // ray parallel to triangle plane
    const double inva = 1.0 / a;

    // only columns under the triangle's (y, z) projection can hit
    const double ymin = std::min(v0[1], std::min(v1[1], v2[1]));
    const double ymax = std::max(v0[1], std::max(v1[1], v2[1]));
    const double zmin = std::min(v0[2], std::min(v1[2], v2[2]));
    const double zmax = std::max(v0[2], std::max(v1[2], v2[2]));
    const int64_t yb = std::max<int64_t>(0, (int64_t)std::ceil(ymin));
    const int64_t ye = std::min<int64_t>(Y - 1, (int64_t)std::floor(ymax));
    const int64_t zb = std::max<int64_t>(0, (int64_t)std::ceil(zmin));
    const int64_t ze = std::min<int64_t>(Z - 1, (int64_t)std::floor(zmax));

    for (int64_t y = yb; y <= ye; ++y) {
      const double sy = (double)y - v0[1];
      for (int64_t z = zb; z <= ze; ++z) {
        const double sz = (double)z - v0[2];
        const double u = (sy * hy + sz * hz) * inva;
        if (u < 0.0) continue;
        // q = cross(s, e1) with s = (-v0x, sy, sz) (ray origin x = 0)
        const double sx = -v0[0];
        const double qx = sy * e1z - sz * e1y;
        const double qy = sz * e1x - sx * e1z;
        const double qz = sx * e1y - sy * e1x;
        const double vv = qx * inva;  // dot(d, q), d = +x
        if (vv < 0.0 || u + vv > 1.0) continue;
        const double tt = (e2x * qx + e2y * qy + e2z * qz) * inva;
        if (!(tt > 0.0)) continue;
        int64_t xb = (int64_t)std::floor(tt) + 1;
        if (xb < 0) xb = 0;
        if (xb > X) xb = X;
        int32_t *p = &cnt[(size_t)xb * plane + (size_t)y * Z + (size_t)z];
#pragma omp atomic
        ++*p;
      }
    }
  }

  // node x is inside iff the crossing count over buckets > x is odd
  std::vector<int32_t> acc(plane, 0);
  for (int64_t x = X; x >= 1; --x) {
    const int32_t *c = &cnt[(size_t)x * plane];
    uint8_t *o = inside + (size_t)(x - 1) * plane;
    for (size_t i = 0; i < plane; ++i) {
      acc[i] += c[i];
      o[i] = (uint8_t)(acc[i] & 1);
    }
  }
}

}  // extern "C"
