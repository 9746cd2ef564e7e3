// packcells — ellipsoid packing initial-condition generator.
//
// Native C++ replacement for the reference tools/packCells
// (reference: tools/packCells/packCells.cpp:36-62 CLI, packing.h): packs
// oriented ellipsoids representing blood cells into a periodic box and
// writes one "<Cell>.pos" file per cell type in the format the framework's
// .pos loader expects (count line, then "x y z rotX rotY rotZ" in
// micrometres / degrees — io/readPositionsBloodCells.cpp:120-186).
//
// Algorithm: force-biased packing.  Cells start at random positions and
// orientations; each sweep resolves pairwise overlaps of the bounding
// ellipsoids (overlap measured in the metric of the ellipsoid pair by the
// scaled-sphere approximation) by pushing centres apart, with slow radius
// growth from a shrunken start ("inflation") until target size is reached
// or maxiter sweeps elapse.  Periodic boundaries via minimum image.
//
// Build: g++ -O2 -std=c++17 -o packcells packcells.cpp
// Usage examples:
//   packcells 50 25 25 --hematocrit 0.3
//   packcells 40 20 20 --rbc 50 --plt 4 --seed 7
//
// Same ellipsoid dimensions as the reference (packCells.cpp:89-93):
//   RBC 8.4 x 4.4 x 8.4 um, PLT 2.4 x 1.05 x 2.4, WBC 8.4^3 sphere.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

struct CellSpec {
  std::string name;
  int count = 0;
  double a, b, c;  // full diameters in um
};

struct Cell {
  Vec3 pos;
  Vec3 rot;  // euler angles (radians)
  int type;
};

double volume_ellipsoid(const CellSpec &s) {
  return 4.0 / 3.0 * M_PI * (s.a / 2) * (s.b / 2) * (s.c / 2);
}

// rotation matrix R = Rz(g) Ry(b) Rx(a)
void rot_matrix(const Vec3 &e, double R[3][3]) {
  double ca = cos(e.x), sa = sin(e.x);
  double cb = cos(e.y), sb = sin(e.y);
  double cg = cos(e.z), sg = sin(e.z);
  R[0][0] = cb * cg;
  R[0][1] = sa * sb * cg - ca * sg;
  R[0][2] = ca * sb * cg + sa * sg;
  R[1][0] = cb * sg;
  R[1][1] = sa * sb * sg + ca * cg;
  R[1][2] = ca * sb * sg - sa * cg;
  R[2][0] = -sb;
  R[2][1] = sa * cb;
  R[2][2] = ca * cb;
}

// Effective radius of an oriented ellipsoid along direction d (unit):
// r(d) = 1 / sqrt(d^T A d) with A = R diag(1/r_i^2) R^T.
double radius_along(const CellSpec &s, const double R[3][3], const Vec3 &d) {
  // transform d into body frame: db = R^T d
  double dbx = R[0][0] * d.x + R[1][0] * d.y + R[2][0] * d.z;
  double dby = R[0][1] * d.x + R[1][1] * d.y + R[2][1] * d.z;
  double dbz = R[0][2] * d.x + R[1][2] * d.y + R[2][2] * d.z;
  double rx = s.a / 2, ry = s.b / 2, rz = s.c / 2;
  double q = (dbx * dbx) / (rx * rx) + (dby * dby) / (ry * ry) +
             (dbz * dbz) / (rz * rz);
  return 1.0 / std::sqrt(std::max(q, 1e-30));
}

struct Packer {
  double sx, sy, sz;
  std::vector<CellSpec> specs;
  std::vector<Cell> cells;
  std::vector<double> rmax;  // per type: max semi-axis
  std::mt19937_64 rng;
  bool do_rotate = true;

  void init(uint64_t seed) {
    rng.seed(seed);
    std::uniform_real_distribution<double> ux(0, sx), uy(0, sy), uz(0, sz),
        ur(0, 2 * M_PI);
    for (size_t t = 0; t < specs.size(); t++) {
      rmax.push_back(
          std::max(specs[t].a, std::max(specs[t].b, specs[t].c)) / 2.0);
      for (int i = 0; i < specs[t].count; i++) {
        Cell c;
        c.pos = {ux(rng), uy(rng), uz(rng)};
        c.rot = do_rotate ? Vec3{ur(rng), ur(rng), ur(rng)} : Vec3{};
        c.type = (int)t;
        cells.push_back(c);
      }
    }
  }

  Vec3 min_image(Vec3 d) const {
    d.x -= sx * std::round(d.x / sx);
    d.y -= sy * std::round(d.y / sy);
    d.z -= sz * std::round(d.z / sz);
    return d;
  }

  // One relaxation sweep at the given global scale in [0,1].
  // Returns the number of overlapping pairs.
  int sweep(double scale) {
    // spatial hash grid with cell size = largest diameter * scale
    double maxd = 0;
    for (size_t t = 0; t < specs.size(); t++) maxd = std::max(maxd, 2 * rmax[t]);
    double h = std::max(maxd * scale, 1.0);
    int nx = std::max(1, (int)(sx / h));
    int ny = std::max(1, (int)(sy / h));
    int nz = std::max(1, (int)(sz / h));
    std::vector<std::vector<int>> grid(nx * ny * nz);
    auto bin_of = [&](const Vec3 &p) {
      int ix = ((int)(p.x / sx * nx) % nx + nx) % nx;
      int iy = ((int)(p.y / sy * ny) % ny + ny) % ny;
      int iz = ((int)(p.z / sz * nz) % nz + nz) % nz;
      return (ix * ny + iy) * nz + iz;
    };
    for (size_t i = 0; i < cells.size(); i++)
      grid[bin_of(cells[i].pos)].push_back((int)i);

    std::vector<double> Rm(cells.size() * 9);
    for (size_t i = 0; i < cells.size(); i++) {
      double R[3][3];
      rot_matrix(cells[i].rot, R);
      memcpy(&Rm[i * 9], R, sizeof(R));
    }

    int overlaps = 0;
    std::vector<Vec3> push(cells.size());
    for (int ix = 0; ix < nx; ix++)
      for (int iy = 0; iy < ny; iy++)
        for (int iz = 0; iz < nz; iz++) {
          auto &me = grid[(ix * ny + iy) * nz + iz];
          for (int dx = -1; dx <= 1; dx++)
            for (int dy = -1; dy <= 1; dy++)
              for (int dz = -1; dz <= 1; dz++) {
                int jx = (ix + dx + nx) % nx, jy = (iy + dy + ny) % ny,
                    jz = (iz + dz + nz) % nz;
                auto &nb = grid[(jx * ny + jy) * nz + jz];
                for (int i : me)
                  for (int j : nb) {
                    if (j <= i) continue;
                    Vec3 d = min_image({cells[j].pos.x - cells[i].pos.x,
                                        cells[j].pos.y - cells[i].pos.y,
                                        cells[j].pos.z - cells[i].pos.z});
                    double dist =
                        std::sqrt(d.x * d.x + d.y * d.y + d.z * d.z) + 1e-12;
                    const CellSpec &si = specs[cells[i].type];
                    const CellSpec &sj = specs[cells[j].type];
                    if (dist > (rmax[cells[i].type] + rmax[cells[j].type]) *
                                   scale)
                      continue;
                    Vec3 u{d.x / dist, d.y / dist, d.z / dist};
                    double Ri[3][3], Rj[3][3];
                    memcpy(Ri, &Rm[i * 9], sizeof(Ri));
                    memcpy(Rj, &Rm[j * 9], sizeof(Rj));
                    double ri = radius_along(si, Ri, u) * scale;
                    double rj = radius_along(sj, Rj, u) * scale;
                    double gap = dist - (ri + rj);
                    if (gap < 0) {
                      overlaps++;
                      double mv = -gap * 0.55;  // push slightly over half
                      push[i].x -= u.x * mv * 0.5;
                      push[i].y -= u.y * mv * 0.5;
                      push[i].z -= u.z * mv * 0.5;
                      push[j].x += u.x * mv * 0.5;
                      push[j].y += u.y * mv * 0.5;
                      push[j].z += u.z * mv * 0.5;
                    }
                  }
              }
        }
    std::uniform_real_distribution<double> jitter(-0.02, 0.02);
    for (size_t i = 0; i < cells.size(); i++) {
      cells[i].pos.x += push[i].x + (push[i].x != 0 ? jitter(rng) : 0);
      cells[i].pos.y += push[i].y + (push[i].y != 0 ? jitter(rng) : 0);
      cells[i].pos.z += push[i].z + (push[i].z != 0 ? jitter(rng) : 0);
      // wrap into box
      cells[i].pos.x -= sx * std::floor(cells[i].pos.x / sx);
      cells[i].pos.y -= sy * std::floor(cells[i].pos.y / sy);
      cells[i].pos.z -= sz * std::floor(cells[i].pos.z / sz);
    }
    return overlaps;
  }

  void pack(int maxiter) {
    // inflation schedule: start at 60% size, grow to 100%
    int grow_steps = maxiter / 2;
    for (int it = 0; it < maxiter; it++) {
      double scale =
          it < grow_steps ? 0.6 + 0.4 * (double)it / grow_steps : 1.0;
      int ov = sweep(scale);
      if (it % 50 == 0)
        fprintf(stderr, "(packcells) sweep %d scale %.2f overlaps %d\n", it,
                scale, ov);
      if (scale >= 1.0 && ov == 0) {
        fprintf(stderr, "(packcells) converged after %d sweeps\n", it);
        return;
      }
    }
    fprintf(stderr, "(packcells) maxiter reached (residual overlaps ok for "
                    "soft cells)\n");
  }

  void write() const {
    for (size_t t = 0; t < specs.size(); t++) {
      std::string fname = specs[t].name + ".pos";
      FILE *f = fopen(fname.c_str(), "w");
      if (!f) {
        perror("fopen");
        exit(1);
      }
      fprintf(f, "%d\n", specs[t].count);
      for (const Cell &c : cells) {
        if (c.type != (int)t) continue;
        fprintf(f, "%.6f %.6f %.6f %.4f %.4f %.4f\n", c.pos.x, c.pos.y,
                c.pos.z, c.rot.x * 180.0 / M_PI, c.rot.y * 180.0 / M_PI,
                c.rot.z * 180.0 / M_PI);
      }
      fclose(f);
      fprintf(stderr, "(packcells) wrote %s (%d cells)\n", fname.c_str(),
              specs[t].count);
    }
  }
};

void usage() {
  fprintf(stderr,
          "Usage: packcells <sX> <sY> <sZ> [options]   (sizes in um)\n"
          "  --hematocrit <0-1>      RBC volume fraction (adds PLT at ratio)\n"
          "  --plt_ratio <r>         PLT per RBC with --hematocrit [0.07]\n"
          "  --rbc <n> | --plt <n> | --wbc <n>\n"
          "  --cell <name> <n> <a> <b> <c>   custom ellipsoid (diameters um)\n"
          "  --noRotate | --maxiter <n> | --seed <n>\n"
          "Writes <name>.pos files (um, degrees), loader-compatible with\n"
          "the reference io/readPositionsBloodCells format.\n");
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 4) {
    usage();
    return 1;
  }
  Packer p;
  p.sx = atof(argv[1]);
  p.sy = atof(argv[2]);
  p.sz = atof(argv[3]);
  double hematocrit = 0.0, plt_ratio = 0.07;
  int n_rbc = 0, n_plt = 0, n_wbc = 0, maxiter = 2000;
  uint64_t seed = 42;
  std::vector<CellSpec> custom;
  for (int i = 4; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--hematocrit") hematocrit = atof(argv[++i]);
    else if (a == "--plt_ratio") plt_ratio = atof(argv[++i]);
    else if (a == "--rbc") n_rbc = atoi(argv[++i]);
    else if (a == "--plt") n_plt = atoi(argv[++i]);
    else if (a == "--wbc") n_wbc = atoi(argv[++i]);
    else if (a == "--noRotate") p.do_rotate = false;
    else if (a == "--maxiter") maxiter = atoi(argv[++i]);
    else if (a == "--seed") seed = strtoull(argv[++i], nullptr, 10);
    else if (a == "--cell") {
      CellSpec s;
      s.name = argv[++i];
      s.count = atoi(argv[++i]);
      s.a = atof(argv[++i]);
      s.b = atof(argv[++i]);
      s.c = atof(argv[++i]);
      custom.push_back(s);
    } else {
      usage();
      return 1;
    }
  }

  // reference cell dimensions (packCells.cpp:89-91)
  CellSpec rbc{"RBC", 0, 8.4, 4.4, 8.4};
  CellSpec plt{"PLT", 0, 2.4, 1.05, 2.4};
  CellSpec wbc{"WBC", 0, 8.4, 8.4, 8.4};

  if (hematocrit > 0) {
    double v_box = p.sx * p.sy * p.sz;
    double v_rbc = 90.0;  // um^3, physical RBC volume (not ellipsoid hull)
    n_rbc = (int)(hematocrit * v_box / v_rbc);
    n_plt = (int)(n_rbc * plt_ratio + 0.5);
  }
  rbc.count = n_rbc;
  plt.count = n_plt;
  wbc.count = n_wbc;
  if (rbc.count) p.specs.push_back(rbc);
  if (plt.count) p.specs.push_back(plt);
  if (wbc.count) p.specs.push_back(wbc);
  for (auto &s : custom) p.specs.push_back(s);
  if (p.specs.empty()) {
    usage();
    return 1;
  }

  double vol = 0;
  for (auto &s : p.specs) vol += s.count * volume_ellipsoid(s);
  fprintf(stderr, "(packcells) box %.1fx%.1fx%.1f um, hull volume fraction "
                  "%.1f%%\n",
          p.sx, p.sy, p.sz, 100.0 * vol / (p.sx * p.sy * p.sz));

  p.init(seed);
  p.pack(maxiter);
  p.write();
  return 0;
}
