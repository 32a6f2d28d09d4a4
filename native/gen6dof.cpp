// gen6dof — standalone generator of OpenFOAM 6-DoF motion tables.
//
// Native-component parity with the reference's wmake utility
// (/root/reference/sloshingTank3D6DoF/gen6DoF/gen6DoF.C:42-92), emitting
// the identical `List<Tuple3<scalar, vector, vector>>` text format that
// the solver's TableMotion reader (and OpenFOAM's sixDoFMotion) consume:
//
//     N
//     (
//     (t (x y z) (rx ry rz))
//     ...
//     )
//
// Two modes:
//   gen6dof sine [out] [endTime] [n]     — the reference's sinusoidal table
//                                          (default params match gen6DoF.C)
//   gen6dof orbital out R freq duration dt ramp
//                                        — circular orbit with smootherstep
//                                          soft start (generate_motion.py
//                                          parity; ramp<0 -> 10% duration)
//
// Built with plain g++ (no OpenFOAM/wmake dependency): native/Makefile.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

struct Row {
  double t;
  Vec3 trans;
  Vec3 rot;
};

void writeTable(const std::string& path, const std::vector<Row>& rows) {
  std::FILE* f = std::fopen(path.c_str(), "w");
  if (!f) {
    std::perror("gen6dof: cannot open output");
    std::exit(1);
  }
  std::fprintf(f, "%zu\n(\n", rows.size());
  for (const Row& r : rows) {
    std::fprintf(f, "(%.6g (%.6g %.6g %.6g) (%.6g %.6g %.6g))\n", r.t,
                 r.trans.x, r.trans.y, r.trans.z, r.rot.x, r.rot.y, r.rot.z);
  }
  std::fprintf(f, ")\n");
  std::fclose(f);
}

double smootherstep(double tau) {
  if (tau <= 0.0) return 0.0;
  if (tau >= 1.0) return 1.0;
  return tau * tau * tau * (tau * (tau * 6.0 - 15.0) + 10.0);
}

// Sinusoidal 6-DoF table with the reference utility's constants
// (gen6DoF.C:44-60): 40 s, 100 samples, trans amp (2,3,2) m at
// (0.5,0.8,0.4) rad/s, rot amp (30,10,10) deg at (0.4,0.7,0.5) rad/s.
int runSine(int argc, char** argv) {
  std::string out = argc > 2 ? argv[2] : "6DoF.dat";
  double endTime = argc > 3 ? std::atof(argv[3]) : 40.0;
  int nTimes = argc > 4 ? std::atoi(argv[4]) : 100;
  const Vec3 transAmp{2, 3, 2};
  const Vec3 transOmega{0.5, 0.8, 0.4};
  const Vec3 rotAmp{30, 10, 10};
  const Vec3 rotOmega{0.4, 0.7, 0.5};

  std::vector<Row> rows(nTimes);
  for (int i = 0; i < nTimes; ++i) {
    double t = (endTime * i) / (nTimes - 1);
    rows[i].t = t;
    rows[i].trans = {transAmp.x * std::sin(transOmega.x * t),
                     transAmp.y * std::sin(transOmega.y * t),
                     transAmp.z * std::sin(transOmega.z * t)};
    rows[i].rot = {rotAmp.x * std::sin(rotOmega.x * t),
                   rotAmp.y * std::sin(rotOmega.y * t),
                   rotAmp.z * std::sin(rotOmega.z * t)};
  }
  writeTable(out, rows);
  std::printf("End\n\n");
  return 0;
}

// Orbital table (generate_motion.py:9-40 parity): radius soft-started by
// smootherstep over the ramp window, zero rotation.
int runOrbital(int argc, char** argv) {
  if (argc < 8) {
    std::fprintf(stderr,
                 "usage: gen6dof orbital <out> <R> <freq> <duration> <dt> "
                 "<ramp>\n");
    return 1;
  }
  std::string out = argv[2];
  double rMax = std::atof(argv[3]);
  double freq = std::atof(argv[4]);
  double duration = std::atof(argv[5]);
  double dt = std::atof(argv[6]);
  double ramp = std::atof(argv[7]);
  if (ramp < 0) ramp = 0.1 * duration;

  int n = static_cast<int>(duration / dt) + 1;
  std::vector<Row> rows(n);
  for (int i = 0; i < n; ++i) {
    double t = i * dt;
    double r = ramp > 0 && t < ramp ? rMax * smootherstep(t / ramp) : rMax;
    double th = 2.0 * M_PI * freq * t;
    rows[i].t = t;
    rows[i].trans = {r * std::cos(th), r * std::sin(th), 0.0};
    rows[i].rot = {0.0, 0.0, 0.0};
  }
  writeTable(out, rows);
  std::printf("Motion file written to %s with ramp duration %gs\n",
              out.c_str(), ramp);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2 || std::strcmp(argv[1], "sine") == 0) {
    return runSine(argc, argv);
  }
  if (std::strcmp(argv[1], "orbital") == 0) {
    return runOrbital(argc, argv);
  }
  std::fprintf(stderr, "gen6dof: unknown mode '%s' (use sine|orbital)\n",
               argv[1]);
  return 1;
}
