// Native DCD trajectory reader.
//
// Fast bulk decoder for CHARMM/NAMD-style DCD files, exposed to Python via
// ctypes (see waterorderlib_tpu/io/dcd.py). Replaces the role of the
// reference's compiled trajectory stack (pytraj/cpptraj) on the host side:
// one pass over the file decodes every frame's unit cell and coordinates
// straight into caller-provided f32 buffers.
//
// Build: g++ -O3 -shared -fPIC -o libdcd.so dcdlib.cc
//
// Protocol: dcd_read(path, &n_frames, &n_atoms, pos_buf, box_buf, capacity)
//   - pos_buf == NULL: query mode, fills n_frames/n_atoms only.
//   - otherwise decodes into pos_buf (n_frames*n_atoms*3 floats, frame-major)
//     and box_buf (n_frames*3 floats, a/b/c edges; -1 when absent).
// Returns 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  bool ok = true;

  explicit Reader(const char* path) { f = std::fopen(path, "rb"); }
  ~Reader() {
    if (f) std::fclose(f);
  }

  bool record(std::vector<char>& out) {
    int32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) return false;
    if (n < 0 || n > (1 << 30)) return false;
    out.resize(n);
    if (n && std::fread(out.data(), 1, n, f) != static_cast<size_t>(n)) return false;
    int32_t n2 = 0;
    if (std::fread(&n2, 4, 1, f) != 1 || n2 != n) return false;
    return true;
  }

  bool skip_record() {
    int32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) return false;
    if (std::fseek(f, n, SEEK_CUR) != 0) return false;
    int32_t n2 = 0;
    if (std::fread(&n2, 4, 1, f) != 1 || n2 != n) return false;
    return true;
  }
};

}  // namespace

extern "C" int dcd_read(const char* path, int* n_frames_out, int* n_atoms_out,
                        float* pos_buf, float* box_buf, long capacity) {
  Reader r(path);
  if (!r.f) return -1;
  std::vector<char> rec;
  if (!r.record(rec) || rec.size() < 84) return -2;
  if (std::memcmp(rec.data(), "CORD", 4) != 0) return -3;
  int32_t icntrl[20];
  std::memcpy(icntrl, rec.data() + 4, sizeof(icntrl));
  const bool has_cell = icntrl[10] != 0;
  if (!r.skip_record()) return -4;  // title
  if (!r.record(rec) || rec.size() < 4) return -5;
  int32_t n_atoms;
  std::memcpy(&n_atoms, rec.data(), 4);
  if (n_atoms <= 0) return -6;

  const bool query = pos_buf == nullptr;
  long frame = 0;
  std::vector<char> cell_rec, xr, yr, zr;
  while (true) {
    if (has_cell) {
      if (!r.record(cell_rec)) break;
      if (cell_rec.size() < 48) return -7;
    }
    if (!r.record(xr)) {
      if (has_cell) return -8;  // cell without coordinates: corrupt
      break;
    }
    if (!r.record(yr) || !r.record(zr)) return -9;
    if (xr.size() < static_cast<size_t>(n_atoms) * 4) return -10;
    if (!query) {
      if ((frame + 1) * static_cast<long>(n_atoms) * 3 > capacity) return -11;
      if (box_buf) {
        if (has_cell) {
          double cell[6];
          std::memcpy(cell, cell_rec.data(), sizeof(cell));
          box_buf[frame * 3 + 0] = static_cast<float>(cell[0]);
          box_buf[frame * 3 + 1] = static_cast<float>(cell[2]);
          box_buf[frame * 3 + 2] = static_cast<float>(cell[5]);
        } else {
          box_buf[frame * 3 + 0] = -1.0f;
          box_buf[frame * 3 + 1] = -1.0f;
          box_buf[frame * 3 + 2] = -1.0f;
        }
      }
      const float* xs = reinterpret_cast<const float*>(xr.data());
      const float* ys = reinterpret_cast<const float*>(yr.data());
      const float* zs = reinterpret_cast<const float*>(zr.data());
      float* dst = pos_buf + frame * static_cast<long>(n_atoms) * 3;
      for (int i = 0; i < n_atoms; ++i) {
        dst[i * 3 + 0] = xs[i];
        dst[i * 3 + 1] = ys[i];
        dst[i * 3 + 2] = zs[i];
      }
    }
    ++frame;
  }
  *n_frames_out = static_cast<int>(frame);
  *n_atoms_out = n_atoms;
  return 0;
}
