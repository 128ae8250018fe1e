// Native DCD trajectory reader for vaemolsim-tpu's data pipeline.
//
// The reference framework's real-data workflows read MD trajectories via
// mdtraj/openmm (optional conda env, SURVEY.md §2.2); this is the
// first-party native equivalent: a minimal, fast reader for the
// CHARMM/NAMD/OpenMM DCD binary format (Fortran unformatted records),
// exposed through a C ABI for ctypes (no pybind11 dependency).
//
// Format handled: 84-byte "CORD" header record (frame count, timestep,
// unit-cell flag), title record, natoms record, then per frame an
// optional 48-byte unit-cell record (6 doubles: A, gamma, B, beta,
// alpha, C in CHARMM order) and three float32 records (X, Y, Z).
// Both endiannesses are detected from the leading record length.
//
// Build: g++ -O3 -shared -fPIC -o libdcd.so dcd_reader.cc
// (vaemolsim_tpu/data/dcd.py compiles this on demand and falls back to
// a pure-NumPy reader if no compiler is available.)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct DCD {
  FILE* f = nullptr;
  int64_t n_atoms = 0;
  int64_t n_frames = 0;
  bool has_box = false;
  bool swap = false;
  int64_t first_frame_offset = 0;
  int64_t frame_bytes = 0;
};

uint32_t bswap32(uint32_t v) {
  return ((v & 0xff) << 24) | ((v & 0xff00) << 8) | ((v >> 8) & 0xff00) |
         (v >> 24);
}

uint64_t bswap64(uint64_t v) {
  uint64_t r = 0;
  for (int i = 0; i < 8; ++i) {
    r = (r << 8) | (v & 0xff);
    v >>= 8;
  }
  return r;
}

bool read_u32(DCD* d, uint32_t* out) {
  if (fread(out, 4, 1, d->f) != 1) return false;
  if (d->swap) *out = bswap32(*out);
  return true;
}

// Read a Fortran record's payload into buf (checking both length markers).
bool read_record(DCD* d, void* buf, uint32_t expect_len) {
  uint32_t len0, len1;
  if (!read_u32(d, &len0) || len0 != expect_len) return false;
  if (buf) {
    if (fread(buf, 1, len0, d->f) != len0) return false;
  } else {
    if (fseek(d->f, len0, SEEK_CUR) != 0) return false;
  }
  if (!read_u32(d, &len1) || len1 != len0) return false;
  return true;
}

bool skip_record(DCD* d) {
  uint32_t len0, len1;
  if (!read_u32(d, &len0)) return false;
  if (fseek(d->f, len0, SEEK_CUR) != 0) return false;
  if (!read_u32(d, &len1) || len1 != len0) return false;
  return true;
}

}  // namespace

extern "C" {

// Returns an opaque handle (heap pointer) or nullptr on failure.
void* dcd_open(const char* path, int64_t* n_atoms, int64_t* n_frames,
               int32_t* has_box) {
  DCD* d = new DCD();
  d->f = fopen(path, "rb");
  if (!d->f) {
    delete d;
    return nullptr;
  }
  uint32_t len;
  if (fread(&len, 4, 1, d->f) != 1) goto fail;
  if (len != 84) {
    if (bswap32(len) != 84) goto fail;
    d->swap = true;
    len = 84;
  }
  {
    char hdr[84];
    if (fread(hdr, 1, 84, d->f) != 84) goto fail;
    if (memcmp(hdr, "CORD", 4) != 0) goto fail;
    uint32_t tail;
    if (!read_u32(d, &tail) || tail != 84) goto fail;
    uint32_t nframes, flags;
    memcpy(&nframes, hdr + 4, 4);
    memcpy(&flags, hdr + 44, 4);  // icntrl[11]: unit-cell flag
    if (d->swap) {
      nframes = bswap32(nframes);
      flags = bswap32(flags);
    }
    d->n_frames = nframes;
    d->has_box = flags != 0;
  }
  // Title record: leading int32 count then 80-char lines.
  if (!skip_record(d)) goto fail;
  {
    uint32_t natoms;
    if (!read_record(d, &natoms, 4)) goto fail;
    if (d->swap) natoms = bswap32(natoms);
    d->n_atoms = natoms;
  }
  d->first_frame_offset = ftell(d->f);
  d->frame_bytes = (d->has_box ? 48 + 8 : 0) + 3 * (8 + 4 * d->n_atoms);
  *n_atoms = d->n_atoms;
  *n_frames = d->n_frames;
  *has_box = d->has_box ? 1 : 0;
  return d;
fail:
  fclose(d->f);
  delete d;
  return nullptr;
}

// Reads `count` frames starting at `start` into coords (count*n_atoms*3
// float32, xyz interleaved per atom) and box (count*6 float64, CHARMM
// order; untouched when the file has no unit cell).  Returns frames read.
int64_t dcd_read_frames(void* handle, int64_t start, int64_t count,
                        float* coords, double* box) {
  DCD* d = static_cast<DCD*>(handle);
  if (!d || start < 0) return 0;
  if (fseek(d->f, d->first_frame_offset + start * d->frame_bytes,
            SEEK_SET) != 0)
    return 0;
  const int64_t n = d->n_atoms;
  std::vector<float> xs(n), ys(n), zs(n);
  int64_t done = 0;
  for (; done < count; ++done) {
    if (d->has_box) {
      double cell[6];
      if (!read_record(d, cell, 48)) break;
      if (box) {
        for (int i = 0; i < 6; ++i) {
          double v = cell[i];
          if (d->swap) {
            uint64_t u;
            memcpy(&u, &v, 8);
            u = bswap64(u);
            memcpy(&v, &u, 8);
          }
          box[done * 6 + i] = v;
        }
      }
    }
    if (!read_record(d, xs.data(), 4 * n)) break;
    if (!read_record(d, ys.data(), 4 * n)) break;
    if (!read_record(d, zs.data(), 4 * n)) break;
    float* out = coords + done * n * 3;
    for (int64_t a = 0; a < n; ++a) {
      float x = xs[a], y = ys[a], z = zs[a];
      if (d->swap) {
        uint32_t u;
        memcpy(&u, &x, 4); u = bswap32(u); memcpy(&x, &u, 4);
        memcpy(&u, &y, 4); u = bswap32(u); memcpy(&y, &u, 4);
        memcpy(&u, &z, 4); u = bswap32(u); memcpy(&z, &u, 4);
      }
      out[a * 3 + 0] = x;
      out[a * 3 + 1] = y;
      out[a * 3 + 2] = z;
    }
  }
  return done;
}

void dcd_close(void* handle) {
  DCD* d = static_cast<DCD*>(handle);
  if (d) {
    if (d->f) fclose(d->f);
    delete d;
  }
}

}  // extern "C"
