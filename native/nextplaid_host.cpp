// Native host runtime for nextplaid_tpu.
//
// TPU-native counterpart to the reference's Rust host layer
// (/root/reference/next-plaid/src/mmap.rs chunk merging, codec.rs host
// bit-packing): the compute path is JAX/XLA, but the IO-bound work around it
// — merging chunked NPY files into device-upload-ready buffers, residual
// bucket packing/unpacking, bucketize — runs as plain C++ called via ctypes.
//
// Build: make -C native   (produces libnextplaid_host.so)
//
// All functions return 0 on success, negative error codes otherwise. Memory
// is caller-allocated (numpy arrays passed by pointer); nothing here
// allocates across the FFI boundary.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// NPY plumbing
// ---------------------------------------------------------------------------

// Parse the header of an NPY v1/v2 file already mapped at `data`.
// Returns header size (data offset) or -1. Fills dtype string (max 15 chars)
// and up to 2 shape dims (shape[1] = 0 for 1-D).
static long npy_parse_header(const uint8_t* data, size_t size, char* dtype,
                             int64_t* shape) {
  if (size < 10 || memcmp(data, "\x93NUMPY", 6) != 0) return -1;
  int major = data[6];
  size_t header_len, offset;
  if (major == 1) {
    header_len = data[8] | (data[9] << 8);
    offset = 10;
  } else {
    header_len = data[8] | (data[9] << 8) | (data[10] << 16) |
                 ((size_t)data[11] << 24);
    offset = 12;
  }
  if (offset + header_len > size) return -1;
  std::string h((const char*)data + offset, header_len);
  // descr
  size_t dp = h.find("'descr'");
  if (dp == std::string::npos) return -1;
  size_t q1 = h.find('\'', dp + 7);
  q1 = h.find('\'', q1 + 1);  // skip to value opening quote... simpler:
  // find ": '" after 'descr'
  size_t colon = h.find(':', dp);
  size_t v1 = h.find('\'', colon);
  size_t v2 = h.find('\'', v1 + 1);
  if (v1 == std::string::npos || v2 == std::string::npos) return -1;
  std::string d = h.substr(v1 + 1, v2 - v1 - 1);
  if (d.size() > 15) return -1;
  strcpy(dtype, d.c_str());
  // fortran_order must be False
  if (h.find("'fortran_order': True") != std::string::npos) return -2;
  // shape
  size_t sp = h.find("'shape'");
  if (sp == std::string::npos) return -1;
  size_t p1 = h.find('(', sp);
  size_t p2 = h.find(')', p1);
  if (p1 == std::string::npos || p2 == std::string::npos) return -1;
  std::string s = h.substr(p1 + 1, p2 - p1 - 1);
  shape[0] = 0;
  shape[1] = 0;
  int dim = 0;
  const char* c = s.c_str();
  while (*c && dim < 2) {
    while (*c == ' ' || *c == ',') c++;
    if (*c == 0) break;
    shape[dim++] = strtoll(c, (char**)&c, 10);
  }
  return (long)(offset + header_len);
}

struct MappedNpy {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  const uint8_t* data = nullptr;
  size_t data_bytes = 0;
  char dtype[16] = {0};
  int64_t shape[2] = {0, 0};

  ~MappedNpy() {
    if (base) munmap(base, size);
    if (fd >= 0) close(fd);
  }
  int open_file(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) return -1;
    size = (size_t)st.st_size;
    base = (uint8_t*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (base == MAP_FAILED) {
      base = nullptr;
      return -1;
    }
    long off = npy_parse_header(base, size, dtype, shape);
    if (off < 0) return (int)off;
    data = base + off;
    data_bytes = size - (size_t)off;
    return 0;
  }
};

// Inspect an NPY file: writes dtype (caller buffer >= 16 bytes) and shape[2].
int np_npy_inspect(const char* path, char* dtype_out, int64_t* shape_out) {
  MappedNpy m;
  int rc = m.open_file(path);
  if (rc != 0) return rc;
  strcpy(dtype_out, m.dtype);
  shape_out[0] = m.shape[0];
  shape_out[1] = m.shape[1];
  return 0;
}

// Merge the data payloads of `n` NPY chunk files (same dtype, same trailing
// dims) directly into a caller buffer of `out_bytes`. Returns total rows
// merged, or a negative error. This replaces the reference's merged-file
// cache build (mmap.rs:1266-1704) on the load path: one mmap + memcpy pass,
// no Python-level array concatenation.
int64_t np_merge_chunks_into(const char** paths, int n, uint8_t* out,
                             int64_t out_bytes) {
  int64_t written = 0;
  int64_t rows = 0;
  for (int i = 0; i < n; i++) {
    MappedNpy m;
    int rc = m.open_file(paths[i]);
    if (rc != 0) return -100 + rc;
    if (written + (int64_t)m.data_bytes > out_bytes) return -2;
    memcpy(out + written, m.data, m.data_bytes);
    written += (int64_t)m.data_bytes;
    rows += m.shape[0];
  }
  return rows;
}

// Total payload bytes + rows across chunk files (for pre-allocating).
int64_t np_chunks_total_bytes(const char** paths, int n, int64_t* rows_out) {
  int64_t total = 0, rows = 0;
  for (int i = 0; i < n; i++) {
    MappedNpy m;
    int rc = m.open_file(paths[i]);
    if (rc != 0) return -100 + rc;
    total += (int64_t)m.data_bytes;
    rows += m.shape[0];
  }
  if (rows_out) *rows_out = rows;
  return total;
}

// ---------------------------------------------------------------------------
// Residual codec (host side) — bit layout matches ops/codec.py pack_buckets:
// value k of a byte occupies bits [8-nbits*(k+1), 8-nbits*k), bits reversed.
// ---------------------------------------------------------------------------

static inline uint8_t reverse_bits_n(uint8_t v, int nbits) {
  uint8_t out = 0;
  for (int b = 0; b < nbits; b++)
    if (v & (1 << b)) out |= 1 << (nbits - 1 - b);
  return out;
}

// buckets: [n, dim] int32 in [0, 2^nbits); out: [n, dim*nbits/8] u8.
int np_pack_residuals(const int32_t* buckets, int64_t n, int64_t dim,
                      int nbits, uint8_t* out) {
  if (nbits != 2 && nbits != 4) return -1;
  const int vpb = 8 / nbits;
  if (dim % vpb != 0) return -2;
  const int64_t packed_dim = dim / vpb;
  uint8_t rev[16];
  for (int v = 0; v < (1 << nbits); v++) rev[v] = reverse_bits_n((uint8_t)v, nbits);
  for (int64_t i = 0; i < n; i++) {
    const int32_t* row = buckets + i * dim;
    uint8_t* orow = out + i * packed_dim;
    for (int64_t j = 0; j < packed_dim; j++) {
      uint8_t byte = 0;
      for (int k = 0; k < vpb; k++) {
        uint8_t rv = rev[row[j * vpb + k] & ((1 << nbits) - 1)];
        byte |= (uint8_t)(rv << (8 - nbits * (k + 1)));
      }
      orow[j] = byte;
    }
  }
  return 0;
}

// packed: [n, dim*nbits/8] u8; out: [n, dim] int32.
int np_unpack_residuals(const uint8_t* packed, int64_t n, int64_t dim,
                        int nbits, int32_t* out) {
  if (nbits != 2 && nbits != 4) return -1;
  const int vpb = 8 / nbits;
  if (dim % vpb != 0) return -2;
  const int64_t packed_dim = dim / vpb;
  const uint8_t mask = (uint8_t)((1 << nbits) - 1);
  int32_t rev[16];
  for (int v = 0; v < (1 << nbits); v++) rev[v] = reverse_bits_n((uint8_t)v, nbits);
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* row = packed + i * packed_dim;
    int32_t* orow = out + i * dim;
    for (int64_t j = 0; j < packed_dim; j++) {
      uint8_t byte = row[j];
      for (int k = 0; k < vpb; k++) {
        orow[j * vpb + k] = rev[(byte >> (8 - nbits * (k + 1))) & mask];
      }
    }
  }
  return 0;
}

// residuals: [n] f32; cutoffs: [n_cutoffs] f32 sorted; out: [n] i32 bucket =
// count of cutoffs < value (searchsorted left; codec.rs:386).
int np_bucketize(const float* residuals, int64_t n, const float* cutoffs,
                 int n_cutoffs, int32_t* out) {
  for (int64_t i = 0; i < n; i++) {
    const float v = residuals[i];
    int lo = 0, hi = n_cutoffs;
    while (lo < hi) {
      int mid = (lo + hi) >> 1;
      if (cutoffs[mid] < v)
        lo = mid + 1;
      else
        hi = mid;
    }
    out[i] = lo;
  }
  return 0;
}

// f16 -> f32 widening for fast-plaid centroid conversion (mmap.rs:1757-1811).
int np_f16_to_f32(const uint16_t* in, int64_t n, float* out) {
  for (int64_t i = 0; i < n; i++) {
    uint16_t h = in[i];
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1f;
    uint32_t man = h & 0x3ff;
    uint32_t f;
    if (exp == 0) {
      if (man == 0) {
        f = sign;
      } else {  // subnormal
        exp = 127 - 15 + 1;
        while ((man & 0x400) == 0) {
          man <<= 1;
          exp--;
        }
        man &= 0x3ff;
        f = sign | (exp << 23) | (man << 13);
      }
    } else if (exp == 0x1f) {
      f = sign | 0x7f800000 | (man << 13);
    } else {
      f = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    memcpy(out + i, &f, 4);
  }
  return 0;
}

}  // extern "C"
