// Native host-I/O core: threaded NIfTI-1 (.nii/.nii.gz) decoding.
//
// The reference's input pipeline bottleneck is per-item gunzip+parse of NIfTI
// volumes on Python threads (SURVEY.md §7 "input pipeline throughput").  This
// library moves the hot path — zlib inflate, header parse, dtype conversion
// to float32 — into C++ with a std::thread pool, fully outside the GIL.
// Python binds via ctypes (no pybind11 in this environment).
//
// Exposed C ABI:
//   evsr_decode_nifti(bytes, size, out, capacity, dims)  -> voxel count or <0
//   evsr_decode_nifti_file(path, out, capacity, dims)    -> voxel count or <0
//   evsr_nifti_dims(path, dims)                          -> ndim or <0
//   evsr_decode_batch(paths, n, outs, capacities, dims_out, threads) -> 0/<0
//
// Voxels are written in on-disk (Fortran) order as float32, after applying
// scl_slope/scl_inter when set — matching utils/nifti.py exactly.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

namespace {

constexpr int kHdrSize = 348;

struct Header {
  int ndim;
  int64_t shape[7];
  int16_t datatype;
  int64_t vox_offset;
  float scl_slope;
  float scl_inter;
  bool big_endian;
};

template <typename T>
T load_le(const uint8_t* p, bool swap) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  if (swap) {
    uint8_t* b = reinterpret_cast<uint8_t*>(&v);
    for (size_t i = 0; i < sizeof(T) / 2; ++i) std::swap(b[i], b[sizeof(T) - 1 - i]);
  }
  return v;
}

int parse_header(const uint8_t* raw, int64_t size, Header* h) {
  if (size < kHdrSize) return -1;
  int32_t sizeof_hdr = load_le<int32_t>(raw, false);
  bool swap = false;
  if (sizeof_hdr != kHdrSize) {
    swap = true;
    sizeof_hdr = load_le<int32_t>(raw, true);
    if (sizeof_hdr != kHdrSize) return -2;
  }
  h->big_endian = swap;
  int16_t ndim = load_le<int16_t>(raw + 40, swap);
  if (ndim < 1 || ndim > 7) return -3;
  h->ndim = ndim;
  for (int i = 0; i < 7; ++i)
    h->shape[i] = (i < ndim) ? load_le<int16_t>(raw + 40 + 2 * (i + 1), swap) : 1;
  h->datatype = load_le<int16_t>(raw + 70, swap);
  float vox_offset = load_le<float>(raw + 108, swap);
  h->vox_offset = vox_offset > 0 ? static_cast<int64_t>(vox_offset) : kHdrSize + 4;
  h->scl_slope = load_le<float>(raw + 112, swap);
  h->scl_inter = load_le<float>(raw + 116, swap);
  return 0;
}

bool is_gzip(const uint8_t* data, int64_t size) {
  return size >= 2 && data[0] == 0x1f && data[1] == 0x8b;
}

// inflate the whole gzip stream into a growable buffer
int gunzip(const uint8_t* data, int64_t size, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return -1;  // gzip+zlib autodetect
  zs.next_in = const_cast<Bytef*>(data);
  zs.avail_in = static_cast<uInt>(size);
  out->resize(std::max<int64_t>(size * 4, 1 << 20));
  int ret = Z_OK;
  size_t written = 0;
  while (ret != Z_STREAM_END) {
    if (written == out->size()) out->resize(out->size() * 2);
    zs.next_out = out->data() + written;
    zs.avail_out = static_cast<uInt>(out->size() - written);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return -2;
    }
    written = zs.total_out;
  }
  out->resize(written);
  inflateEnd(&zs);
  return 0;
}

template <typename T>
void convert(const uint8_t* src, float* dst, int64_t n, bool swap, float slope, float inter) {
  bool scaled = (slope != 0.0f && slope != 1.0f) || inter != 0.0f;
  float s = slope == 0.0f ? 1.0f : slope;
  for (int64_t i = 0; i < n; ++i) {
    T v = load_le<T>(src + i * sizeof(T), swap);
    float f = static_cast<float>(v);
    dst[i] = scaled ? f * s + inter : f;
  }
}

int decode(const uint8_t* data, int64_t size, float* out, int64_t capacity, int64_t dims[8]) {
  std::vector<uint8_t> inflated;
  const uint8_t* raw = data;
  int64_t raw_size = size;
  if (is_gzip(data, size)) {
    if (gunzip(data, size, &inflated) != 0) return -10;
    raw = inflated.data();
    raw_size = static_cast<int64_t>(inflated.size());
  }
  Header h;
  int rc = parse_header(raw, raw_size, &h);
  if (rc != 0) return rc;
  int64_t count = 1;
  for (int i = 0; i < h.ndim; ++i) count *= h.shape[i];
  if (count > capacity) return -4;
  dims[0] = h.ndim;
  for (int i = 0; i < 7; ++i) dims[i + 1] = h.shape[i];
  // payload bounds: a truncated file, a bogus vox_offset, or a header whose
  // dim[] claims more voxels than the payload holds must fail cleanly (the
  // python reader raises on the same input) instead of reading past the
  // buffer and handing the model garbage
  int64_t elem;
  switch (h.datatype) {
    case 2: case 256: elem = 1; break;
    case 4: case 512: elem = 2; break;
    case 8: case 768: case 16: elem = 4; break;
    case 64: elem = 8; break;
    default: return -5;
  }
  if (count < 0 || h.vox_offset < 0 || h.vox_offset > raw_size ||
      count > (raw_size - h.vox_offset) / elem)
    return -6;
  const uint8_t* voxels = raw + h.vox_offset;
  bool swap = h.big_endian;
  float sl = h.scl_slope, in = h.scl_inter;
  switch (h.datatype) {
    case 2:   convert<uint8_t>(voxels, out, count, false, sl, in); break;
    case 4:   convert<int16_t>(voxels, out, count, swap, sl, in); break;
    case 8:   convert<int32_t>(voxels, out, count, swap, sl, in); break;
    case 16:  convert<float>(voxels, out, count, swap, sl, in); break;
    case 64:  convert<double>(voxels, out, count, swap, sl, in); break;
    case 256: convert<int8_t>(voxels, out, count, false, sl, in); break;
    case 512: convert<uint16_t>(voxels, out, count, swap, sl, in); break;
    case 768: convert<uint32_t>(voxels, out, count, swap, sl, in); break;
    default:  return -5;
  }
  return static_cast<int>(count);
}

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf->resize(n);
  size_t got = std::fread(buf->data(), 1, n, f);
  std::fclose(f);
  return got == static_cast<size_t>(n) ? 0 : -2;
}

}  // namespace

extern "C" {

int evsr_decode_nifti(const uint8_t* data, int64_t size, float* out, int64_t capacity,
                      int64_t dims[8]) {
  return decode(data, size, out, capacity, dims);
}

int evsr_decode_nifti_file(const char* path, float* out, int64_t capacity, int64_t dims[8]) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf) != 0) return -20;
  return decode(buf.data(), static_cast<int64_t>(buf.size()), out, capacity, dims);
}

int evsr_nifti_dims(const char* path, int64_t dims[8]) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf) != 0) return -20;
  std::vector<uint8_t> inflated;
  const uint8_t* raw = buf.data();
  int64_t raw_size = static_cast<int64_t>(buf.size());
  if (is_gzip(raw, raw_size)) {
    if (gunzip(raw, raw_size, &inflated) != 0) return -10;
    raw = inflated.data();
    raw_size = static_cast<int64_t>(inflated.size());
  }
  Header h;
  int rc = parse_header(raw, raw_size, &h);
  if (rc != 0) return rc;
  dims[0] = h.ndim;
  for (int i = 0; i < 7; ++i) dims[i + 1] = h.shape[i];
  return h.ndim;
}

// Decode n files concurrently on `threads` std::threads (GIL-free on the
// Python side).  outs[i] must each hold capacities[i] floats; dims_out is
// n x 8.  Returns 0, or the first negative error code encountered.
int evsr_decode_batch(const char** paths, int n, float** outs, const int64_t* capacities,
                      int64_t* dims_out, int threads) {
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  int nthreads = threads > 0 ? threads : 4;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = evsr_decode_nifti_file(paths[i], outs[i], capacities[i], dims_out + i * 8);
      if (rc < 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < std::min(nthreads, n); ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return err.load();
}

}  // extern "C"
