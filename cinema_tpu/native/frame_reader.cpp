// GIL-free NIfTI frame reader for the UKB cine input pipeline.
//
// The pretrain loader reads ONE random time frame per study per step from
// 4D .nii.gz volumes (reference cinema/mae/pretrain.py:88-119 does this via
// SimpleITK's streaming reader). The pure-Python reader in
// cinema_tpu/data/nifti.py stream-decompresses the gzip prefix under the
// GIL; this module does the decompression in C++ (zlib) so dataset worker
// threads/processes scale with cores, and adds a threaded batch entry point
// that decodes a whole batch of frames concurrently.
//
// Exposed C API (ctypes-friendly, see cinema_tpu/native/__init__.py):
//   ct_probe(path, header*)                      -> parse the 348-byte header
//   ct_read_at(path, offset, nbytes, out*)       -> seek + read raw voxels
//   ct_read_at_batch(n, paths, offsets, nbytes, outs, n_threads)
//
// gzopen/gzseek/gzread handle BOTH gzipped and raw files transparently
// (zlib checks the magic), matching the .nii / .nii.gz duality.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

// Frame offsets in large 4D studies can exceed 2GB; with a 32-bit z_off_t
// the gzseek cast below would silently wrap and read the WRONG frame.
// Refuse to build in that case (the loader then falls back to the Python
// reader, which handles 64-bit offsets correctly).
static_assert(sizeof(z_off_t) == 8,
              "zlib built without large-file support (32-bit z_off_t)");

extern "C" {

typedef struct {
  int64_t ndim;
  int64_t shape[7];
  int32_t datatype;
  int32_t bitpix;
  int64_t vox_offset;
  float scl_slope;
  float scl_inter;
} CtNiftiHeader;

// error codes
enum {
  CT_OK = 0,
  CT_ERR_OPEN = 1,
  CT_ERR_READ = 2,
  CT_ERR_MAGIC = 3,
  CT_ERR_SEEK = 4,
};

static int16_t rd_i16(const unsigned char* b) {
  int16_t v;
  std::memcpy(&v, b, 2);
  return v;  // NIfTI-1 headers here are little-endian, as is every TPU host
}

static float rd_f32(const unsigned char* b) {
  float v;
  std::memcpy(&v, b, 4);
  return v;
}

int ct_probe(const char* path, CtNiftiHeader* out) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return CT_ERR_OPEN;
  unsigned char hdr[348];
  int n = gzread(f, hdr, 348);
  gzclose(f);
  if (n != 348) return CT_ERR_READ;
  if (std::memcmp(hdr + 344, "n+1", 3) != 0 && std::memcmp(hdr + 344, "ni1", 3) != 0)
    return CT_ERR_MAGIC;
  int16_t ndim = rd_i16(hdr + 40);
  if (ndim < 1 || ndim > 7) return CT_ERR_MAGIC;
  out->ndim = ndim;
  for (int i = 0; i < 7; ++i)
    out->shape[i] = (i < ndim) ? rd_i16(hdr + 42 + 2 * i) : 1;
  out->datatype = rd_i16(hdr + 70);
  out->bitpix = rd_i16(hdr + 72);
  out->vox_offset = (int64_t)rd_f32(hdr + 108);
  out->scl_slope = rd_f32(hdr + 112);
  out->scl_inter = rd_f32(hdr + 116);
  return CT_OK;
}

int ct_read_at(const char* path, int64_t offset, int64_t nbytes, unsigned char* out) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return CT_ERR_OPEN;
  // 256KB internal buffer: fewer inflate calls on the sequential skip
  gzbuffer(f, 1 << 18);
  if (gzseek(f, (z_off_t)offset, SEEK_SET) < 0) {
    gzclose(f);
    return CT_ERR_SEEK;
  }
  int64_t done = 0;
  while (done < nbytes) {
    unsigned chunk = (unsigned)((nbytes - done) > (1 << 30) ? (1 << 30) : (nbytes - done));
    int n = gzread(f, out + done, chunk);
    if (n <= 0) {
      gzclose(f);
      return CT_ERR_READ;
    }
    done += n;
  }
  gzclose(f);
  return CT_OK;
}

// Inflate ONE gzip member located at byte range [offset, offset+clen) of
// the file — the frame-indexed .nii.gz fast path (data/nifti.py writes one
// member per time frame with an FEXTRA offset table). pread + inflate only;
// no sequential skip over earlier members.
int ct_inflate_at(const char* path, int64_t offset, int64_t clen,
                  unsigned char* out, int64_t nbytes) {
  FILE* fp = std::fopen(path, "rb");
  if (fp == nullptr) return CT_ERR_OPEN;
  std::vector<unsigned char> comp((size_t)clen);
  if (std::fseek(fp, (long)offset, SEEK_SET) != 0 ||
      std::fread(comp.data(), 1, (size_t)clen, fp) != (size_t)clen) {
    std::fclose(fp);
    return CT_ERR_READ;
  }
  std::fclose(fp);
  z_stream strm;
  std::memset(&strm, 0, sizeof(strm));
  if (inflateInit2(&strm, 31) != Z_OK) return CT_ERR_READ;  // 31: gzip wrapper
  strm.next_in = comp.data();
  strm.avail_in = (uInt)clen;
  strm.next_out = out;
  strm.avail_out = (uInt)nbytes;
  int rc = inflate(&strm, Z_FINISH);
  int64_t got = (int64_t)strm.total_out;
  inflateEnd(&strm);
  return (rc == Z_STREAM_END && got == nbytes) ? CT_OK : CT_ERR_READ;
}

int ct_read_at_batch(int64_t n, const char** paths, const int64_t* offsets,
                     const int64_t* nbytes, unsigned char** outs, int64_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> rcs((size_t)n, CT_OK);
  std::vector<std::thread> pool;
  std::vector<int64_t> next(1, 0);
  // static shard: thread t handles items t, t+T, t+2T, ...
  for (int64_t t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int64_t i = t; i < n; i += n_threads)
        rcs[(size_t)i] = ct_read_at(paths[i], offsets[i], nbytes[i], outs[i]);
    });
  }
  for (auto& th : pool) th.join();
  for (int64_t i = 0; i < n; ++i)
    if (rcs[(size_t)i] != CT_OK) return rcs[(size_t)i];
  return CT_OK;
}

}  // extern "C"
