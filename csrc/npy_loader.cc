// Native data-path runtime: .npy reading + batch assembly.
//
// The training input pipeline's host-side hot loop is "read K float32 .npy
// files, truncate/zero-pad each into one [B, T, D] batch buffer"
// (the reference does this in Python with np.load + per-sample copies,
// dataset/RepurposeClip.py:449-533). This module does it with pread into the
// destination buffer directly — one copy, no Python object churn — and fans
// files out across a small thread pool.
//
// C ABI only (consumed via ctypes from repurpose_tpu.data.native):
//   npy_probe(path, &rows, &cols)            -> 0 ok / negative errno-ish
//   npy_load_f32(path, out, max_rows, cols)  -> rows written (zero-pads NOT
//                                               done here; caller pre-zeros)
//   npy_batch_load_f32(paths, n, out, t, d, rows_out, n_threads) -> 0 ok
//
// Only the layout the corpus uses is supported: little-endian float32
// ('<f4'), C-order, 2-D. Anything else returns an error and the Python side
// falls back to numpy.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct NpyInfo {
  int64_t rows = 0;
  int64_t cols = 0;
  int64_t data_offset = 0;
};

// Parse the .npy v1/v2 header. Returns 0 on success.
int parse_header(int fd, NpyInfo* info) {
  unsigned char pre[12];
  if (pread(fd, pre, 10, 0) != 10) return -EIO;
  if (memcmp(pre, "\x93NUMPY", 6) != 0) return -EINVAL;
  int major = pre[6];
  uint32_t hlen;
  int64_t header_start;
  if (major == 1) {
    hlen = pre[8] | (pre[9] << 8);
    header_start = 10;
  } else {
    if (pread(fd, pre, 12, 0) != 12) return -EIO;
    hlen = pre[8] | (pre[9] << 8) | (pre[10] << 16) |
           (static_cast<uint32_t>(pre[11]) << 24);
    header_start = 12;
  }
  // real .npy headers are < 64 KiB; an absurd hlen means corrupt bytes (a
  // ~4 GiB string alloc here could throw and escape the C ABI)
  if (hlen == 0 || hlen > (1u << 20)) return -EINVAL;
  std::string header(hlen, '\0');
  if (pread(fd, header.data(), hlen, header_start) != (ssize_t)hlen)
    return -EIO;
  if (header.find("'descr': '<f4'") == std::string::npos &&
      header.find("\"descr\": \"<f4\"") == std::string::npos)
    return -ENOTSUP;
  if (header.find("'fortran_order': False") == std::string::npos)
    return -ENOTSUP;
  auto sp = header.find("'shape':");
  if (sp == std::string::npos) return -EINVAL;
  auto lp = header.find('(', sp);
  auto rp = header.find(')', sp);
  if (lp == std::string::npos || rp == std::string::npos) return -EINVAL;
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  long long r = 0, c = 0, extra = 0;
  int n = sscanf(shape.c_str(), "%lld , %lld , %lld", &r, &c, &extra);
  if (n != 2) return -ENOTSUP;  // 1-D or >=3-D: numpy fallback handles it
  if (r < 0 || c < 0) return -EINVAL;  // corrupt header
  info->rows = r;
  info->cols = c;
  info->data_offset = header_start + hlen;
  return 0;
}

int load_into(const char* path, float* out, int64_t max_rows, int64_t cols,
              int64_t* rows_written) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;
  NpyInfo info;
  int rc = parse_header(fd, &info);
  if (rc != 0) {
    close(fd);
    return rc;
  }
  if (info.cols != cols) {
    close(fd);
    return -ERANGE;
  }
  int64_t rows = info.rows < max_rows ? info.rows : max_rows;
  int64_t bytes = rows * cols * (int64_t)sizeof(float);
  int64_t done = 0;
  while (done < bytes) {
    ssize_t got = pread(fd, reinterpret_cast<char*>(out) + done, bytes - done,
                        info.data_offset + done);
    if (got <= 0) {
      close(fd);
      return -EIO;
    }
    done += got;
  }
  close(fd);
  *rows_written = rows;
  return 0;
}

}  // namespace

extern "C" {

int npy_probe(const char* path, int64_t* rows, int64_t* cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;
  NpyInfo info;
  int rc = parse_header(fd, &info);
  close(fd);
  if (rc != 0) return rc;
  *rows = info.rows;
  *cols = info.cols;
  return 0;
}

int64_t npy_load_f32(const char* path, float* out, int64_t max_rows,
                     int64_t cols) {
  int64_t rows = 0;
  int rc = load_into(path, out, max_rows, cols, &rows);
  return rc == 0 ? rows : rc;
}

// Load n files into out[b, t, d] (pre-zeroed by the caller); rows_out[b]
// gets the per-file row count (clamped to t). Returns 0, or the first
// nonzero error code encountered.
int npy_batch_load_f32(const char** paths, int64_t n, float* out, int64_t t,
                       int64_t d, int64_t* rows_out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> errs(n, 0);
  auto worker = [&](int64_t start, int64_t step) {
    for (int64_t i = start; i < n; i += step) {
      int64_t rows = 0;
      int rc = load_into(paths[i], out + i * t * d, t, d, &rows);
      rows_out[i] = rc == 0 ? rows : 0;
      errs[i] = rc;
    }
  };
  if (n_threads == 1 || n == 1) {
    worker(0, 1);
  } else {
    // no exception may escape the C ABI (std::terminate through ctypes):
    // thread construction can throw under resource pressure. Join whatever
    // spawned, then run the unspawned strides inline — every stride runs
    // exactly once either way.
    std::vector<std::thread> threads;
    int k = n_threads < n ? n_threads : (int)n;
    int started = 0;
    try {
      threads.reserve(k);
      for (int i = 0; i < k; ++i) {
        threads.emplace_back(worker, i, k);
        ++started;
      }
    } catch (...) {
    }
    for (auto& th : threads) th.join();
    for (int i = started; i < k; ++i) worker(i, k);
  }
  for (int64_t i = 0; i < n; ++i)
    if (errs[i] != 0) return errs[i];
  return 0;
}

}  // extern "C"
