// vkmr_cpu_main.cpp — standalone native CLI: the reference's CPU run path
// (`/root/reference/src/vkmr/Vkmr.cpp:28-58` + the serial engine,
// SHA-256plus.cpp:491-556) reproduced end-to-end with zero Python: chunked
// stdin ingest, SHA-NI x2 bulk leaf hashing, OMP'd Merkle reduction.
//
// Build: make -C vk_merkle_roots_tpu/native vkmr-cpu
// Usage: rndm 1712489279 1024 127 | ./vkmr-cpu
// Output contract matches the Python CLI / reference:
//   CPU-native: computed root (of N item(s), S byte(s)) => <hex> in <ms>

#include <cstdint>
#include <cstdio>
#include <ctime>
#include <string>
#include <vector>

extern "C" {
void vkmr_leaf_hashes(const uint8_t*, const int64_t*, const int64_t*, int64_t,
                      uint8_t*);
int vkmr_merkle_root(const uint8_t*, int64_t, int32_t, uint8_t*);
}

namespace {
double now_ms() {
  timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec * 1e3 + t.tv_nsec * 1e-6;
}
}  // namespace

int main() {
  const double t0 = now_ms();
  // Chunked ingest + newline split (ingest.py semantics: trailing fragment
  // counts; empty lines warned and skipped, Vkmr.cpp:40-43).
  std::vector<uint8_t> data;
  std::vector<int64_t> offsets, lengths;
  std::vector<uint8_t> buf(8 << 20);
  int64_t line_start = 0;
  uint64_t total_bytes = 0;
  size_t got;
  while ((got = fread(buf.data(), 1, buf.size(), stdin)) > 0) {
    const size_t base = data.size();
    data.insert(data.end(), buf.begin(), buf.begin() + got);
    for (size_t i = 0; i < got; ++i) {
      if (buf[i] != '\n') continue;
      const int64_t end = int64_t(base + i);
      if (end == line_start) {
        fprintf(stderr, "Read an empty string?\n");
      } else {
        offsets.push_back(line_start);
        lengths.push_back(end - line_start);
        total_bytes += uint64_t(end - line_start);
      }
      line_start = end + 1;
    }
  }
  if (ferror(stdin)) {
    // A truncated stream must not print a confident (wrong) root.
    fprintf(stderr, "stdin read error after %llu byte(s)\n",
            static_cast<unsigned long long>(data.size()));
    return 1;
  }
  if (int64_t(data.size()) > line_start) {  // trailing fragment is a line
    offsets.push_back(line_start);
    lengths.push_back(int64_t(data.size()) - line_start);
    total_bytes += uint64_t(int64_t(data.size()) - line_start);
  }
  const int64_t n = int64_t(lengths.size());
  if (n == 0) {
    // Empty stream: no summary line, matching the reference's count>0 gate
    // (Vkmr.cpp:52) and the Python CLI (cli.py run()).
    return 0;
  }
  std::vector<uint8_t> digests(size_t(n) * 32);
  vkmr_leaf_hashes(data.data(), offsets.data(), lengths.data(), n, digests.data());
  uint8_t root[32];
  if (vkmr_merkle_root(digests.data(), n, -1, root) != 0) {
    fprintf(stderr, "merkle root failed\n");
    return 1;
  }
  char hex[65];
  for (int i = 0; i < 32; ++i) snprintf(hex + 2 * i, 3, "%02x", root[i]);
  printf("CPU-native: computed root (of %lld item(s), %llu byte(s)) => %s in %g\n",
         static_cast<long long>(n), static_cast<unsigned long long>(total_bytes),
         hex, now_ms() - t0);
  return 0;
}
