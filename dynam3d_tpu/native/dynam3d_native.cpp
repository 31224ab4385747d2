// dynam3d_tpu native runtime: exact DTW + memory-mapped episode store.
//
// Host-side C++ replacing the reference's native substrate where it still
// matters off-TPU (SURVEY.md §2.2): the fastdtw dependency of the nDTW
// measure (habitat_extensions/measures.py:266-333) becomes an exact O(nm)
// DTW kernel, and the episode data path (the reference forks a habitat-sim
// process per env and ships observations over pipes; recorded-trace replay
// used lmdb) becomes a zero-copy mmap'd episode store with a page-prefetch
// thread so the TPU feed never stalls on disk.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <limits>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Exact DTW with euclidean point distance. Rolling 2-row DP: O(n*m) time,
// O(m) memory. pred: [n,dim], gt: [m,dim], row-major float64.
// ---------------------------------------------------------------------------
double dynam3d_dtw(const double* pred, int64_t n, const double* gt, int64_t m,
                   int64_t dim) {
  if (n <= 0 || m <= 0) return 0.0;
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> prev(m + 1, INF), cur(m + 1, INF);
  prev[0] = 0.0;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = INF;
    const double* pi = pred + (i - 1) * dim;
    for (int64_t j = 1; j <= m; ++j) {
      const double* gj = gt + (j - 1) * dim;
      double d2 = 0.0;
      for (int64_t k = 0; k < dim; ++k) {
        const double diff = pi[k] - gj[k];
        d2 += diff * diff;
      }
      const double d = std::sqrt(d2);
      const double best = std::min(prev[j], std::min(prev[j - 1], cur[j - 1]));
      cur[j] = d + best;
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// ---------------------------------------------------------------------------
// Episode store: mmap'd fixed-stride step records with background prefetch.
//
// Layout (little-endian):
//   header: int64 magic=0xD14A3D, int64 n_steps, int64 step_bytes,
//           int64 meta_bytes; meta (utf-8 json) ; steps back-to-back.
// The Python side defines the step record layout; C++ treats steps as blobs.
// ---------------------------------------------------------------------------
struct EpisodeStore {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  int64_t n_steps = 0;
  int64_t step_bytes = 0;
  int64_t meta_bytes = 0;
  const uint8_t* steps = nullptr;
  std::thread prefetcher;
  std::atomic<int64_t> prefetch_to{0};
  std::atomic<bool> stop{false};
};

static void prefetch_loop(EpisodeStore* s) {
  int64_t done = 0;
  const long page = sysconf(_SC_PAGESIZE);
  while (!s->stop.load(std::memory_order_relaxed)) {
    int64_t want = s->prefetch_to.load(std::memory_order_relaxed);
    if (want > s->n_steps) want = s->n_steps;
    if (done >= want) {
      std::this_thread::yield();
      usleep(200);
      continue;
    }
    const uint8_t* p = s->steps + done * s->step_bytes;
    // touch every page of the step so the feed thread never page-faults
    volatile uint8_t sink = 0;
    for (int64_t off = 0; off < s->step_bytes; off += page) sink ^= p[off];
    (void)sink;
    ++done;
  }
}

void* dynam3d_store_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }
  auto* s = new EpisodeStore();
  s->fd = fd;
  s->base = static_cast<uint8_t*>(base);
  s->size = st.st_size;
  const int64_t* hdr = reinterpret_cast<const int64_t*>(s->base);
  if (hdr[0] != 0xD14A3D) { munmap(base, st.st_size); ::close(fd); delete s; return nullptr; }
  s->n_steps = hdr[1];
  s->step_bytes = hdr[2];
  s->meta_bytes = hdr[3];
  s->steps = s->base + 4 * sizeof(int64_t) + s->meta_bytes;
  madvise(base, st.st_size, MADV_SEQUENTIAL);
  s->prefetcher = std::thread(prefetch_loop, s);
  return s;
}

int64_t dynam3d_store_n_steps(void* h) { return static_cast<EpisodeStore*>(h)->n_steps; }
int64_t dynam3d_store_step_bytes(void* h) { return static_cast<EpisodeStore*>(h)->step_bytes; }
int64_t dynam3d_store_meta_bytes(void* h) { return static_cast<EpisodeStore*>(h)->meta_bytes; }

void dynam3d_store_meta(void* h, uint8_t* out) {
  auto* s = static_cast<EpisodeStore*>(h);
  std::memcpy(out, s->base + 4 * sizeof(int64_t), s->meta_bytes);
}

// Copy step t into out and schedule prefetch of the next `ahead` steps.
void dynam3d_store_read(void* h, int64_t t, uint8_t* out, int64_t ahead) {
  auto* s = static_cast<EpisodeStore*>(h);
  if (t < 0 || t >= s->n_steps) return;
  int64_t want = std::min(t + 1 + ahead, s->n_steps);
  int64_t cur = s->prefetch_to.load(std::memory_order_relaxed);
  while (want > cur &&
         !s->prefetch_to.compare_exchange_weak(cur, want)) {}
  std::memcpy(out, s->steps + t * s->step_bytes, s->step_bytes);
}

void dynam3d_store_close(void* h) {
  auto* s = static_cast<EpisodeStore*>(h);
  s->stop.store(true);
  if (s->prefetcher.joinable()) s->prefetcher.join();
  munmap(s->base, s->size);
  ::close(s->fd);
  delete s;
}

}  // extern "C"
