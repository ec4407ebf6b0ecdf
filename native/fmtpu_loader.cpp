// fmtpu_loader — native batch assembly for the training input pipeline.
//
// The TPU-native analog of the reference's torch DataLoader workers
// (/root/reference/lightning_new.py:160-180): training samples are
// pre-serialized into one flat binary cache file (by
// featurematching_tpu/data/native_cache.py); this library mmaps the cache and
// assembles fixed-shape batches into caller-provided buffers with a thread
// pool — no GIL, no per-sample numpy allocation, and a prefetch ring so the
// host never stalls the device feed.
//
// Cache format (little-endian):
//   header:  magic 'FMTP' | u32 version | u64 num_samples | u64 sample_bytes
//   payload: num_samples contiguous sample records (raw bytes; the Python
//            side defines the field layout and strides within a record)
//
// C API (ctypes-friendly):
//   void* fmtpu_open(const char* path)
//   long long fmtpu_num_samples(void* h)
//   long long fmtpu_sample_bytes(void* h)
//   int  fmtpu_gather(void* h, const long long* indices, int n,
//                     unsigned char* out, int num_threads)
//   int  fmtpu_prefetch_start(void* h, const long long* indices,
//                             long long n_total, int batch, int num_threads,
//                             int ring_slots)
//   int  fmtpu_prefetch_next(void* h, unsigned char* out)   // blocks
//   void fmtpu_prefetch_stop(void* h)
//   void fmtpu_close(void* h)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Header {
  char magic[4];
  uint32_t version;
  uint64_t num_samples;
  uint64_t sample_bytes;
};

struct PrefetchState {
  std::vector<int64_t> indices;
  int64_t cursor = 0;
  int batch = 0;
  int num_threads = 1;
  std::deque<std::vector<uint8_t>> ready;
  size_t ring_slots = 2;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  bool running = false;
};

struct Handle {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t mapped = 0;
  Header hdr{};
  PrefetchState pf;
};

void gather_range(const Handle* h, const int64_t* idx, int begin, int end,
                  uint8_t* out) {
  const size_t sb = h->hdr.sample_bytes;
  const uint8_t* payload = h->base + sizeof(Header);
  for (int i = begin; i < end; ++i) {
    int64_t s = idx[i];
    if (s < 0 || s >= (int64_t)h->hdr.num_samples) {
      std::memset(out + (size_t)i * sb, 0, sb);
    } else {
      std::memcpy(out + (size_t)i * sb, payload + (size_t)s * sb, sb);
    }
  }
}

int gather_impl(const Handle* h, const int64_t* indices, int n, uint8_t* out,
                int num_threads) {
  if (num_threads <= 1 || n < 4) {
    gather_range(h, indices, 0, n, out);
    return 0;
  }
  int nt = std::min(num_threads, n);
  std::vector<std::thread> threads;
  int per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int b = t * per;
    int e = std::min(n, b + per);
    if (b >= e) break;
    threads.emplace_back(gather_range, h, indices, b, e, out);
  }
  for (auto& th : threads) th.join();
  return 0;
}

void prefetch_loop(Handle* h) {
  PrefetchState& pf = h->pf;
  const size_t bytes = (size_t)pf.batch * h->hdr.sample_bytes;
  while (!pf.stop.load()) {
    int64_t start;
    {
      std::lock_guard<std::mutex> lk(pf.mu);
      if (pf.cursor >= (int64_t)pf.indices.size()) break;
      start = pf.cursor;
      pf.cursor += pf.batch;
    }
    int n = (int)std::min<int64_t>(pf.batch, pf.indices.size() - start);
    std::vector<uint8_t> buf(bytes, 0);
    gather_impl(h, pf.indices.data() + start, n, buf.data(), pf.num_threads);
    std::unique_lock<std::mutex> lk(pf.mu);
    pf.cv_space.wait(lk, [&] {
      return pf.ready.size() < pf.ring_slots || pf.stop.load();
    });
    if (pf.stop.load()) break;
    pf.ready.push_back(std::move(buf));
    pf.cv_ready.notify_one();
  }
  std::lock_guard<std::mutex> lk(pf.mu);
  pf.running = false;
  pf.cv_ready.notify_all();
}

}  // namespace

extern "C" {

void* fmtpu_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* h = new Handle();
  h->fd = fd;
  h->base = (const uint8_t*)base;
  h->mapped = st.st_size;
  std::memcpy(&h->hdr, base, sizeof(Header));
  if (std::memcmp(h->hdr.magic, "FMTP", 4) != 0 ||
      sizeof(Header) + h->hdr.num_samples * h->hdr.sample_bytes >
          (uint64_t)st.st_size) {
    munmap((void*)h->base, h->mapped);
    ::close(fd);
    delete h;
    return nullptr;
  }
  return h;
}

long long fmtpu_num_samples(void* hv) {
  return ((Handle*)hv)->hdr.num_samples;
}

long long fmtpu_sample_bytes(void* hv) {
  return ((Handle*)hv)->hdr.sample_bytes;
}

int fmtpu_gather(void* hv, const long long* indices, int n, unsigned char* out,
                 int num_threads) {
  return gather_impl((Handle*)hv, (const int64_t*)indices, n, out,
                     num_threads);
}

int fmtpu_prefetch_start(void* hv, const long long* indices, long long n_total,
                         int batch, int num_threads, int ring_slots) {
  auto* h = (Handle*)hv;
  if (h->pf.running) return -1;
  h->pf.indices.assign(indices, indices + n_total);
  h->pf.cursor = 0;
  h->pf.batch = batch;
  h->pf.num_threads = num_threads;
  h->pf.ring_slots = ring_slots > 0 ? ring_slots : 2;
  h->pf.ready.clear();
  h->pf.stop.store(false);
  h->pf.running = true;
  h->pf.worker = std::thread(prefetch_loop, h);
  return 0;
}

int fmtpu_prefetch_next(void* hv, unsigned char* out) {
  auto* h = (Handle*)hv;
  std::unique_lock<std::mutex> lk(h->pf.mu);
  h->pf.cv_ready.wait(lk, [&] {
    return !h->pf.ready.empty() || !h->pf.running;
  });
  if (h->pf.ready.empty()) return -1;  // exhausted
  auto buf = std::move(h->pf.ready.front());
  h->pf.ready.pop_front();
  h->pf.cv_space.notify_one();
  lk.unlock();
  std::memcpy(out, buf.data(), buf.size());
  return (int)(buf.size() / h->hdr.sample_bytes);
}

void fmtpu_prefetch_stop(void* hv) {
  auto* h = (Handle*)hv;
  h->pf.stop.store(true);
  h->pf.cv_space.notify_all();
  h->pf.cv_ready.notify_all();
  if (h->pf.worker.joinable()) h->pf.worker.join();
  h->pf.running = false;
}

void fmtpu_close(void* hv) {
  auto* h = (Handle*)hv;
  fmtpu_prefetch_stop(hv);
  if (h->base) munmap((void*)h->base, h->mapped);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
