// psi_native: host-side native runtime for the PSI TPU framework.
//
// Two components, mirroring where the reference uses native code:
//
// 1. chamfer_nn — brute-force nearest-neighbour distance on CPU
//    (the host-side analogue of the reference's CUDA extension
//    chamfer_pytorch/chamfer.cu; the TPU path is the Pallas kernel in
//    psi_tpu/ops/chamfer.py — this one serves host verification and
//    CPU-only deployments). Blocked over the query set for cache
//    locality.
//
// 2. A memory-mapped batch loader for the packed snapshot format
//    (.psipack): fixed-size records (depth/seg 128x128, body 72,
//    cam_ext 16, cam_int 9, max_d 1, sceneid 1), shuffled index,
//    double-buffered background prefetch thread that assembles the
//    next batch while the previous one is being consumed — replacing
//    the reference's single-threaded python per-batch assembly loop
//    (source/batch_gen_hdf5.py:185-265).
//
// C ABI only; Python binds via ctypes (psi_tpu/data/native_loader.py).

#include <atomic>
#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kImg = 128 * 128;
constexpr int kBody = 72;
constexpr int kExt = 16;
constexpr int kInt = 9;
// record: depth + seg + body + cam_ext + cam_int + max_d + sceneid
constexpr int kRecordFloats = kImg + kImg + kBody + kExt + kInt + 1 + 1;
constexpr uint64_t kMagic = 0x50534950414b3031ULL;  // "PSIPAK01"

struct PackHeader {
  uint64_t magic;
  uint64_t num_samples;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// chamfer (one direction): for each x point, min squared distance into y
// ---------------------------------------------------------------------------
void chamfer_nn(const float* x, int n, const float* y, int m, float* dist,
                int* idx) {
  constexpr int kBlock = 256;
  for (int i0 = 0; i0 < n; i0 += kBlock) {
    const int i1 = std::min(i0 + kBlock, n);
    for (int i = i0; i < i1; ++i) {
      dist[i] = 3.0e38f;
      idx[i] = 0;
    }
    for (int j = 0; j < m; ++j) {
      const float yx = y[3 * j], yy = y[3 * j + 1], yz = y[3 * j + 2];
      for (int i = i0; i < i1; ++i) {
        const float dx = x[3 * i] - yx;
        const float dy = x[3 * i + 1] - yy;
        const float dz = x[3 * i + 2] - yz;
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < dist[i]) {
          dist[i] = d;
          idx[i] = j;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// pack writer
// ---------------------------------------------------------------------------
int pack_write(const char* path, const float* depth, const float* seg,
               const float* body, const float* cam_ext, const float* cam_int,
               const float* max_d, const int* sceneid, int n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  PackHeader h{kMagic, static_cast<uint64_t>(n)};
  fwrite(&h, sizeof(h), 1, f);
  std::vector<float> rec(kRecordFloats);
  for (int i = 0; i < n; ++i) {
    float* p = rec.data();
    std::memcpy(p, depth + (size_t)i * kImg, kImg * sizeof(float)); p += kImg;
    std::memcpy(p, seg + (size_t)i * kImg, kImg * sizeof(float)); p += kImg;
    std::memcpy(p, body + (size_t)i * kBody, kBody * sizeof(float)); p += kBody;
    std::memcpy(p, cam_ext + (size_t)i * kExt, kExt * sizeof(float)); p += kExt;
    std::memcpy(p, cam_int + (size_t)i * kInt, kInt * sizeof(float)); p += kInt;
    *p++ = max_d[i];
    *p++ = static_cast<float>(sceneid[i]);
    fwrite(rec.data(), sizeof(float), kRecordFloats, f);
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// loader
// ---------------------------------------------------------------------------
struct Batch {
  std::vector<float> depth, seg, body, cam_ext, cam_int, max_d;
  std::vector<int> sceneid;
  void resize(int b) {
    depth.resize((size_t)b * kImg);
    seg.resize((size_t)b * kImg);
    body.resize((size_t)b * kBody);
    cam_ext.resize((size_t)b * kExt);
    cam_int.resize((size_t)b * kInt);
    max_d.resize(b);
    sceneid.resize(b);
  }
};

struct Loader {
  int fd = -1;
  const float* data = nullptr;  // record area, mmap'd
  size_t map_len = 0;
  uint64_t num_samples = 0;
  int batch_size = 0;
  bool drop_last = true;

  std::vector<uint32_t> order;
  std::mt19937_64 rng;
  size_t cursor = 0;  // next sample to stage

  // double buffer
  Batch buf[2];
  int ready_slot = -1;         // slot holding a staged batch
  bool eof_staged = false;     // prefetcher hit the end
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<bool> stop{false};

  void stage_into(Batch& b, size_t start) {
    for (int i = 0; i < batch_size; ++i) {
      const float* rec = data + (size_t)order[start + i] * kRecordFloats;
      std::memcpy(b.depth.data() + (size_t)i * kImg, rec, kImg * sizeof(float));
      rec += kImg;
      std::memcpy(b.seg.data() + (size_t)i * kImg, rec, kImg * sizeof(float));
      rec += kImg;
      std::memcpy(b.body.data() + (size_t)i * kBody, rec, kBody * sizeof(float));
      rec += kBody;
      std::memcpy(b.cam_ext.data() + (size_t)i * kExt, rec, kExt * sizeof(float));
      rec += kExt;
      std::memcpy(b.cam_int.data() + (size_t)i * kInt, rec, kInt * sizeof(float));
      rec += kInt;
      b.max_d[i] = rec[0];
      b.sceneid[i] = static_cast<int>(rec[1]);
    }
  }

  void prefetch_loop() {
    int slot = 0;
    while (true) {
      size_t start;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return stop.load() || ready_slot == -1; });
        if (stop.load()) return;
        if (cursor + batch_size > num_samples) {
          eof_staged = true;
          cv_ready.notify_all();
          cv_free.wait(lk, [&] { return stop.load() || !eof_staged; });
          if (stop.load()) return;
          slot = 0;
          continue;
        }
        start = cursor;          // reserve the slice under the lock
        cursor += batch_size;
      }
      stage_into(buf[slot], start);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready_slot = slot;
      }
      cv_ready.notify_all();
      slot ^= 1;
    }
  }
};

void* loader_create(const char* path, int batch_size, uint64_t seed,
                    int drop_last) {
  auto* l = new Loader();
  l->fd = open(path, O_RDONLY);
  if (l->fd < 0) { delete l; return nullptr; }
  struct stat st;
  fstat(l->fd, &st);
  l->map_len = st.st_size;
  void* m = mmap(nullptr, l->map_len, PROT_READ, MAP_PRIVATE, l->fd, 0);
  if (m == MAP_FAILED) { close(l->fd); delete l; return nullptr; }
  const PackHeader* h = static_cast<const PackHeader*>(m);
  if (h->magic != kMagic) { munmap(m, l->map_len); close(l->fd); delete l; return nullptr; }
  l->num_samples = h->num_samples;
  l->data = reinterpret_cast<const float*>(static_cast<const char*>(m) + sizeof(PackHeader));
  l->batch_size = batch_size;
  l->drop_last = drop_last != 0;
  l->rng.seed(seed);
  l->order.resize(l->num_samples);
  std::iota(l->order.begin(), l->order.end(), 0u);
  std::shuffle(l->order.begin(), l->order.end(), l->rng);
  l->buf[0].resize(batch_size);
  l->buf[1].resize(batch_size);
  l->worker = std::thread([l] { l->prefetch_loop(); });
  return l;
}

int loader_num_samples(void* lp) {
  return static_cast<int>(static_cast<Loader*>(lp)->num_samples);
}

// returns 1 on success, 0 on epoch end
int loader_next(void* lp, float* depth, float* seg, float* body, float* cam_ext,
                float* cam_int, float* max_d, int* sceneid) {
  auto* l = static_cast<Loader*>(lp);
  int slot;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_ready.wait(lk, [&] { return l->ready_slot != -1 || l->eof_staged; });
    if (l->ready_slot == -1) return 0;  // eof
    slot = l->ready_slot;
  }
  const Batch& b = l->buf[slot];
  std::memcpy(depth, b.depth.data(), b.depth.size() * sizeof(float));
  std::memcpy(seg, b.seg.data(), b.seg.size() * sizeof(float));
  std::memcpy(body, b.body.data(), b.body.size() * sizeof(float));
  std::memcpy(cam_ext, b.cam_ext.data(), b.cam_ext.size() * sizeof(float));
  std::memcpy(cam_int, b.cam_int.data(), b.cam_int.size() * sizeof(float));
  std::memcpy(max_d, b.max_d.data(), b.max_d.size() * sizeof(float));
  std::memcpy(sceneid, b.sceneid.data(), b.sceneid.size() * sizeof(int));
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->ready_slot = -1;
  }
  l->cv_free.notify_all();
  return 1;
}

void loader_reset(void* lp) {
  auto* l = static_cast<Loader*>(lp);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    // drop any staged batch, reshuffle, restart
    l->cursor = 0;
    l->ready_slot = -1;
    l->eof_staged = false;
    std::shuffle(l->order.begin(), l->order.end(), l->rng);
  }
  l->cv_free.notify_all();
}

void loader_destroy(void* lp) {
  auto* l = static_cast<Loader*>(lp);
  l->stop.store(true);
  l->cv_free.notify_all();
  l->cv_ready.notify_all();
  if (l->worker.joinable()) l->worker.join();
  if (l->data) {
    munmap(const_cast<void*>(static_cast<const void*>(
               reinterpret_cast<const char*>(l->data) - sizeof(PackHeader))),
           l->map_len);
  }
  if (l->fd >= 0) close(l->fd);
  delete l;
}

}  // extern "C"
