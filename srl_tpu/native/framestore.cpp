// framestore — asynchronous frame/episode store for SRL dataset IO.
//
// Native runtime component of srl_tpu: the reference's dataset path writes a
// JPEG per step from each env worker process (state_representation/
// episode_saver.py); our batched generator produces frame batches far faster
// than Python-side npz compression can drain them. This library provides:
//
//   * an async writer: a background thread pool pulls enqueued frame batches
//     from a ring queue and appends them to a raw chunked file, so the
//     (TPU-feeding) host loop never blocks on disk;
//   * a reader that memory-maps the store for zero-copy numpy views.
//
// File layout: 64-byte header {magic 'SRLF', version, dtype code, ndim,
// dims[5], nframes (filled on close)} followed by densely packed frames.
// Exposed through a C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -shared -fPIC -o libframestore.so framestore.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
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

constexpr uint32_t kMagic = 0x53524C46;  // 'SRLF'
constexpr uint32_t kVersion = 1;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t dtype;  // 0=u8, 1=f32, 2=i32
  uint32_t ndim;   // dims of ONE frame
  uint64_t dims[5];
  uint64_t nframes;
};
static_assert(sizeof(Header) == 64, "header must be 64 bytes");

size_t dtype_size(uint32_t dtype) {
  switch (dtype) {
    case 0: return 1;
    case 1: return 4;
    case 2: return 4;
  }
  return 0;
}

struct Batch {
  std::vector<uint8_t> data;
  uint64_t nframes;
};

struct Writer {
  int fd = -1;
  Header header{};
  size_t frame_bytes = 0;
  std::deque<Batch> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_drain;
  std::thread worker;
  std::atomic<bool> closing{false};
  std::atomic<uint64_t> frames_written{0};
  size_t max_queue = 64;

  void run() {
    for (;;) {
      Batch batch;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_push.wait(lock, [&] { return !queue.empty() || closing.load(); });
        if (queue.empty()) {
          if (closing.load()) return;
          continue;
        }
        batch = std::move(queue.front());
        queue.pop_front();
      }
      cv_drain.notify_all();
      const uint8_t* p = batch.data.data();
      size_t remaining = batch.data.size();
      while (remaining > 0) {
        ssize_t n = ::write(fd, p, remaining);
        if (n <= 0) return;  // IO error: stop draining
        p += n;
        remaining -= static_cast<size_t>(n);
      }
      frames_written.fetch_add(batch.nframes);
    }
  }
};

struct Reader {
  int fd = -1;
  void* map = nullptr;
  size_t map_size = 0;
  Header header{};
};

}  // namespace

extern "C" {

// ---- writer ----------------------------------------------------------

void* fs_writer_open(const char* path, uint32_t dtype, uint32_t ndim,
                     const uint64_t* dims) {
  if (ndim == 0 || ndim > 5) return nullptr;
  auto* w = new Writer();
  w->fd = ::open(path, O_CREAT | O_TRUNC | O_WRONLY, 0644);
  if (w->fd < 0) {
    delete w;
    return nullptr;
  }
  w->header.magic = kMagic;
  w->header.version = kVersion;
  w->header.dtype = dtype;
  w->header.ndim = ndim;
  size_t frame_elems = 1;
  for (uint32_t i = 0; i < ndim; ++i) {
    w->header.dims[i] = dims[i];
    frame_elems *= dims[i];
  }
  w->frame_bytes = frame_elems * dtype_size(dtype);
  // Reserve the header; nframes patched on close.
  if (::write(w->fd, &w->header, sizeof(Header)) != sizeof(Header)) {
    ::close(w->fd);
    delete w;
    return nullptr;
  }
  w->worker = std::thread(&Writer::run, w);
  return w;
}

// Enqueue nframes frames (copied; returns immediately unless the queue is
// full, then blocks until the drain thread catches up).
int fs_writer_push(void* handle, const void* data, uint64_t nframes) {
  auto* w = static_cast<Writer*>(handle);
  if (w == nullptr || w->closing.load()) return -1;
  Batch batch;
  batch.nframes = nframes;
  batch.data.resize(static_cast<size_t>(nframes) * w->frame_bytes);
  std::memcpy(batch.data.data(), data, batch.data.size());
  {
    std::unique_lock<std::mutex> lock(w->mu);
    w->cv_drain.wait(lock, [&] { return w->queue.size() < w->max_queue; });
    w->queue.push_back(std::move(batch));
  }
  w->cv_push.notify_one();
  return 0;
}

uint64_t fs_writer_frames(void* handle) {
  return static_cast<Writer*>(handle)->frames_written.load();
}

// Flush, patch the header, join the worker. Returns total frames written.
uint64_t fs_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  {
    std::unique_lock<std::mutex> lock(w->mu);
    w->cv_drain.wait(lock, [&] { return w->queue.empty(); });
    w->closing.store(true);
  }
  w->cv_push.notify_all();
  w->worker.join();
  uint64_t total = w->frames_written.load();
  w->header.nframes = total;
  ::lseek(w->fd, 0, SEEK_SET);
  ::write(w->fd, &w->header, sizeof(Header));
  ::fsync(w->fd);
  ::close(w->fd);
  delete w;
  return total;
}

// ---- reader ----------------------------------------------------------

void* fs_reader_open(const char* path) {
  auto* r = new Reader();
  r->fd = ::open(path, O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  if (::fstat(r->fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  r->map_size = static_cast<size_t>(st.st_size);
  r->map = ::mmap(nullptr, r->map_size, PROT_READ, MAP_SHARED, r->fd, 0);
  if (r->map == MAP_FAILED) {
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  std::memcpy(&r->header, r->map, sizeof(Header));
  if (r->header.magic != kMagic) {
    ::munmap(r->map, r->map_size);
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  return r;
}

// Fills meta out-params; returns the zero-copy data pointer.
const void* fs_reader_data(void* handle, uint32_t* dtype, uint32_t* ndim,
                           uint64_t* dims, uint64_t* nframes) {
  auto* r = static_cast<Reader*>(handle);
  *dtype = r->header.dtype;
  *ndim = r->header.ndim;
  for (uint32_t i = 0; i < r->header.ndim; ++i) dims[i] = r->header.dims[i];
  *nframes = r->header.nframes;
  return static_cast<const uint8_t*>(r->map) + sizeof(Header);
}

void fs_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  ::munmap(r->map, r->map_size);
  ::close(r->fd);
  delete r;
}

}  // extern "C"
