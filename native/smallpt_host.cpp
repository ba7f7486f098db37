// Native host runtime for smallpt_tpu (libsmallpt_host.so).
//
// The reference's host-side native layer is a C++ threading runtime
// (ThreadUtils.h:14-166) plus GL presentation (glutils.cpp). The TPU build
// keeps all compute on-device (XLA owns the render loop), so the native
// layer covers the host-bound presentation path instead:
//
//   - spt_tonemap:     threaded gamma-2.2 8-bit tone map (toInt, smallpt.cpp:52)
//   - spt_flip_y:      threaded vertical flip (flipY, smallpt.cpp:125-134)
//   - spt_write_ppm:   tone map + ASCII P3 / binary P6 PPM encode + write
//                      (writeImage, smallpt.cpp:136-142 — but fclose'd, see
//                      SURVEY.md Appendix A on the reference's leak)
//   - spt_frame_writer_*: an async frame sink — a background consumer thread
//                      that encodes/writes progressive frames while the host
//                      driver keeps stepping the device, replicating the
//                      reference's two-thread producer/consumer display
//                      pipeline (smallpt.cpp:895-988) without a window.
//
// The internal parallel_for mirrors shn::asyncParallelLoop's dynamic
// batch-counter load balancing (ThreadUtils.h:88-117).
//
// Build: make -C native   (produces libsmallpt_host.so; loaded via ctypes
// from smallpt_tpu/utils/native.py, with a pure-numpy fallback when absent).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

int default_threads() {
  unsigned hw = std::thread::hardware_concurrency();
  // reference uses hardware_concurrency - 2 render threads (smallpt.cpp:280)
  return hw > 2 ? static_cast<int>(hw - 2) : 1;
}

// Dynamic-load-balanced parallel loop over [0, n): worker threads pull
// batches off an atomic counter (ThreadUtils.h:90-114's scheme).
void parallel_for(long long n, int n_threads,
                  const std::function<void(long long, long long)>& fn) {
  if (n <= 0) return;
  if (n_threads <= 0) n_threads = default_threads();
  long long block = n / (4 * n_threads);
  if (block < 4096) block = 4096;
  if (n_threads == 1 || n <= block) {
    fn(0, n);
    return;
  }
  std::atomic<long long> next(0);
  auto worker = [&]() {
    for (;;) {
      long long start = next.fetch_add(block);
      if (start >= n) return;
      long long end = start + block;
      if (end > n) end = n;
      fn(start, end);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
}

// toInt (smallpt.cpp:52): int(pow(clamp(x), 1/2.2) * 255 + .5)
inline uint8_t tonemap1(float x) {
  if (!(x > 0.f)) x = 0.f;  // also catches NaN
  if (x > 1.f) x = 1.f;
  return static_cast<uint8_t>(std::pow(x, 1.f / 2.2f) * 255.f + .5f);
}

void tonemap_range(const float* in, uint8_t* out, long long start,
                   long long end) {
  for (long long i = start; i < end; ++i) out[i] = tonemap1(in[i]);
}

// Encode one row of RGB8 as ASCII "r g b " triples. Returns bytes written.
size_t encode_row_ascii(const uint8_t* rgb, int w, char* buf) {
  char* p = buf;
  for (int i = 0; i < 3 * w; ++i) {
    unsigned v = rgb[i];
    if (v >= 100) {
      *p++ = static_cast<char>('0' + v / 100);
      v %= 100;
      *p++ = static_cast<char>('0' + v / 10);
      *p++ = static_cast<char>('0' + v % 10);
    } else if (v >= 10) {
      *p++ = static_cast<char>('0' + v / 10);
      *p++ = static_cast<char>('0' + v % 10);
    } else {
      *p++ = static_cast<char>('0' + v);
    }
    *p++ = ' ';
  }
  return static_cast<size_t>(p - buf);
}

int write_ppm_impl(const char* path, const float* img, int w, int h,
                   int binary, int n_threads) {
  if (w <= 0 || h <= 0) return 2;
  const long long n = 3LL * w * h;
  std::vector<uint8_t> rgb(static_cast<size_t>(n));
  parallel_for(n, n_threads, [&](long long s, long long e) {
    tonemap_range(img, rgb.data(), s, e);
  });

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  int rc = 0;
  if (binary) {
    std::fprintf(f, "P6\n%d %d\n255\n", w, h);
    if (std::fwrite(rgb.data(), 1, static_cast<size_t>(n), f) !=
        static_cast<size_t>(n))
      rc = 3;
  } else {
    std::fprintf(f, "P3\n%d %d\n255\n", w, h);
    // encode rows in parallel into per-row buffers, write sequentially
    const size_t row_cap = static_cast<size_t>(w) * 3 * 4;  // "255 " max
    std::vector<char> bufs(row_cap * static_cast<size_t>(h));
    std::vector<size_t> lens(static_cast<size_t>(h));
    parallel_for(h, n_threads, [&](long long s, long long e) {
      for (long long r = s; r < e; ++r)
        lens[static_cast<size_t>(r)] =
            encode_row_ascii(rgb.data() + 3LL * w * r, w,
                             bufs.data() + row_cap * static_cast<size_t>(r));
    });
    for (int r = 0; r < h && rc == 0; ++r)
      if (std::fwrite(bufs.data() + row_cap * static_cast<size_t>(r), 1,
                      lens[static_cast<size_t>(r)],
                      f) != lens[static_cast<size_t>(r)])
        rc = 3;
  }
  if (std::fclose(f) != 0 && rc == 0) rc = 4;
  return rc;
}

// ---- async frame writer ---------------------------------------------------

struct Frame {
  std::vector<float> pixels;
  int index;
};

struct FrameWriter {
  std::string pattern;  // printf pattern with one %d, e.g. "frame_%05d.ppm"
  int w, h, binary;
  size_t max_queue;
  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv_push;  // signaled when queue shrinks
  std::condition_variable cv_pop;   // signaled when queue grows / shutdown
  bool shutdown = false;
  std::atomic<long long> written{0};
  std::atomic<int> errors{0};
  std::thread worker;

  void run() {
    for (;;) {
      Frame frame;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_pop.wait(lk, [&] { return shutdown || !queue.empty(); });
        if (queue.empty()) return;  // shutdown and drained
        frame = std::move(queue.front());
        queue.pop_front();
        cv_push.notify_one();
      }
      char path[4096];
      std::snprintf(path, sizeof(path), pattern.c_str(), frame.index);
      // single-threaded encode: keep the consumer light so the producer's
      // cores stay free (the render driver owns the machine)
      if (write_ppm_impl(path, frame.pixels.data(), w, h, binary, 1) != 0)
        errors.fetch_add(1);
      written.fetch_add(1);
    }
  }
};

}  // namespace

extern "C" {

int spt_version() { return 1; }

int spt_default_threads() { return default_threads(); }

// Threaded gamma-2.2 tone map: n float values -> n uint8.
void spt_tonemap(const float* in, uint8_t* out, long long n, int n_threads) {
  parallel_for(n, n_threads,
               [&](long long s, long long e) { tonemap_range(in, out, s, e); });
}

// Threaded vertical flip of an (h, w, 3) float32 image, in place.
void spt_flip_y(float* img, int w, int h, int n_threads) {
  const long long row = 3LL * w;
  parallel_for(h / 2, n_threads, [&](long long s, long long e) {
    std::vector<float> tmp(static_cast<size_t>(row));
    for (long long r = s; r < e; ++r) {
      float* a = img + r * row;
      float* b = img + (h - 1 - r) * row;
      std::memcpy(tmp.data(), a, sizeof(float) * row);
      std::memcpy(a, b, sizeof(float) * row);
      std::memcpy(b, tmp.data(), sizeof(float) * row);
    }
  });
}

// Tone map + write PPM. binary=0 -> ASCII P3 (the reference's format,
// smallpt.cpp:136-142); binary=1 -> P6. Returns 0 on success.
int spt_write_ppm(const char* path, const float* img, int w, int h,
                  int binary) {
  return write_ppm_impl(path, img, w, h, binary, 0);
}

// Create an async frame writer. pattern must contain one %d-style field.
// max_queue bounds buffered frames; push blocks when full (backpressure).
void* spt_frame_writer_create(const char* pattern, int w, int h, int binary,
                              int max_queue) {
  if (!pattern || w <= 0 || h <= 0) return nullptr;
  auto* fw = new FrameWriter();
  fw->pattern = pattern;
  fw->w = w;
  fw->h = h;
  fw->binary = binary;
  fw->max_queue = max_queue > 0 ? static_cast<size_t>(max_queue) : 4;
  fw->worker = std::thread([fw] { fw->run(); });
  return fw;
}

// Enqueue a frame (copies the pixel data; blocks if the queue is full).
// Returns 0 on success.
int spt_frame_writer_push(void* handle, const float* img, int frame_idx) {
  auto* fw = static_cast<FrameWriter*>(handle);
  if (!fw) return 1;
  Frame frame;
  frame.index = frame_idx;
  const size_t n = 3u * static_cast<size_t>(fw->w) * static_cast<size_t>(fw->h);
  frame.pixels.assign(img, img + n);
  {
    std::unique_lock<std::mutex> lk(fw->mu);
    fw->cv_push.wait(lk, [&] { return fw->shutdown || fw->queue.size() < fw->max_queue; });
    if (fw->shutdown) return 2;
    fw->queue.push_back(std::move(frame));
  }
  fw->cv_pop.notify_one();
  return 0;
}

// Frames still queued (not yet written).
int spt_frame_writer_pending(void* handle) {
  auto* fw = static_cast<FrameWriter*>(handle);
  if (!fw) return -1;
  std::lock_guard<std::mutex> lk(fw->mu);
  return static_cast<int>(fw->queue.size());
}

// Cumulative write errors.
int spt_frame_writer_errors(void* handle) {
  auto* fw = static_cast<FrameWriter*>(handle);
  return fw ? fw->errors.load() : -1;
}

// Drain the queue, join the worker, free the handle.
void spt_frame_writer_destroy(void* handle) {
  auto* fw = static_cast<FrameWriter*>(handle);
  if (!fw) return;
  {
    std::lock_guard<std::mutex> lk(fw->mu);
    fw->shutdown = true;
  }
  fw->cv_pop.notify_all();
  fw->cv_push.notify_all();
  fw->worker.join();
  delete fw;
}

}  // extern "C"
