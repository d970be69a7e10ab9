// frameio: native frame output runtime for the TPU raytracer.
//
// The reference's presentation path is native C++ (CUDA–GL interop PBO +
// glTexSubImage2D + GLUT swap, main.cpp:103-226). A TPU host has no GL
// swapchain; the equivalent runtime concern is getting rendered frames OFF
// the hot loop fast: encode + write on a background thread with a bounded
// ring of reusable buffers, so the Python render loop never blocks on disk.
//
// Provides, via a C ABI (consumed through ctypes — no pybind11 in image):
//   fio_write_png    — dependency-free PNG encode (stored-deflate blocks:
//                      memcpy-speed, valid PNG, no zlib needed)
//   fio_writer_*     — async frame writer (ring buffer + worker thread)
//   fio_now_ns       — monotonic clock for frame pacing / FPS accounting
//
// Build: native/Makefile → libframeio.so. Loaded by
// raytracing_cuda_tpu/utils/frameio.py, which falls back to PIL when the
// library has not been built.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>       // clock_gettime — do not rely on transitive includes
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC-32 (PNG chunk checksums) and Adler-32 (zlib stream checksum)
// ---------------------------------------------------------------------------

uint32_t crc_table[256];
std::once_flag crc_once;

void init_crc() {
  for (uint32_t n = 0; n < 256; n++) {
    uint32_t c = n;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[n] = c;
  }
}

uint32_t crc32(uint32_t crc, const uint8_t* buf, size_t len) {
  std::call_once(crc_once, init_crc);
  crc ^= 0xFFFFFFFFu;
  for (size_t i = 0; i < len; i++)
    crc = crc_table[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t adler32(const uint8_t* buf, size_t len) {
  uint32_t a = 1, b = 0;
  while (len > 0) {
    size_t n = len < 5552 ? len : 5552;  // avoid overflow before mod
    len -= n;
    while (n--) {
      a += *buf++;
      b += a;
    }
    a %= 65521;
    b %= 65521;
  }
  return (b << 16) | a;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24);
  v.push_back(x >> 16);
  v.push_back(x >> 8);
  v.push_back(x);
}

void chunk(std::vector<uint8_t>& out, const char type[4],
           const uint8_t* data, size_t len) {
  put_be32(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), data, data + len);
  put_be32(out, crc32(0, out.data() + start, len + 4));
}

// Encode RGB8 rows into a PNG using stored (uncompressed) deflate blocks.
// ~memcpy speed; files are w*h*3 + ~2% — the right trade for frame dumps.
void encode_png(std::vector<uint8_t>& out, const uint8_t* rgb, int w, int h) {
  static const uint8_t sig[8] = {137, 'P', 'N', 'G', '\r', '\n', 26, '\n'};
  out.insert(out.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  chunk(out, "IHDR", ihdr, 13);

  // raw scanline stream: filter byte 0 + row
  const size_t stride = (size_t)w * 3;
  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * h);
  for (int y = 0; y < h; y++) {
    raw.push_back(0);
    raw.insert(raw.end(), rgb + y * stride, rgb + (y + 1) * stride);
  }

  // zlib wrapper + stored deflate blocks (max 65535 bytes each)
  std::vector<uint8_t> z;
  z.reserve(raw.size() + raw.size() / 65535 * 5 + 16);
  z.push_back(0x78);
  z.push_back(0x01);
  size_t off = 0;
  while (off < raw.size()) {
    size_t n = raw.size() - off;
    if (n > 65535) n = 65535;
    bool last = off + n == raw.size();
    z.push_back(last ? 1 : 0);
    z.push_back(n & 0xFF);
    z.push_back(n >> 8);
    z.push_back(~n & 0xFF);
    z.push_back((~n >> 8) & 0xFF);
    z.insert(z.end(), raw.data() + off, raw.data() + off + n);
    off += n;
  }
  put_be32(z, adler32(raw.data(), raw.size()));
  chunk(out, "IDAT", z.data(), z.size());
  chunk(out, "IEND", nullptr, 0);
}

// ---------------------------------------------------------------------------
// async frame writer
// ---------------------------------------------------------------------------

struct Frame {
  std::string path;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  bool full = false;
};

struct Writer {
  std::vector<Frame> ring;
  size_t head = 0, tail = 0, count = 0;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<long> written{0};
  std::atomic<long> failed{0};
  int inflight = 0;   // frames popped from the ring but not yet on disk

  explicit Writer(int capacity) : ring(capacity) {
    worker = std::thread([this] { run(); });
  }

  void run() {
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_get.wait(lk, [this] { return count > 0 || stop.load(); });
        if (count == 0 && stop.load()) return;
        f = std::move(ring[tail]);
        ring[tail].full = false;
        tail = (tail + 1) % ring.size();
        count--;
        inflight++;
        cv_put.notify_one();
      }
      std::vector<uint8_t> png;
      png.reserve((size_t)f.w * f.h * 3 + 1024);
      encode_png(png, f.rgb.data(), f.w, f.h);
      FILE* fp = std::fopen(f.path.c_str(), "wb");
      if (fp) {
        size_t n = std::fwrite(png.data(), 1, png.size(), fp);
        if (std::fclose(fp) == 0 && n == png.size()) {
          written.fetch_add(1);
        } else {
          failed.fetch_add(1);   // disk full / IO error mid-write
        }
      } else {
        failed.fetch_add(1);     // unwritable path: surfaced via fio_writer_failed
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        inflight--;
        cv_put.notify_all();   // drain() waits on count==0 && inflight==0
      }
    }
  }

  void submit(const char* path, const uint8_t* rgb, int w, int h) {
    std::unique_lock<std::mutex> lk(mu);
    cv_put.wait(lk, [this] { return count < ring.size(); });
    Frame& f = ring[head];
    f.path = path;
    f.w = w;
    f.h = h;
    f.rgb.assign(rgb, rgb + (size_t)w * h * 3);
    f.full = true;
    head = (head + 1) % ring.size();
    count++;
    cv_get.notify_one();
  }

  void drain() {
    std::unique_lock<std::mutex> lk(mu);
    cv_put.wait(lk, [this] { return count == 0 && inflight == 0; });
  }

  ~Writer() {
    drain();
    stop.store(true);
    cv_get.notify_one();
    worker.join();
  }
};

}  // namespace

extern "C" {

int fio_write_png(const char* path, const uint8_t* rgb, int w, int h) {
  std::vector<uint8_t> png;
  png.reserve((size_t)w * h * 3 + 1024);
  encode_png(png, rgb, w, h);
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -1;
  size_t n = std::fwrite(png.data(), 1, png.size(), fp);
  std::fclose(fp);
  return n == png.size() ? 0 : -2;
}

// Encode into a caller-readable buffer; returns encoded size (≤ cap) or -1.
long fio_encode_png(const uint8_t* rgb, int w, int h, uint8_t* out, long cap) {
  std::vector<uint8_t> png;
  png.reserve((size_t)w * h * 3 + 1024);
  encode_png(png, rgb, w, h);
  if ((long)png.size() > cap) return -1;
  std::memcpy(out, png.data(), png.size());
  return (long)png.size();
}

void* fio_writer_create(int ring_capacity) {
  return new Writer(ring_capacity > 0 ? ring_capacity : 4);
}

void fio_writer_submit(void* wr, const char* path, const uint8_t* rgb,
                       int w, int h) {
  static_cast<Writer*>(wr)->submit(path, rgb, w, h);
}

long fio_writer_written(void* wr) {
  return static_cast<Writer*>(wr)->written.load();
}

long fio_writer_failed(void* wr) {
  return static_cast<Writer*>(wr)->failed.load();
}

void fio_writer_drain(void* wr) { static_cast<Writer*>(wr)->drain(); }

void fio_writer_destroy(void* wr) { delete static_cast<Writer*>(wr); }

long long fio_now_ns() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (long long)ts.tv_sec * 1000000000LL + ts.tv_nsec;
}

}  // extern "C"
