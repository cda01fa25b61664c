// Native runtime components for pointcloud_segmentation_tpu.
//
// The reference implements its runtime in C++ (ROS node, PCL filters, Hough
// submodule).  The TPU rebuild keeps the *compute* on the XLA path, and
// implements the host runtime's hot pieces natively, exposed through a plain
// C ABI consumed via ctypes (no pybind11 in this image):
//
//   * a latest-wins depth-1 frame mailbox (mutex + condvar, drop counting) —
//     the reference node's SharedData producer/consumer design
//     (pointcloud_segmentation_node.cpp:36-39, 167-173, 268-276), GIL-free;
//   * a binary frame-log codec (the replay "data loader"): timestamped
//     poses + float32 clouds with a simple length-prefixed layout.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libpcs_runtime.so pcs_runtime.cpp -lpthread
// (driven by pointcloud_segmentation_tpu/native/build.py at import time).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- mailbox

struct PcsMailbox {
  std::mutex mu;
  std::condition_variable cv;
  std::vector<uint8_t> buf;   // latest frame payload
  uint64_t seq = 0;           // bumped on every put
  uint64_t dropped = 0;       // puts that overwrote an unconsumed frame
  bool fresh = false;
  bool closed = false;
};

PcsMailbox* pcs_mailbox_create() { return new PcsMailbox(); }

void pcs_mailbox_destroy(PcsMailbox* m) { delete m; }

void pcs_mailbox_put(PcsMailbox* m, const uint8_t* data, uint64_t size) {
  {
    std::lock_guard<std::mutex> lock(m->mu);
    if (m->fresh) m->dropped++;
    m->buf.assign(data, data + size);
    m->fresh = true;
    m->seq++;
  }
  m->cv.notify_one();
}

// Blocks up to timeout_ms for a fresh frame.  Returns the payload size and
// copies min(size, cap) bytes into out; returns -1 on timeout/closed.
// Call with cap == 0 first to poll the size? Not needed: the caller passes a
// max-frame-size buffer (frames are bounded by the sensor resolution).
int64_t pcs_mailbox_take(PcsMailbox* m, uint8_t* out, uint64_t cap,
                         int64_t timeout_ms) {
  std::unique_lock<std::mutex> lock(m->mu);
  auto pred = [m] { return m->fresh || m->closed; };
  if (timeout_ms < 0) {
    m->cv.wait(lock, pred);
  } else if (!m->cv.wait_for(lock, std::chrono::milliseconds(timeout_ms), pred)) {
    return -1;
  }
  if (!m->fresh) return -1;  // closed with nothing pending
  m->fresh = false;
  uint64_t n = m->buf.size() < cap ? m->buf.size() : cap;
  std::memcpy(out, m->buf.data(), n);
  return static_cast<int64_t>(m->buf.size());
}

void pcs_mailbox_close(PcsMailbox* m) {
  {
    std::lock_guard<std::mutex> lock(m->mu);
    m->closed = true;
  }
  m->cv.notify_all();
}

uint64_t pcs_mailbox_dropped(PcsMailbox* m) {
  std::lock_guard<std::mutex> lock(m->mu);
  return m->dropped;
}

// ---------------------------------------------------------------- frame log
//
// Layout (little endian):
//   header: magic "PCSL" (4 bytes), uint32 version = 1
//   per frame:
//     double t
//     double pos[3]
//     double quat_wxyz[4]
//     uint32 n_points
//     float  points[n_points * 3]

static const char kMagic[4] = {'P', 'C', 'S', 'L'};

struct PcsLogWriter {
  FILE* f = nullptr;
  uint64_t frames = 0;
};

PcsLogWriter* pcs_log_open_write(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  uint32_t version = 1;
  std::fwrite(kMagic, 1, 4, f);
  std::fwrite(&version, sizeof(version), 1, f);
  auto* w = new PcsLogWriter();
  w->f = f;
  return w;
}

int pcs_log_write_frame(PcsLogWriter* w, double t, const double* pos,
                        const double* quat, const float* points,
                        uint32_t n_points) {
  if (!w || !w->f) return -1;
  if (std::fwrite(&t, sizeof(double), 1, w->f) != 1) return -1;
  if (std::fwrite(pos, sizeof(double), 3, w->f) != 3) return -1;
  if (std::fwrite(quat, sizeof(double), 4, w->f) != 4) return -1;
  if (std::fwrite(&n_points, sizeof(uint32_t), 1, w->f) != 1) return -1;
  uint64_t n = static_cast<uint64_t>(n_points) * 3;
  if (n && std::fwrite(points, sizeof(float), n, w->f) != n) return -1;
  w->frames++;
  return 0;
}

uint64_t pcs_log_close_write(PcsLogWriter* w) {
  if (!w) return 0;
  uint64_t frames = w->frames;
  if (w->f) std::fclose(w->f);
  delete w;
  return frames;
}

struct PcsLogReader {
  FILE* f = nullptr;
};

PcsLogReader* pcs_log_open_read(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char magic[4];
  uint32_t version = 0;
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, kMagic, 4) != 0 ||
      std::fread(&version, sizeof(version), 1, f) != 1 || version != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* r = new PcsLogReader();
  r->f = f;
  return r;
}

// Reads the next frame.  points_cap is the capacity of `points` in points
// (xyz triples).  Returns n_points (clipped points are skipped, full count
// returned), or -1 on EOF/error.
int64_t pcs_log_read_frame(PcsLogReader* r, double* t, double* pos,
                           double* quat, float* points, uint32_t points_cap) {
  if (!r || !r->f) return -1;
  if (std::fread(t, sizeof(double), 1, r->f) != 1) return -1;
  if (std::fread(pos, sizeof(double), 3, r->f) != 3) return -1;
  if (std::fread(quat, sizeof(double), 4, r->f) != 4) return -1;
  uint32_t n = 0;
  if (std::fread(&n, sizeof(uint32_t), 1, r->f) != 1) return -1;
  uint32_t take = n < points_cap ? n : points_cap;
  if (take &&
      std::fread(points, sizeof(float), uint64_t(take) * 3, r->f) !=
          uint64_t(take) * 3) {
    return -1;
  }
  if (n > take) {
    std::fseek(r->f, long(uint64_t(n - take) * 3 * sizeof(float)), SEEK_CUR);
  }
  return static_cast<int64_t>(n);
}

void pcs_log_close_read(PcsLogReader* r) {
  if (!r) return;
  if (r->f) std::fclose(r->f);
  delete r;
}

}  // extern "C"
