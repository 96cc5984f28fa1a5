// Threaded RGB-D frame prefetcher: the data-loader runtime.
//
// Plays the role of the reference's OpenNIDevice frame pump
// (openni_device.cpp:96-156: blocking readFrame + H2D copy per stream).
// Here N worker threads decode (depth PNG, rgb PNG) pairs ahead of the
// consumer into a bounded in-order queue, so PNG inflate runs concurrently
// with the TPU step instead of serializing with it. Depth is rescaled to
// millimeters natively (TUM stores 5000 units/m; openni used
// PIXEL_FORMAT_DEPTH_1_MM).
//
// C ABI, consumed via ctypes from octree_slam_tpu/io/native.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
struct OslamImage;
OslamImage* oslam_image_load(const char* path);
uint32_t oslam_image_width(const OslamImage*);
uint32_t oslam_image_height(const OslamImage*);
uint32_t oslam_image_channels(const OslamImage*);
uint32_t oslam_image_bit_depth(const OslamImage*);
const uint8_t* oslam_image_data(const OslamImage*);
void oslam_image_free(OslamImage*);
}

namespace {

struct DecodedFrame {
  std::vector<uint16_t> depth_mm;  // H*W
  std::vector<uint8_t> rgb;        // H*W*3
  int status = 0;                  // 0 ok, <0 decode/shape error
};

struct Prefetcher {
  std::vector<std::string> depth_paths;
  std::vector<std::string> rgb_paths;
  uint32_t width = 0, height = 0;
  double depth_to_mm = 1.0;
  size_t capacity = 8;

  std::mutex mu;
  std::condition_variable cv_space;  // workers wait for queue space
  std::condition_variable cv_ready;  // consumer waits for next frame
  std::map<size_t, DecodedFrame> ready;
  std::atomic<size_t> next_to_decode{0};
  size_t next_to_consume = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers) t.join();
  }

  DecodedFrame decode(size_t i) const {
    DecodedFrame f;
    f.depth_mm.assign(static_cast<size_t>(width) * height, 0);
    f.rgb.assign(static_cast<size_t>(width) * height * 3, 0);

    OslamImage* d = oslam_image_load(depth_paths[i].c_str());
    if (!d) { f.status = -1; return f; }
    if (oslam_image_width(d) != width || oslam_image_height(d) != height ||
        oslam_image_channels(d) != 1) {
      oslam_image_free(d);
      f.status = -2;
      return f;
    }
    const size_t n = static_cast<size_t>(width) * height;
    if (oslam_image_bit_depth(d) == 16) {
      const uint16_t* src =
          reinterpret_cast<const uint16_t*>(oslam_image_data(d));
      for (size_t k = 0; k < n; ++k) {
        double mm = src[k] * depth_to_mm;
        f.depth_mm[k] = mm >= 65535.0 ? 65535 : static_cast<uint16_t>(mm);
      }
    } else {
      const uint8_t* src = oslam_image_data(d);
      for (size_t k = 0; k < n; ++k) {
        double mm = src[k] * depth_to_mm;
        f.depth_mm[k] = mm >= 65535.0 ? 65535 : static_cast<uint16_t>(mm);
      }
    }
    oslam_image_free(d);

    OslamImage* c = oslam_image_load(rgb_paths[i].c_str());
    if (!c) { f.status = -3; return f; }
    if (oslam_image_width(c) != width || oslam_image_height(c) != height ||
        oslam_image_bit_depth(c) != 8) {
      oslam_image_free(c);
      f.status = -4;
      return f;
    }
    if (oslam_image_channels(c) == 3) {
      std::memcpy(f.rgb.data(), oslam_image_data(c), n * 3);
    } else if (oslam_image_channels(c) == 1) {
      const uint8_t* src = oslam_image_data(c);
      for (size_t k = 0; k < n; ++k)
        f.rgb[3 * k] = f.rgb[3 * k + 1] = f.rgb[3 * k + 2] = src[k];
    } else {
      f.status = -5;
    }
    oslam_image_free(c);
    return f;
  }

  void worker() {
    for (;;) {
      size_t i = next_to_decode.fetch_add(1);
      if (i >= depth_paths.size()) return;
      DecodedFrame f = decode(i);
      std::unique_lock<std::mutex> lk(mu);
      // Bounded queue: never run more than `capacity` frames ahead of the
      // consumer (frames are ~1.2 MB decoded; unbounded readahead of a long
      // sequence would exhaust host RAM).
      cv_space.wait(lk, [&] {
        return stop || i < next_to_consume + capacity;
      });
      if (stop) return;
      ready.emplace(i, std::move(f));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// paths are '\n'-joined lists. Returns nullptr on bad args.
Prefetcher* oslam_prefetch_create(const char* depth_paths,
                                  const char* rgb_paths, uint32_t width,
                                  uint32_t height, double depth_to_mm,
                                  uint32_t n_threads, uint32_t capacity) {
  auto split = [](const char* s) {
    std::vector<std::string> out;
    const char* p = s;
    while (*p) {
      const char* nl = strchr(p, '\n');
      if (!nl) { out.emplace_back(p); break; }
      out.emplace_back(p, nl - p);
      p = nl + 1;
    }
    return out;
  };
  auto* pf = new Prefetcher();
  pf->depth_paths = split(depth_paths);
  pf->rgb_paths = split(rgb_paths);
  if (pf->depth_paths.size() != pf->rgb_paths.size() ||
      pf->depth_paths.empty() || width == 0 || height == 0) {
    delete pf;
    return nullptr;
  }
  pf->width = width;
  pf->height = height;
  pf->depth_to_mm = depth_to_mm;
  pf->capacity = capacity ? capacity : 8;
  uint32_t nt = n_threads ? n_threads : 2;
  for (uint32_t t = 0; t < nt; ++t)
    pf->workers.emplace_back([pf] { pf->worker(); });
  return pf;
}

size_t oslam_prefetch_len(const Prefetcher* pf) {
  return pf->depth_paths.size();
}

// Blocks until the next in-order frame is decoded, copies it into the
// caller's buffers (depth: H*W uint16 mm; rgb: H*W*3 uint8), and returns
// the frame's decode status (0 ok). Returns 1 when the stream is exhausted.
int oslam_prefetch_next(Prefetcher* pf, uint16_t* depth_out,
                        uint8_t* rgb_out) {
  std::unique_lock<std::mutex> lk(pf->mu);
  if (pf->next_to_consume >= pf->depth_paths.size()) return 1;
  size_t want = pf->next_to_consume;
  pf->cv_ready.wait(lk, [&] { return pf->stop || pf->ready.count(want); });
  if (pf->stop) return -100;
  DecodedFrame f = std::move(pf->ready[want]);
  pf->ready.erase(want);
  pf->next_to_consume = want + 1;
  pf->cv_space.notify_all();
  lk.unlock();
  std::memcpy(depth_out, f.depth_mm.data(),
              f.depth_mm.size() * sizeof(uint16_t));
  std::memcpy(rgb_out, f.rgb.data(), f.rgb.size());
  return f.status;
}

void oslam_prefetch_destroy(Prefetcher* pf) { delete pf; }

}  // extern "C"
