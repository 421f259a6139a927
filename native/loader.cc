// Native dataset loader for amos-slam-tpu.
//
// The reference's host-side runtime is C++ (dataset mains decode PNGs with
// OpenCV and feed the tracker, Examples/RGB-D/rgbd_tum.cc). This is the
// TPU-framework equivalent: a small C++ runtime that decodes TUM-style PNGs
// (8-bit gray / 8-bit RGB / 16-bit depth), converts them straight into the
// float32 layouts the device wants (grayscale luma, metric depth), and
// prefetches ahead of the tracker with a worker thread pool. Exposed to
// Python via a plain C ABI (ctypes) -- no pybind11 dependency.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC loader.cc -lz -lpthread)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ----------------------------------------------------------------- PNG ----
struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;     // 1 or 3
  int bit_depth = 0;    // 8 or 16
  std::vector<uint16_t> pixels;  // row-major, channel-interleaved
  bool ok = false;
  std::string error;
};

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

Image decode_png(const uint8_t* data, size_t size) {
  Image img;
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (size < 8 || memcmp(data, magic, 8) != 0) {
    img.error = "not a png";
    return img;
  }
  size_t pos = 8;
  std::vector<uint8_t> idat;
  int color_type = -1, interlace = 0;
  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    const char* type = reinterpret_cast<const char*>(data + pos + 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) break;
    if (memcmp(type, "IHDR", 4) == 0) {
      img.width = int(be32(body));
      img.height = int(be32(body + 4));
      img.bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (interlace != 0) {
    img.error = "interlaced png unsupported";
    return img;
  }
  switch (color_type) {
    case 0: img.channels = 1; break;  // gray
    case 2: img.channels = 3; break;  // rgb
    case 4: img.channels = 2; break;  // gray+alpha
    case 6: img.channels = 4; break;  // rgba
    default:
      img.error = "palette png unsupported";
      return img;
  }
  if (img.bit_depth != 8 && img.bit_depth != 16) {
    img.error = "bit depth unsupported";
    return img;
  }

  const int bypp = img.channels * img.bit_depth / 8;  // bytes per pixel
  const size_t stride = size_t(img.width) * bypp;
  std::vector<uint8_t> raw((stride + 1) * img.height);
  uLongf out_len = raw.size();
  if (uncompress(raw.data(), &out_len, idat.data(), idat.size()) != Z_OK ||
      out_len != raw.size()) {
    img.error = "zlib inflate failed";
    return img;
  }

  // de-filter scanlines in place
  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> line(stride);
  const int in_ch = img.channels;
  const int keep_ch = (in_ch == 2) ? 1 : (in_ch == 4 ? 3 : in_ch);
  img.pixels.resize(size_t(img.width) * img.height * keep_ch);

  for (int y = 0; y < img.height; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    memcpy(line.data(), src + 1, stride);
    for (size_t i = 0; i < stride; ++i) {
      int a = (i >= size_t(bypp)) ? line[i - bypp] : 0;
      int b = prev[i];
      int c = (i >= size_t(bypp)) ? prev[i - bypp] : 0;
      int x = line[i];
      switch (filter) {
        case 0: break;
        case 1: x += a; break;
        case 2: x += b; break;
        case 3: x += (a + b) / 2; break;
        case 4: x += paeth(a, b, c); break;
        default: img.error = "bad filter"; return img;
      }
      line[i] = uint8_t(x);
    }
    prev = line;
    // emit pixels (dropping alpha), widening to uint16
    uint16_t* dst = img.pixels.data() + size_t(y) * img.width * keep_ch;
    if (img.bit_depth == 8) {
      for (int xpx = 0; xpx < img.width; ++xpx)
        for (int ch = 0; ch < keep_ch; ++ch)
          dst[xpx * keep_ch + ch] = line[xpx * in_ch + ch];
    } else {
      for (int xpx = 0; xpx < img.width; ++xpx)
        for (int ch = 0; ch < keep_ch; ++ch) {
          size_t o = (size_t(xpx) * in_ch + ch) * 2;
          dst[xpx * keep_ch + ch] = uint16_t((line[o] << 8) | line[o + 1]);
        }
    }
  }
  img.channels = keep_ch;
  img.ok = true;
  return img;
}

Image load_png_file(const std::string& path) {
  Image img;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    img.error = "open failed: " + path;
    return img;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (got != buf.size()) {
    img.error = "short read";
    return img;
  }
  return decode_png(buf.data(), buf.size());
}

// ------------------------------------------------------------ prefetcher --
struct Frame {
  std::vector<float> gray;   // H*W luma
  std::vector<float> depth;  // H*W metres (empty if no depth path)
  std::vector<uint8_t> rgb;  // H*W*3 (empty if source was grayscale)
  int width = 0, height = 0;
  bool ok = false;
};

struct Prefetcher {
  std::vector<std::pair<std::string, std::string>> items;  // rgb, depth paths
  float depth_factor = 5000.0f;
  size_t ahead = 8;
  std::unordered_map<size_t, std::shared_ptr<Frame>> ready;
  std::deque<size_t> queue;
  std::mutex mu;
  std::condition_variable cv_ready, cv_work;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  size_t next_submit = 0;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop) return;
        idx = queue.front();
        queue.pop_front();
      }
      auto fr = std::make_shared<Frame>();
      Image rgb = load_png_file(items[idx].first);
      if (rgb.ok) {
        fr->width = rgb.width;
        fr->height = rgb.height;
        size_t n = size_t(rgb.width) * rgb.height;
        fr->gray.resize(n);
        if (rgb.channels == 3) {
          fr->rgb.resize(n * 3);
          for (size_t i = 0; i < n; ++i) {
            float r = rgb.pixels[i * 3], g = rgb.pixels[i * 3 + 1],
                  b = rgb.pixels[i * 3 + 2];
            fr->gray[i] = 0.299f * r + 0.587f * g + 0.114f * b;
            fr->rgb[i * 3] = uint8_t(r);
            fr->rgb[i * 3 + 1] = uint8_t(g);
            fr->rgb[i * 3 + 2] = uint8_t(b);
          }
        } else {
          for (size_t i = 0; i < n; ++i) fr->gray[i] = float(rgb.pixels[i]);
        }
        fr->ok = true;
        if (!items[idx].second.empty()) {
          Image dep = load_png_file(items[idx].second);
          if (dep.ok && dep.channels == 1) {
            size_t nd = size_t(dep.width) * dep.height;
            fr->depth.resize(nd);
            float inv = 1.0f / depth_factor;
            for (size_t i = 0; i < nd; ++i)
              fr->depth[i] = float(dep.pixels[i]) * inv;
          } else {
            fr->ok = false;
          }
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ready[idx] = fr;
      }
      cv_ready.notify_all();
    }
  }

  void ensure_submitted(size_t upto) {
    std::lock_guard<std::mutex> lk(mu);
    while (next_submit < items.size() && next_submit <= upto + ahead) {
      queue.push_back(next_submit++);
    }
    cv_work.notify_all();
  }

  std::shared_ptr<Frame> get(size_t idx) {
    ensure_submitted(idx);
    std::unique_lock<std::mutex> lk(mu);
    cv_ready.wait(lk, [&] { return ready.count(idx) > 0; });
    auto fr = ready[idx];
    ready.erase(idx);
    return fr;
  }
};

std::mutex g_mu;
std::unordered_map<int64_t, std::unique_ptr<Prefetcher>> g_loaders;
std::unordered_map<int64_t, std::shared_ptr<Frame>> g_frames;
int64_t g_next_id = 1;

}  // namespace

extern "C" {

// ---- one-shot decode ----
// Returns handle (>0) or 0 on failure. Query with frame_* getters.
int64_t asl_decode_png(const char* path, float depth_factor, int is_depth) {
  Image img = load_png_file(path);
  if (!img.ok) return 0;
  auto fr = std::make_shared<Frame>();
  fr->width = img.width;
  fr->height = img.height;
  size_t n = size_t(img.width) * img.height;
  if (is_depth) {
    fr->depth.resize(n);
    float inv = 1.0f / depth_factor;
    for (size_t i = 0; i < n; ++i) fr->depth[i] = float(img.pixels[i]) * inv;
  } else if (img.channels == 3) {
    fr->gray.resize(n);
    fr->rgb.resize(n * 3);
    for (size_t i = 0; i < n; ++i) {
      float r = img.pixels[i * 3], g = img.pixels[i * 3 + 1],
            b = img.pixels[i * 3 + 2];
      fr->gray[i] = 0.299f * r + 0.587f * g + 0.114f * b;
      fr->rgb[i * 3] = uint8_t(r);
      fr->rgb[i * 3 + 1] = uint8_t(g);
      fr->rgb[i * 3 + 2] = uint8_t(b);
    }
  } else {
    fr->gray.resize(n);
    for (size_t i = 0; i < n; ++i) fr->gray[i] = float(img.pixels[i]);
  }
  fr->ok = true;
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t id = g_next_id++;
  g_frames[id] = fr;
  return id;
}

// ---- prefetching loader ----
int64_t asl_loader_create(float depth_factor, int n_workers, int ahead) {
  auto p = std::make_unique<Prefetcher>();
  p->depth_factor = depth_factor;
  p->ahead = size_t(ahead);
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t id = g_next_id++;
  g_loaders[id] = std::move(p);
  g_loaders[id]->workers.reserve(n_workers);
  for (int i = 0; i < n_workers; ++i)
    g_loaders[id]->workers.emplace_back(&Prefetcher::worker,
                                        g_loaders[id].get());
  return id;
}

void asl_loader_add(int64_t loader, const char* rgb_path,
                    const char* depth_path) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_loaders.find(loader);
  if (it == g_loaders.end()) return;
  it->second->items.emplace_back(rgb_path,
                                 depth_path ? depth_path : "");
}

int64_t asl_loader_get(int64_t loader, int64_t index) {
  Prefetcher* p;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_loaders.find(loader);
    if (it == g_loaders.end()) return 0;
    p = it->second.get();
    if (size_t(index) >= p->items.size()) return 0;
  }
  auto fr = p->get(size_t(index));
  if (!fr || !fr->ok) return 0;
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t id = g_next_id++;
  g_frames[id] = fr;
  return id;
}

void asl_loader_destroy(int64_t loader) {
  std::unique_ptr<Prefetcher> p;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_loaders.find(loader);
    if (it == g_loaders.end()) return;
    p = std::move(it->second);
    g_loaders.erase(it);
  }
  p->stop = true;
  p->cv_work.notify_all();
  for (auto& t : p->workers) t.join();
}

// ---- frame accessors ----
int asl_frame_width(int64_t f) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  return it == g_frames.end() ? 0 : it->second->width;
}
int asl_frame_height(int64_t f) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  return it == g_frames.end() ? 0 : it->second->height;
}
int asl_frame_has_depth(int64_t f) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  return it != g_frames.end() && !it->second->depth.empty();
}
int asl_frame_has_rgb(int64_t f) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  return it != g_frames.end() && !it->second->rgb.empty();
}
void asl_frame_copy_gray(int64_t f, float* out) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  if (it != g_frames.end())
    memcpy(out, it->second->gray.data(),
           it->second->gray.size() * sizeof(float));
}
void asl_frame_copy_depth(int64_t f, float* out) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  if (it != g_frames.end() && !it->second->depth.empty())
    memcpy(out, it->second->depth.data(),
           it->second->depth.size() * sizeof(float));
}
void asl_frame_copy_rgb(int64_t f, uint8_t* out) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_frames.find(f);
  if (it != g_frames.end() && !it->second->rgb.empty())
    memcpy(out, it->second->rgb.data(), it->second->rgb.size());
}
void asl_frame_release(int64_t f) {
  std::lock_guard<std::mutex> lk(g_mu);
  g_frames.erase(f);
}

}  // extern "C"
