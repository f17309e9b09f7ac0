// Native KITTI-sequence loader with threaded prefetch.
//
// The reference's driver does all file IO synchronously on the tracking
// thread (Examples/RGB-D/rgbd_tum.cc:115-189: imread + readOpticalFlow +
// LoadMask per frame).  Here decode happens on worker threads ahead of the
// consumer so the accelerator never waits on the filesystem: a ctypes-bound
// C API hands zero-copy frame buffers to Python (io/native_loader.py).
//
// Formats handled natively: 8-bit RGB / 16-bit gray PNG (libpng), the
// Middlebury .flo layout (src/flow/flowIO.cpp semantics) and the
// whitespace-int semantic masks with the driver's `tmp!=0 && tmp<4` label
// clamp (rgbd_tum.cc:335).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  int H = 0, W = 0;
  std::vector<float> gray;       // H*W, 0..255
  std::vector<float> depth_raw;  // H*W raw png values (disparity*256)
  std::vector<float> flow;       // H*W*2
  std::vector<int32_t> sem;      // H*W
  bool ok = false;
};

bool read_png(const std::string& path, int& H, int& W, int& channels,
              int& bit_depth, std::vector<uint16_t>& out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  W = png_get_image_width(png, info);
  H = png_get_image_height(png, info);
  bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (bit_depth == 16) png_set_swap(png);  // little-endian reads
  if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> raw(rowbytes * H);
  std::vector<png_bytep> rows(H);
  for (int y = 0; y < H; ++y) rows[y] = raw.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  out.resize(size_t(H) * W * channels);
  if (bit_depth == 16) {
    memcpy(out.data(), raw.data(), out.size() * 2);
  } else {
    for (size_t i = 0; i < out.size(); ++i) out[i] = raw[i];
  }
  return true;
}

bool load_gray(const std::string& path, int& H, int& W, std::vector<float>& g) {
  int c = 0, bd = 0;
  std::vector<uint16_t> px;
  if (!read_png(path, H, W, c, bd, px)) return false;
  g.resize(size_t(H) * W);
  if (c >= 3) {
    for (size_t i = 0; i < g.size(); ++i) {
      // OpenCV RGB2GRAY weights, matching the python loader
      g[i] = 0.299f * px[i * c] + 0.587f * px[i * c + 1] + 0.114f * px[i * c + 2];
    }
  } else {
    for (size_t i = 0; i < g.size(); ++i) g[i] = float(px[i * c]);
  }
  return true;
}

bool load_depth(const std::string& path, int& H, int& W, std::vector<float>& d) {
  int c = 0, bd = 0;
  std::vector<uint16_t> px;
  if (!read_png(path, H, W, c, bd, px)) return false;
  d.resize(size_t(H) * W);
  for (size_t i = 0; i < d.size(); ++i) d[i] = float(px[i * c]);
  return true;
}

bool load_flo(const std::string& path, int H, int W, std::vector<float>& fl) {
  FILE* f = fopen(path.c_str(), "rb");
  fl.assign(size_t(H) * W * 2, 0.f);
  if (!f) return true;  // missing flow (last frame) -> zeros, like the driver
  float magic = 0;
  int w = 0, h = 0;
  if (fread(&magic, 4, 1, f) != 1 || magic < 202021.0f || magic > 202022.0f ||
      fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1 || w != W || h != H) {
    fclose(f);
    return false;
  }
  size_t n = size_t(H) * W * 2;
  bool ok = fread(fl.data(), 4, n, f) == n;
  fclose(f);
  return ok;
}

bool load_mask(const std::string& path, int H, int W, std::vector<int32_t>& m,
               int max_label) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(sz + 1);
  if (fread(buf.data(), 1, sz, f) != size_t(sz)) {
    fclose(f);
    return false;
  }
  fclose(f);
  buf[sz] = 0;
  m.assign(size_t(H) * W, 0);
  const char* p = buf.data();
  size_t count = 0, total = size_t(H) * W;
  while (count < total && *p) {
    while (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t') ++p;
    if (!*p) break;
    bool neg = (*p == '-');
    if (neg) ++p;
    long v = 0;
    while (*p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    if (neg) v = -v;
    if (v != 0 && v > 0 && v < max_label) m[count] = int32_t(v);
    ++count;
  }
  return count == total;
}

struct Loader {
  std::string root;
  int n_frames = 0, H = 0, W = 0, max_label = 4;
  int cache_cap = 8;
  std::map<int, Frame> cache;
  std::deque<int> order;           // insertion order for eviction
  std::deque<int> queue;           // indices awaiting decode
  std::mutex mu;
  std::condition_variable cv_ready, cv_work;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  std::string path(const char* sub, int i, const char* ext) const {
    char b[64];
    snprintf(b, sizeof b, "%s/%06d.%s", sub, i, ext);
    return root + "/" + b;
  }

  void decode_into(int idx, Frame& fr) const {
    int h = 0, w = 0;
    fr.ok = load_gray(path("image", idx, "png"), h, w, fr.gray);
    fr.H = h;
    fr.W = w;
    if (fr.ok) fr.ok = load_depth(path("depth", idx, "png"), h, w, fr.depth_raw);
    if (fr.ok) fr.ok = load_flo(path("flow", idx, "flo"), fr.H, fr.W, fr.flow);
    if (fr.ok) fr.ok = load_mask(path("semantic", idx, "txt"), fr.H, fr.W, fr.sem,
                                 max_label);
  }

  void worker() {
    while (true) {
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop) return;
        idx = queue.front();
        queue.pop_front();
        if (cache.count(idx)) continue;
      }
      Frame fr;
      decode_into(idx, fr);
      {
        std::unique_lock<std::mutex> lk(mu);
        cache.emplace(idx, std::move(fr));
        order.push_back(idx);
        while ((int)order.size() > cache_cap) {
          cache.erase(order.front());
          order.pop_front();
        }
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* mmt_open(const char* root, int n_frames, int max_label, int n_threads,
               int cache_cap) {
  auto* L = new Loader();
  L->root = root;
  L->n_frames = n_frames;
  L->max_label = max_label;
  L->cache_cap = cache_cap > 0 ? cache_cap : 8;
  // probe frame 0 for dimensions
  Frame probe;
  L->decode_into(0, probe);
  if (!probe.ok) {
    delete L;
    return nullptr;
  }
  L->H = probe.H;
  L->W = probe.W;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cache.emplace(0, std::move(probe));
    L->order.push_back(0);
  }
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

void mmt_dims(void* h, int* H, int* W) {
  auto* L = (Loader*)h;
  *H = L->H;
  *W = L->W;
}

void mmt_prefetch(void* h, int idx, int depth) {
  auto* L = (Loader*)h;
  std::unique_lock<std::mutex> lk(L->mu);
  for (int i = idx; i < idx + depth && i < L->n_frames; ++i)
    if (!L->cache.count(i)) L->queue.push_back(i);
  L->cv_work.notify_all();
}

// Blocks until frame idx is decoded; copies into caller buffers.
// Returns 1 on success, 0 on decode failure.
int mmt_get(void* h, int idx, float* gray, float* depth_raw, float* flow,
            int32_t* sem) {
  auto* L = (Loader*)h;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    if (!L->cache.count(idx)) {
      L->queue.push_front(idx);
      L->cv_work.notify_all();
      L->cv_ready.wait(lk, [&] { return L->cache.count(idx) > 0; });
    }
    Frame& fr = L->cache[idx];
    if (!fr.ok) return 0;
    size_t n = size_t(L->H) * L->W;
    memcpy(gray, fr.gray.data(), n * 4);
    memcpy(depth_raw, fr.depth_raw.data(), n * 4);
    memcpy(flow, fr.flow.data(), n * 8);
    memcpy(sem, fr.sem.data(), n * 4);
  }
  return 1;
}

void mmt_close(void* h) {
  auto* L = (Loader*)h;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_work.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
