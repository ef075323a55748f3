// nerf_tpu native runtime: the host-side data path in C++.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the parts that
// belong on host CPUs, off the device critical path:
//   1. batch PNG decode (+ resize + RGBA->white compositing) — the native
//      equivalent of the reference's PIL loader (src/data/loader.py:40-64),
//      threaded across images;
//   2. a background ray-batch sampler: pre-assembles shuffled
//      (origin, direction, rgb) training batches from host-resident images
//      into double-buffered pinned-style buffers while the device trains —
//      the native producer for the reference's per-step randperm ray
//      selection (src/training/trainer.py:102-114);
//   3. tile assembly: stitch per-chip render tiles into a full frame (the
//      host-side image assembly for sharded rendering, SURVEY.md §7.4).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Build: `make -C nerf_tpu/runtime` (g++ + libpng + pthread only).

#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 1. PNG batch decode
// ---------------------------------------------------------------------------

// Decode one PNG to RGBA8. Returns 0 on success.
static int decode_png_rgba(const char* path, std::vector<uint8_t>* out,
                           uint32_t* w, uint32_t* h) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return 2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return 2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_GRAY ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->resize(size_t(*w) * *h * 4);
  std::vector<png_bytep> rows(*h);
  for (uint32_t y = 0; y < *h; y++) rows[y] = out->data() + size_t(y) * *w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Bilinear resize RGBA8 [sh, sw] -> float RGB [dh, dw] with white-background
// compositing (rgb*a + (1-a), reference loader.py:50-54) when white_bkgd.
static void resize_composite(const uint8_t* src, uint32_t sw, uint32_t sh,
                             float* dst, uint32_t dw, uint32_t dh,
                             int white_bkgd) {
  const float sx = dw > 1 ? float(sw - 1) / float(dw - 1) : 0.f;
  const float sy = dh > 1 ? float(sh - 1) / float(dh - 1) : 0.f;
  for (uint32_t y = 0; y < dh; y++) {
    float fy = y * sy;
    uint32_t y0 = (uint32_t)fy;
    uint32_t y1 = y0 + 1 < sh ? y0 + 1 : y0;
    float wy = fy - y0;
    for (uint32_t x = 0; x < dw; x++) {
      float fx = x * sx;
      uint32_t x0 = (uint32_t)fx;
      uint32_t x1 = x0 + 1 < sw ? x0 + 1 : x0;
      float wx = fx - x0;
      float px[4];
      for (int c = 0; c < 4; c++) {
        float v00 = src[(size_t(y0) * sw + x0) * 4 + c];
        float v01 = src[(size_t(y0) * sw + x1) * 4 + c];
        float v10 = src[(size_t(y1) * sw + x0) * 4 + c];
        float v11 = src[(size_t(y1) * sw + x1) * 4 + c];
        px[c] = ((v00 * (1 - wx) + v01 * wx) * (1 - wy) +
                 (v10 * (1 - wx) + v11 * wx) * wy) / 255.f;
      }
      float a = px[3];
      float* o = dst + (size_t(y) * dw + x) * 3;
      for (int c = 0; c < 3; c++)
        o[c] = white_bkgd ? px[c] * a + (1.f - a) : px[c];
    }
  }
}

// Decode n PNGs (newline-joined paths) into out [n, dh, dw, 3] float32.
// Threaded across images. Returns number of failures.
int nerf_decode_png_batch(const char* joined_paths, int n_paths,
                          float* out, uint32_t dw, uint32_t dh,
                          int white_bkgd, int n_threads) {
  std::vector<std::string> paths;
  {
    const char* p = joined_paths;
    for (int i = 0; i < n_paths; i++) {
      const char* e = strchr(p, '\n');
      if (!e) e = p + strlen(p);
      paths.emplace_back(p, e - p);
      p = (*e ? e + 1 : e);
    }
  }
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_paths) return;
      std::vector<uint8_t> rgba;
      uint32_t w = 0, h = 0;
      if (decode_png_rgba(paths[i].c_str(), &rgba, &w, &h) != 0) {
        failures.fetch_add(1);
        continue;
      }
      resize_composite(rgba.data(), w, h,
                       out + size_t(i) * dw * dh * 3, dw, dh, white_bkgd);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; t++) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return failures.load();
}

// ---------------------------------------------------------------------------
// 2. Background ray-batch sampler
// ---------------------------------------------------------------------------

struct RayBatch {
  std::vector<float> rays_o, rays_d, rgb;  // [n_rays,3] each
};

struct Sampler {
  // dataset (host-resident, borrowed pointers copied in)
  std::vector<float> images;  // [n, H, W, 3]
  std::vector<float> poses;   // [n, 4, 4] row-major camera-to-world
  uint32_t n_images, H, W;
  float focal;
  uint32_t n_rays;
  uint64_t rng;

  // double-buffered producer/consumer queue
  std::queue<RayBatch*> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<bool> stop{false};
  std::thread producer;
  size_t max_queue = 4;

  uint64_t next_rand() {  // xorshift64*
    rng ^= rng >> 12; rng ^= rng << 25; rng ^= rng >> 27;
    return rng * 0x2545F4914F6CDD1DULL;
  }

  void fill(RayBatch* b) {
    uint32_t img = (uint32_t)(next_rand() % n_images);
    const float* P = poses.data() + size_t(img) * 16;
    const float* I = images.data() + size_t(img) * H * W * 3;
    b->rays_o.resize(size_t(n_rays) * 3);
    b->rays_d.resize(size_t(n_rays) * 3);
    b->rgb.resize(size_t(n_rays) * 3);
    for (uint32_t k = 0; k < n_rays; k++) {
      uint64_t pix = next_rand() % (uint64_t(H) * W);
      uint32_t j = (uint32_t)(pix / W), i = (uint32_t)(pix % W);
      // camera-frame direction, reference convention
      // (base_renderer.py:246-251): ((i - W/2)/f, -(j - H/2)/f, -1)
      float dc[3] = {(i - W * 0.5f) / focal, -(j - H * 0.5f) / focal, -1.f};
      for (int r = 0; r < 3; r++) {
        b->rays_d[k * 3 + r] =
            dc[0] * P[r * 4 + 0] + dc[1] * P[r * 4 + 1] + dc[2] * P[r * 4 + 2];
        b->rays_o[k * 3 + r] = P[r * 4 + 3];
        b->rgb[k * 3 + r] = I[(size_t(j) * W + i) * 3 + r];
      }
    }
  }

  void run() {
    for (;;) {
      RayBatch* b = new RayBatch();
      fill(b);
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop.load(); });
      if (stop.load()) { delete b; return; }
      ready.push(b);
      cv_ready.notify_one();
    }
  }
};

void* nerf_sampler_create(const float* images, const float* poses,
                          uint32_t n_images, uint32_t height, uint32_t width,
                          float focal, uint32_t n_rays, uint64_t seed) {
  auto* s = new Sampler();
  s->images.assign(images, images + size_t(n_images) * height * width * 3);
  s->poses.assign(poses, poses + size_t(n_images) * 16);
  s->n_images = n_images;
  s->H = height;
  s->W = width;
  s->focal = focal;
  s->n_rays = n_rays;
  s->rng = seed ? seed : 0x9E3779B97F4A7C15ULL;
  s->producer = std::thread([s] { s->run(); });
  return s;
}

// Blocks until a pre-assembled batch is available; copies into caller arrays.
void nerf_sampler_next(void* handle, float* rays_o, float* rays_d, float* rgb) {
  auto* s = (Sampler*)handle;
  RayBatch* b;
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_ready.wait(lk, [&] { return !s->ready.empty(); });
    b = s->ready.front();
    s->ready.pop();
    s->cv_space.notify_one();
  }
  size_t n = size_t(s->n_rays) * 3;
  memcpy(rays_o, b->rays_o.data(), n * sizeof(float));
  memcpy(rays_d, b->rays_d.data(), n * sizeof(float));
  memcpy(rgb, b->rgb.data(), n * sizeof(float));
  delete b;
}

void nerf_sampler_destroy(void* handle) {
  auto* s = (Sampler*)handle;
  s->stop.store(true);
  s->cv_space.notify_all();
  s->producer.join();
  while (!s->ready.empty()) { delete s->ready.front(); s->ready.pop(); }
  delete s;
}

// ---------------------------------------------------------------------------
// 3. Tile assembly (sharded-render image stitching)
// ---------------------------------------------------------------------------

// Scatter n_tiles row-contiguous ray tiles back into a [H, W, C] frame.
// offsets/lengths are in rays (pixels); tiles is the concatenated tile data.
void nerf_assemble_tiles(const float* tiles, const uint64_t* offsets,
                         const uint64_t* lengths, uint32_t n_tiles,
                         float* frame, uint64_t frame_rays, uint32_t channels) {
  const float* src = tiles;
  for (uint32_t t = 0; t < n_tiles; t++) {
    uint64_t off = offsets[t], len = lengths[t];
    if (off + len > frame_rays) continue;
    memcpy(frame + off * channels, src, size_t(len) * channels * sizeof(float));
    src += len * channels;
  }
}

}  // extern "C"
