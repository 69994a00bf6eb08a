// sia_decoder — threaded JPEG decode + resize runtime for the host side
// of the input pipeline.
//
// Role: the reference decodes every JPEG per epoch in 10 forked Python
// DataLoader workers via scikit-image (tone_bias_dataset.py:326-335,
// tone_bias_train.py:334-340). This library is the TPU build's native
// equivalent: a C++ thread pool that decodes each image ONCE into a
// caller-owned contiguous uint8 arena [N, S, S, 3] that feeds the device
// pipeline directly.
//
// Performance notes:
//  - libjpeg DCT scaling (scale_num/8) decodes directly at 1/2, 1/4, 1/8
//    resolution when the target is much smaller than the source — this
//    skips most of the IDCT work, the dominant cost for the 1024px+ ISIC
//    images.
//  - downscale uses a box filter (area average, == OpenCV INTER_AREA
//    quality class); upscale uses bilinear.
//  - no Python in the loop: the GIL is released for the whole batch call.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC decoder.cc -ljpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB. Returns empty vector on failure.
// Uses DCT scaling to decode at the smallest resolution >= target.
std::vector<uint8_t> decode_jpeg(const char* path, int target, int* out_w,
                                 int* out_h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return {};

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<uint8_t> pixels;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return {};
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // Pick scale denominator 1,2,4,8 so the decoded size stays >= target.
  int denom = 1;
  while (denom < 8 && (int)cinfo.image_width / (denom * 2) >= target &&
         (int)cinfo.image_height / (denom * 2) >= target) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int stride = w * cinfo.output_components;
  pixels.resize((size_t)h * stride);
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = pixels.data() + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (cinfo.output_components != 3) {
    // grayscale → replicate channels
    std::vector<uint8_t> rgb((size_t)h * w * 3);
    for (size_t i = 0; i < (size_t)h * w; ++i) {
      rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = pixels[i];
    }
    pixels.swap(rgb);
  }
  *out_w = w;
  *out_h = h;
  return pixels;
}

// Bilinear resize (used for upscaling, matching OpenCV INTER_LINEAR).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int size) {
  const float sx = (float)sw / size;
  const float sy = (float)sh / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) { y0 = 0; y1 = 0; wy = 0; }
    if (y1 >= sh) { y1 = sh - 1; if (y0 > y1) y0 = y1; }
    for (int ox = 0; ox < size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) { x0 = 0; x1 = 0; wx = 0; }
      if (x1 >= sw) { x1 = sw - 1; if (x0 > x1) x0 = x1; }
      const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * 3;
      const uint8_t* p01 = src + ((size_t)y0 * sw + x1) * 3;
      const uint8_t* p10 = src + ((size_t)y1 * sw + x0) * 3;
      const uint8_t* p11 = src + ((size_t)y1 * sw + x1) * 3;
      uint8_t* q = dst + ((size_t)oy * size + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        q[c] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      }
    }
  }
}

// Exact-size resize: box filter (area average) per output pixel for
// downscale (== OpenCV INTER_AREA class); bilinear for upscale.
void resize_box(const uint8_t* src, int sw, int sh, uint8_t* dst, int size) {
  if (sw < size || sh < size) {
    resize_bilinear(src, sw, sh, dst, size);
    return;
  }
  const float sx = (float)sw / size;
  const float sy = (float)sh / size;
  for (int oy = 0; oy < size; ++oy) {
    float fy0 = oy * sy, fy1 = (oy + 1) * sy;
    int y0 = (int)fy0;
    int y1 = (int)std::ceil(fy1);
    if (y1 > sh) y1 = sh;
    if (y1 <= y0) y1 = y0 + 1;
    for (int ox = 0; ox < size; ++ox) {
      float fx0 = ox * sx, fx1 = (ox + 1) * sx;
      int x0 = (int)fx0;
      int x1 = (int)std::ceil(fx1);
      if (x1 > sw) x1 = sw;
      if (x1 <= x0) x1 = x0 + 1;
      float acc[3] = {0, 0, 0};
      float total = 0.f;
      for (int y = y0; y < y1; ++y) {
        float wy = 1.f;
        if (y < fy0) wy -= (fy0 - y);
        if (y + 1 > fy1) wy -= (y + 1 - fy1);
        if (wy <= 0) continue;
        for (int x = x0; x < x1; ++x) {
          float wx = 1.f;
          if (x < fx0) wx -= (fx0 - x);
          if (x + 1 > fx1) wx -= (x + 1 - fx1);
          if (wx <= 0) continue;
          const float w = wx * wy;
          const uint8_t* p = src + ((size_t)y * sw + x) * 3;
          acc[0] += w * p[0];
          acc[1] += w * p[1];
          acc[2] += w * p[2];
          total += w;
        }
      }
      uint8_t* q = dst + ((size_t)oy * size + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = total > 0 ? acc[c] / total : 0.f;
        q[c] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode n images into out (uint8, caller-allocated). Layout:
//   planar == 0 → out[N, size, size, 3]  (interleaved HWC)
//   planar != 0 → out[N, 3, size, size]  (channel-planar CHW — the
//                 TPU Pallas preprocess kernel's native layout)
// Returns the number of successfully decoded images; failed slots are
// zero-filled and their index recorded in failed_idx (caller-allocated,
// capacity n) when non-null; n_failed receives the count.
int sia_decode_batch(const char** paths, int n, uint8_t* out, int size,
                     int n_threads, int* failed_idx, int* n_failed,
                     int planar) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0), fail_count(0);
  const size_t per_img = (size_t)size * size * 3;

  auto worker = [&]() {
    std::vector<uint8_t> hwc(per_img);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      std::vector<uint8_t> img = decode_jpeg(paths[i], size, &w, &h);
      uint8_t* slot = out + (size_t)i * per_img;
      if (img.empty()) {
        std::memset(slot, 0, per_img);
        int k = fail_count.fetch_add(1);
        if (failed_idx) failed_idx[k] = i;
        continue;
      }
      uint8_t* dst = planar ? hwc.data() : slot;
      if (w == size && h == size) {
        std::memcpy(dst, img.data(), per_img);
      } else {
        resize_box(img.data(), w, h, dst, size);
      }
      if (planar) {
        // HWC → CHW scatter (one cached pass over ~size^2*3 bytes)
        const size_t plane = (size_t)size * size;
        for (size_t p = 0; p < plane; ++p) {
          slot[p] = dst[3 * p];
          slot[plane + p] = dst[3 * p + 1];
          slot[2 * plane + p] = dst[3 * p + 2];
        }
      }
      ok.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  const int nt = n_threads > n ? (n > 0 ? n : 1) : n_threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  if (n_failed) *n_failed = fail_count.load();
  return ok.load();
}

// Single-image variant (diagnostics / explain paths).
int sia_decode_one(const char* path, uint8_t* out, int size) {
  int failed = 0;
  int ok = sia_decode_batch(&path, 1, out, size, 1, nullptr, &failed, 0);
  return ok == 1 ? 0 : -1;
}

}  // extern "C"
