// Native host-side image loader for the TPU input pipeline.
//
// The reference offloads per-sample image work to forked torch
// DataLoader workers (Python + cv2). Here the host hot path — JPEG
// decode, bilinear resize to the canvas scale, zero-padded canvas
// assembly (BGR, matching cv2.imread) — is a small C++ library driven
// from Python via ctypes, with an internal thread pool so a many-core
// production host keeps one TPU chip fed without Python in the loop.
//
// Exposed C ABI:
//   int hl_load_canvas_batch(const char** paths, int n, int canvas,
//                            int threads, unsigned char* out,
//                            float* canvas_scale, float* widths,
//                            float* heights);
// Returns the number of successfully decoded images; failed slots are
// zero-filled with canvas_scale 0 (the Python side falls back to cv2
// for those).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG file to tightly packed BGR8. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels,
                 int* width, int* height) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  // declared BEFORE setjmp: a longjmp from jpeg_err_exit must not skip
  // this object's initialization (UB) — the error path returns through
  // normal scope exit, so the destructor runs and nothing leaks even
  // when a corrupt JPEG aborts mid-decode
  std::vector<uint8_t> row;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // swapped to BGR below (cv2 parity)
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;  // 3 for JCS_RGB
  // reject absurd header-declared dimensions BEFORE allocating: a
  // corrupt/crafted SOF claiming 60000x60000 would request ~10.8 GB
  // (and a bad_alloc escaping the worker thread would abort the whole
  // process). 2^27 px (~134 MP, 402 MB BGR) far exceeds any real photo.
  if (w <= 0 || h <= 0 ||
      static_cast<int64_t>(w) * h > (static_cast<int64_t>(1) << 27)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  pixels->assign(static_cast<size_t>(w) * h * 3, 0);
  row.resize(static_cast<size_t>(w) * ch);
  uint8_t* rptr = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rptr, 1);
    uint8_t* dst = pixels->data() + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {  // RGB -> BGR
      dst[x * 3 + 0] = row[x * ch + 2];
      dst[x * 3 + 1] = row[x * ch + 1];
      dst[x * 3 + 2] = row[x * ch + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  *width = w;
  *height = h;
  return true;
}

// Bilinear resize (cv2 INTER_LINEAR convention: half-pixel centers)
// from src [h, w, 3] into dst [oh, ow, 3].
void resize_bilinear(const uint8_t* src, int w, int h, uint8_t* dst,
                     int ow, int oh) {
  const float sx = static_cast<float>(w) / ow;
  const float sy = static_cast<float>(h) / oh;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, w - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * 3;
      uint8_t* o = dst + (static_cast<size_t>(y) * ow + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] * (1 - wx) + p01[c] * wx;
        const float bot = p10[c] * (1 - wx) + p11[c] * wx;
        o[c] = static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Whole-image packing: scale by q = canvas/max(w, h), zero-pad
// bottom/right. resize_bilinear samples with half-pixel centers, so
// the packed content sits at q*x_src + (q-1)/2; the compensating
// source offset (1-q)/(2q) is written to ox/oy when provided (the
// canvas-batch ABI has no offset outputs — its Python caller applies
// the same formula from the returned scale).
void pack_whole_image(const std::vector<uint8_t>& pixels, int w, int h,
                      int canvas, uint8_t* out_img, float* q_out,
                      float* ox_out, float* oy_out) {
  const float q = static_cast<float>(canvas) / std::max(w, h);
  // lrintf (round-half-even under the default rounding mode) matches
  // the cv2 fallback's Python round() in data/common.py — +0.5f floor
  // diverged on exact .5 products (w=5 at q=0.5: 3 px vs Python's 2)
  const int ow = std::max(1, static_cast<int>(std::lrintf(w * q)));
  const int oh = std::max(1, static_cast<int>(std::lrintf(h * q)));
  std::vector<uint8_t> resized;
  const uint8_t* src = pixels.data();
  if (!(ow == w && oh == h)) {
    resized.resize(static_cast<size_t>(ow) * oh * 3);
    resize_bilinear(pixels.data(), w, h, resized.data(), ow, oh);
    src = resized.data();
  }
  for (int y = 0; y < oh; ++y) {
    std::memcpy(out_img + static_cast<size_t>(y) * canvas * 3,
                src + static_cast<size_t>(y) * ow * 3,
                static_cast<size_t>(ow) * 3);
  }
  *q_out = q;
  const float off = (1.0f - q) / (2.0f * q);
  if (ox_out) *ox_out = off;
  if (oy_out) *oy_out = off;
}

void load_one(const char* path, int canvas, uint8_t* out_img,
              float* scale, float* width, float* height) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  std::memset(out_img, 0, static_cast<size_t>(canvas) * canvas * 3);
  *scale = 0.0f;
  *width = 0.0f;
  *height = 0.0f;
  if (!decode_jpeg(path, &pixels, &w, &h) || w <= 0 || h <= 0) return;
  pack_whole_image(pixels, w, h, canvas, out_img, scale, nullptr, nullptr);
  *width = static_cast<float>(w);
  *height = static_cast<float>(h);
}

// Crop-aware packing: place the person's bbox neighborhood at NATIVE
// resolution into the canvas (q = 1 whenever the region fits; only
// regions larger than the canvas are downscaled). The Python pipeline
// composes the region offset/scale into the per-sample crop affine, so
// the device warp samples x_canvas = q * (x_src - ox). cv2 fallback:
// data/common.py::canvas_batch(crop_aware=True) — identical math.
void load_region_one(const char* path, int canvas, float cx, float cy,
                     float side, uint8_t* out_img, float* q_out,
                     float* ox_out, float* oy_out, float* width,
                     float* height) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  std::memset(out_img, 0, static_cast<size_t>(canvas) * canvas * 3);
  *q_out = 0.0f;
  *ox_out = 0.0f;
  *oy_out = 0.0f;
  *width = 0.0f;
  *height = 0.0f;
  if (!decode_jpeg(path, &pixels, &w, &h) || w <= 0 || h <= 0) return;
  *width = static_cast<float>(w);
  *height = static_cast<float>(h);

  if (side < 8.0f) {  // degenerate geometry: whole-image fallback
    pack_whole_image(pixels, w, h, canvas, out_img, q_out, ox_out, oy_out);
    return;
  }

  const float ox = std::floor(cx - side * 0.5f + 0.5f);
  const float oy = std::floor(cy - side * 0.5f + 0.5f);
  if (side <= static_cast<float>(canvas)) {
    // native resolution: plain intersection copy (q = 1, exact). The
    // whole canvas extent is filled (not just `side` pixels) so the
    // result matches the cv2 fallback's full-canvas warp bit for bit.
    const int x0 = std::max(0, static_cast<int>(ox));
    const int y0 = std::max(0, static_cast<int>(oy));
    const int x1 = std::min(w, static_cast<int>(ox) + canvas);
    const int y1 = std::min(h, static_cast<int>(oy) + canvas);
    for (int y = y0; y < y1; ++y) {
      if (x1 <= x0) break;
      std::memcpy(out_img + (static_cast<size_t>(y - static_cast<int>(oy)) *
                             canvas + (x0 - static_cast<int>(ox))) * 3,
                  pixels.data() + (static_cast<size_t>(y) * w + x0) * 3,
                  static_cast<size_t>(x1 - x0) * 3);
    }
    *q_out = 1.0f;
  } else {
    // region larger than the canvas: downscale by q = canvas/side;
    // canvas pixel (X, Y) samples source (X/q + ox, Y/q + oy),
    // bilinear, zero outside — the convention the device warp assumes.
    const float q = static_cast<float>(canvas) / side;
    const float inv_q = side / static_cast<float>(canvas);
    for (int y = 0; y < canvas; ++y) {
      const float fy = y * inv_q + oy;
      if (fy < -1.0f || fy > static_cast<float>(h)) continue;
      const int y0i = static_cast<int>(std::floor(fy));
      const float wy = fy - y0i;
      for (int x = 0; x < canvas; ++x) {
        const float fx = x * inv_q + ox;
        if (fx < -1.0f || fx > static_cast<float>(w)) continue;
        const int x0i = static_cast<int>(std::floor(fx));
        const float wx = fx - x0i;
        uint8_t* o = out_img + (static_cast<size_t>(y) * canvas + x) * 3;
        for (int c = 0; c < 3; ++c) {
          float acc = 0.0f;
          const float wgt[4] = {(1 - wx) * (1 - wy), wx * (1 - wy),
                                (1 - wx) * wy, wx * wy};
          const int xs[4] = {x0i, x0i + 1, x0i, x0i + 1};
          const int ys[4] = {y0i, y0i, y0i + 1, y0i + 1};
          for (int t = 0; t < 4; ++t) {
            if (xs[t] < 0 || xs[t] >= w || ys[t] < 0 || ys[t] >= h) continue;
            acc += wgt[t] *
                   pixels[(static_cast<size_t>(ys[t]) * w + xs[t]) * 3 + c];
          }
          o[c] = static_cast<uint8_t>(std::min(255.0f, acc + 0.5f));
        }
      }
    }
    *q_out = q;
  }
  *ox_out = ox;
  *oy_out = oy;
}

}  // namespace

extern "C" int hl_load_region_batch(const char** paths, int n, int canvas,
                                    int threads, const float* cx,
                                    const float* cy, const float* side,
                                    unsigned char* out, float* q, float* ox,
                                    float* oy, float* widths,
                                    float* heights) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      try {
        load_region_one(paths[i], canvas, cx[i], cy[i], side[i],
                        out + static_cast<size_t>(i) * canvas * canvas * 3,
                        q + i, ox + i, oy + i, widths + i, heights + i);
      } catch (...) {
        // per-slot failure contract: an exception (e.g. bad_alloc on a
        // pathological image) must not escape the thread and
        // std::terminate the process — the slot stays q=0 (cv2 fallback)
        q[i] = 0.0f;
      }
      if (q[i] > 0.0f) ok.fetch_add(1);
    }
  };
  if (threads == 1 || n == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int k = std::min(threads, n);
    pool.reserve(k);
    for (int t = 0; t < k; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return ok.load();
}

extern "C" int hl_load_canvas_batch(const char** paths, int n, int canvas,
                                    int threads, unsigned char* out,
                                    float* canvas_scale, float* widths,
                                    float* heights) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      try {
        load_one(paths[i], canvas,
                 out + static_cast<size_t>(i) * canvas * canvas * 3,
                 canvas_scale + i, widths + i, heights + i);
      } catch (...) {
        canvas_scale[i] = 0.0f;  // slot failed; cv2 fallback (see above)
      }
      if (canvas_scale[i] > 0.0f) ok.fetch_add(1);
    }
  };
  if (threads == 1 || n == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int k = std::min(threads, n);
    pool.reserve(k);
    for (int t = 0; t < k; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return ok.load();
}

extern "C" int hl_version() { return 4; }
