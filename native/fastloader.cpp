// fastloader — native batched image decode + letterbox for the data pipeline.
//
// Role: the TPU-native equivalent of the reference's DataLoader worker pool
// (utils/datasets.py worker processes doing cv2.imread + letterbox).  A
// std::thread pool decodes JPEG (libjpeg) / PNG (libpng) files and writes
// aspect-preserving bilinear-letterboxed RGB uint8 tiles straight into the
// caller-provided batch buffer — one C call per batch, zero Python-side
// per-image work, no GIL, no worker processes.
//
// C ABI (consumed via ctypes from mmidet_tpu/data/native.py):
//   int fl_batch_decode(const char** paths, int n, uint8_t* out, int size,
//                       float* meta, int n_threads, int scaleup);
// scaleup=0 clamps the resize ratio to <=1 (the reference's VAL-time
// letterbox scaleup=False, datasets.py:1484-1487).
// out:  n * size * size * 3 bytes (letterboxed, pad value 114)
// meta: n * 3 floats (ratio, dw, dh) — same contract as letterbox_np
// returns number of successfully decoded images (failures leave gray tiles).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC RGB
  int w = 0, h = 0;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* im) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->w = cinfo.output_width;
  im->h = cinfo.output_height;
  im->data.resize(size_t(im->w) * im->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = im->data.data() + size_t(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ----
bool decode_png(FILE* f, Image* im) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);            // palette/gray/bit-depth -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  im->w = png_get_image_width(png, info);
  im->h = png_get_image_height(png, info);
  im->data.resize(size_t(im->w) * im->h * 3);
  std::vector<png_bytep> rows(im->h);
  for (int y = 0; y < im->h; ++y)
    rows[y] = im->data.data() + size_t(y) * im->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* im) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, im);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, im);
  }
  fclose(f);
  return ok;
}

// ----------------------------------------------------- bilinear letterbox --
// Same contract as letterbox_np (datasets.py:2016 semantics): r = min(S/h,
// S/w); resized content centered; pad 114.
void letterbox(const Image& im, uint8_t* out, int S, float* meta,
               int scaleup) {
  float r = std::min(float(S) / im.h, float(S) / im.w);
  if (!scaleup) r = std::min(r, 1.0f);
  int nw = int(std::lround(im.w * r));
  int nh = int(std::lround(im.h * r));
  float dw = (S - nw) / 2.0f;
  float dh = (S - nh) / 2.0f;
  int left = int(std::lround(dw - 0.1f));
  int top = int(std::lround(dh - 0.1f));
  std::memset(out, 114, size_t(S) * S * 3);
  const float sx = float(im.w) / nw;
  const float sy = float(im.h) / nh;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, float(im.h - 1)));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, im.h - 1);
    float wy = fy - y0;
    uint8_t* orow = out + (size_t(top + y) * S + left) * 3;
    const uint8_t* r0 = im.data.data() + size_t(y0) * im.w * 3;
    const uint8_t* r1 = im.data.data() + size_t(y1) * im.w * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, float(im.w - 1)));
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, im.w - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = r0[x0 * 3 + c], v01 = r0[x1 * 3 + c];
        float v10 = r1[x0 * 3 + c], v11 = r1[x1 * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        orow[x * 3 + c] = uint8_t(std::lround(v));
      }
    }
  }
  meta[0] = r;
  meta[1] = dw;
  meta[2] = dh;
}

}  // namespace

extern "C" {

int fl_batch_decode(const char** paths, int n, uint8_t* out, int size,
                    float* meta, int n_threads, int scaleup) {
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, n);
  std::atomic<int> next(0), ok_count(0);
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image im;
      uint8_t* dst = out + size_t(i) * size * size * 3;
      float* m = meta + size_t(i) * 3;
      if (decode_file(paths[i], &im) && im.w > 0 && im.h > 0) {
        letterbox(im, dst, size, m, scaleup);
        ok_count.fetch_add(1);
      } else {
        std::memset(dst, 114, size_t(size) * size * 3);
        m[0] = 1.0f;
        m[1] = m[2] = 0.0f;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

// single-image decode to original resolution (for detect/eval original-frame
// annotation); caller frees via fl_free.
uint8_t* fl_decode(const char* path, int* w, int* h) {
  Image im;
  if (!decode_file(path, &im)) return nullptr;
  uint8_t* buf = static_cast<uint8_t*>(malloc(im.data.size()));
  std::memcpy(buf, im.data.data(), im.data.size());
  *w = im.w;
  *h = im.h;
  return buf;
}

void fl_free(uint8_t* p) { free(p); }

}  // extern "C"
