// fm3dgan native data ops: JPEG/PNG decode + bilinear resize + normalize.
//
// The reference feeds training from PIL decode inside torch DataLoader
// workers (/root/reference/dataset.py:31-33, num_workers=8,
// train_3_encoder.py:226-308).  This library is the TPU-framework
// counterpart: a C++ hot path that decodes images (libjpeg/libpng), resizes
// bilinearly to the training resolution and emits normalized [-1,1] float32
// NHWC batches, parallelized with std::thread.  Python binds via ctypes
// (fm3dgan/data/native.py) with a PIL fallback when the .so is absent.
//
// Exported C ABI:
//   int fm3d_load_batch(const char** paths, int n, int out_size,
//                       float* out, int n_threads);
//     out: [n, out_size, out_size, 3] float32, [-1, 1].  Returns 0 on
//     success, else the 1-based index of the first failing path.
//   int fm3d_preprocess_batch(const unsigned char* src, int n, int h, int w,
//                             int out_size, float* out, int n_threads);
//     src: [n, h, w, 3] uint8 -> same resize+normalize path.  Returns 0.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <functional>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0, w = 0;
};

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->data.resize(size_t(img->h) * img->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->data.data() + size_t(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

bool decode_png(FILE* f, Image* img) {
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

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // Normalize to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img->w = int(w);
  img->h = int(h);
  img->data.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = img->data.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, img);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, img);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Bilinear resize (half-pixel centers, PIL-compatible sampling grid) +
// normalize to [-1, 1].
// ---------------------------------------------------------------------------

void resize_normalize(const uint8_t* src, int in_h, int in_w, int out_size,
                      float* dst) {
  const float kInv = 2.0f / 255.0f;
  if (in_h == out_size && in_w == out_size) {
    const size_t n = size_t(out_size) * out_size * 3;
    for (size_t i = 0; i < n; i++) dst[i] = src[i] * kInv - 1.0f;
    return;
  }
  const float sy = float(in_h) / out_size;
  const float sx = float(in_w) / out_size;
  for (int oy = 0; oy < out_size; oy++) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = int(fy >= 0 ? fy : fy - 1);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= in_h ? in_h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= in_h ? in_h - 1 : y0 + 1);
    for (int ox = 0; ox < out_size; ox++) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = int(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= in_w ? in_w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= in_w ? in_w - 1 : x0 + 1);
      const uint8_t* p00 = src + (size_t(y0c) * in_w + x0c) * 3;
      const uint8_t* p01 = src + (size_t(y0c) * in_w + x1c) * 3;
      const uint8_t* p10 = src + (size_t(y1c) * in_w + x0c) * 3;
      const uint8_t* p11 = src + (size_t(y1c) * in_w + x1c) * 3;
      float* out = dst + (size_t(oy) * out_size + ox) * 3;
      for (int c = 0; c < 3; c++) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        out[c] = (top + (bot - top) * wy) * kInv - 1.0f;
      }
    }
  }
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; i++) fn(i);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

int fm3d_load_batch(const char** paths, int n, int out_size, float* out,
                    int n_threads) {
  std::atomic<int> first_fail(0);
  parallel_for(n, n_threads, [&](int i) {
    Image img;
    if (!decode_file(paths[i], &img)) {
      int expected = 0;
      first_fail.compare_exchange_strong(expected, i + 1);
      return;
    }
    resize_normalize(img.data.data(), img.h, img.w, out_size,
                     out + size_t(i) * out_size * out_size * 3);
  });
  return first_fail.load();
}

int fm3d_preprocess_batch(const unsigned char* src, int n, int h, int w,
                          int out_size, float* out, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    resize_normalize(src + size_t(i) * h * w * 3, h, w, out_size,
                     out + size_t(i) * out_size * out_size * 3);
  });
  return 0;
}

}  // extern "C"
