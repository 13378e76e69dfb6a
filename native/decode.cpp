// Native image decode + resize for the training data loader.
//
// Plays the role of the reference's torch DataLoader worker processes
// (arcface_dataloader.py:525-590): JPEG/PNG decode (libjpeg/libpng) and
// bilinear resize to the model input size, with a pthread batch API so one
// call decodes a whole batch in parallel. Exposed to Python via ctypes
// (facerecognition_tpu/data/native_decode.py).
//
// Build: g++ -O3 -shared -fPIC -o libfrt_decode.so decode.cpp -ljpeg -lpng -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <pthread.h>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto *err = reinterpret_cast<JpegErrorMgr *>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB8. Returns true on success.
bool decode_jpeg(const uint8_t *data, size_t size, std::vector<uint8_t> *out,
                 int *width, int *height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t *>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(static_cast<size_t>(*width) * *height * 3);
  const int stride = *width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = out->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t *data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto *state = static_cast<PngReadState *>(png_get_io_ptr(png));
  if (state->offset + n > state->size) {
    png_error(png, "png: read past end");
  }
  memcpy(out, state->data + state->offset, n);
  state->offset += n;
}

bool decode_png(const uint8_t *data, size_t size, std::vector<uint8_t> *out,
                int *width, int *height) {
  if (size < 8 || png_sig_cmp(data, 0, 8) != 0) return false;
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
  PngReadState state{data, size, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  else if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  const size_t stride = static_cast<size_t>(*width) * 3;
  out->resize(stride * *height);
  std::vector<png_bytep> rows(*height);
  for (int y = 0; y < *height; ++y) rows[y] = out->data() + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// Bilinear resize RGB8 (half-pixel centers — matches ops.image conventions).
void resize_bilinear(const uint8_t *src, int sw, int sh, uint8_t *dst, int dw,
                     int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 > sh - 1 ? sh - 1 : y0 + 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > sw - 1) x0 = sw - 1;
      int x1 = x0 + 1 > sw - 1 ? sw - 1 : x0 + 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        float v = top * (1 - wy) + bot * wy;
        dst[(y * dw + x) * 3 + c] =
            static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      }
    }
  }
}

bool decode_file_to(const char *path, uint8_t *dst, int size) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return false;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(n));
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (got != buf.size()) return false;

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  bool ok = false;
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    ok = decode_jpeg(buf.data(), buf.size(), &rgb, &w, &h);
  } else {
    ok = decode_png(buf.data(), buf.size(), &rgb, &w, &h);
    if (!ok) ok = decode_jpeg(buf.data(), buf.size(), &rgb, &w, &h);
  }
  if (!ok || w <= 0 || h <= 0) return false;
  if (w == size && h == size) {
    memcpy(dst, rgb.data(), static_cast<size_t>(size) * size * 3);
  } else {
    resize_bilinear(rgb.data(), w, h, dst, size, size);
  }
  return true;
}

struct BatchTask {
  const char **paths;
  uint8_t *out;       // (n, size, size, 3)
  uint8_t *ok;        // (n,)
  int size;
  int n;
  int next;           // guarded by mutex
  pthread_mutex_t mutex;
};

void *batch_worker(void *arg) {
  auto *task = static_cast<BatchTask *>(arg);
  const size_t stride = static_cast<size_t>(task->size) * task->size * 3;
  for (;;) {
    pthread_mutex_lock(&task->mutex);
    int i = task->next++;
    pthread_mutex_unlock(&task->mutex);
    if (i >= task->n) return nullptr;
    task->ok[i] =
        decode_file_to(task->paths[i], task->out + i * stride, task->size)
            ? 1
            : 0;
  }
}

bool decode_any(const uint8_t *data, size_t size, std::vector<uint8_t> *rgb,
                int *w, int *h) {
  if (size >= 2 && data[0] == 0xFF && data[1] == 0xD8) {
    return decode_jpeg(data, size, rgb, w, h);
  }
  if (decode_png(data, size, rgb, w, h)) return true;
  return decode_jpeg(data, size, rgb, w, h);
}

}  // namespace

extern "C" {

// Decode one file into dst (size*size*3, RGB8). Returns 1 on success.
int frt_decode_one(const char *path, uint8_t *dst, int size) {
  return decode_file_to(path, dst, size) ? 1 : 0;
}

// Decode a JPEG/PNG byte buffer at NATIVE resolution (no resize) — the
// serving-path entry point (web uploads arrive as in-memory bytes, not
// files; reference decodes per request with PIL, web_app.py:210-217).
// On success writes w*h*3 RGB8 into dst and returns 1. Returns 0 on a
// decode failure. Returns -1 when dst_cap is too small, with *w/*h set so
// the caller can retry with an exact buffer.
int frt_decode_mem(const uint8_t *data, long size, uint8_t *dst,
                   long dst_cap, int *w, int *h) {
  std::vector<uint8_t> rgb;
  *w = 0;
  *h = 0;
  if (size <= 0 || !decode_any(data, static_cast<size_t>(size), &rgb, w, h) ||
      *w <= 0 || *h <= 0) {
    return 0;
  }
  const long needed = static_cast<long>(*w) * *h * 3;
  if (needed > dst_cap) return -1;
  memcpy(dst, rgb.data(), static_cast<size_t>(needed));
  return 1;
}

// Decode n files in parallel with n_threads workers.
// out: (n, size, size, 3) RGB8; ok: (n,) success flags. Returns #succeeded.
int frt_decode_batch(const char **paths, int n, uint8_t *out, uint8_t *ok,
                     int size, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  BatchTask task{paths, out, ok, size, n, 0, PTHREAD_MUTEX_INITIALIZER};
  std::vector<pthread_t> threads(static_cast<size_t>(n_threads));
  for (auto &t : threads) pthread_create(&t, nullptr, batch_worker, &task);
  for (auto &t : threads) pthread_join(t, nullptr);
  int good = 0;
  for (int i = 0; i < n; ++i) good += ok[i];
  return good;
}

}  // extern "C"
