// desr_tpu native data-IO: fast PNG decode + fused depth/image normalization.
//
// The training-input bottleneck of the reference pipeline is host-side image
// decode + normalization (PIL per sample inside DataLoader workers). This
// library provides a C++ fast path used by desr_tpu/data/native_io.py via
// ctypes (graceful fallback to PIL when the shared object is missing):
//
//   - decode_png_info / decode_png:  16-bit grayscale (depth) and 8/16-bit
//     RGB(A) PNG decode via libpng, returning row-packed buffers
//   - depth_to_norm:   uint16 mm depth -> [-1, 1] float32
//     (clip at max_mm, /max_mm, *2-1 — data/my_main_dataset.py:38-42 semantics)
//   - image_to_norm:   uint8 RGB -> [-1, 1] float32 ((x-127.5)/127.5)
//   - resize_area_f32: INTER_AREA box-filter resize for float32 HxWxC
//
// Build: g++ -O3 -shared -fPIC -o libdesr_dataio.so dataio.cpp -lpng -lz
// (driven by native/Makefile; desr_tpu/data/native_io.py builds lazily).

#include <png.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success; fills width/height/channels/bit_depth.
int decode_png_info(const char* path, int* width, int* height, int* channels,
                    int* bit_depth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  int ch = 1;
  if (color == PNG_COLOR_TYPE_RGB) ch = 3;
  else if (color == PNG_COLOR_TYPE_RGB_ALPHA) ch = 4;
  else if (color == PNG_COLOR_TYPE_GRAY_ALPHA) ch = 2;
  else if (color == PNG_COLOR_TYPE_PALETTE) ch = 3;
  *channels = ch;
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode into caller-allocated buffer `out` (uint16 per sample regardless of
// source bit depth; 8-bit values are NOT scaled). Returns 0 on success.
int decode_png(const char* path, uint16_t* out, int out_capacity_samples) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int width = png_get_image_width(png, info);
  int height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // PNG stores 16-bit big-endian; we want host (little) endian.
  if (bit_depth == 16) png_set_swap(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  bit_depth = png_get_bit_depth(png, info);
  size_t samples = (size_t)width * height * channels;
  if ((int64_t)samples > out_capacity_samples) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }

  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> rowbuf(rowbytes);
  for (int y = 0; y < height; ++y) {
    png_read_row(png, rowbuf.data(), nullptr);
    uint16_t* dst = out + (size_t)y * width * channels;
    if (bit_depth == 16) {
      std::memcpy(dst, rowbuf.data(), rowbytes);
    } else {
      for (size_t i = 0; i < (size_t)width * channels; ++i) dst[i] = rowbuf[i];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// uint16 depth (mm) -> [-1, 1] float (my_main_dataset.py:38-42 semantics).
void depth_to_norm(const uint16_t* in, float* out, int64_t n, float max_mm) {
  const float inv = 2.0f / max_mm;
  for (int64_t i = 0; i < n; ++i) {
    float d = (float)in[i];
    if (d > max_mm) d = max_mm;
    out[i] = d * inv - 1.0f;
  }
}

// uint8-range values (stored u16) -> [-1, 1] float ((x - 127.5) / 127.5).
void image_to_norm(const uint16_t* in, float* out, int64_t n) {
  const float inv = 1.0f / 127.5f;
  for (int64_t i = 0; i < n; ++i) out[i] = ((float)in[i] - 127.5f) * inv;
}

// INTER_AREA (box filter with fractional coverage) resize, float32 HWC.
void resize_area_f32(const float* in, int in_h, int in_w, int ch,
                     float* out, int out_h, int out_w) {
  const double sy = (double)in_h / out_h;
  const double sx = (double)in_w / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    double y0 = oy * sy, y1 = (oy + 1) * sy;
    int iy0 = (int)y0, iy1 = std::min((int)std::ceil(y1), in_h);
    for (int ox = 0; ox < out_w; ++ox) {
      double x0 = ox * sx, x1 = (ox + 1) * sx;
      int ix0 = (int)x0, ix1 = std::min((int)std::ceil(x1), in_w);
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0, wsum = 0.0;
        for (int iy = iy0; iy < iy1; ++iy) {
          double wy = std::min((double)iy + 1, y1) - std::max((double)iy, y0);
          for (int ix = ix0; ix < ix1; ++ix) {
            double wx = std::min((double)ix + 1, x1) - std::max((double)ix, x0);
            acc += in[((size_t)iy * in_w + ix) * ch + c] * wy * wx;
            wsum += wy * wx;
          }
        }
        out[((size_t)oy * out_w + ox) * ch + c] = (float)(acc / wsum);
      }
    }
  }
}

}  // extern "C"
