// PNG image decode/encode for the frame-ingest runtime.
//
// TPU-native counterpart of the reference's sensor ingest + stb_image
// externals (openni_device.cpp:96-156 reads device frames; here frames come
// from dataset PNGs). Decoding happens in native code because the Python
// loop is latency-sensitive: the SLAM step runs async on the TPU while the
// next frame decodes on host threads (see prefetch.cpp).
//
// C ABI, consumed via ctypes from octree_slam_tpu/io/native.py.

#include <png.h>
#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct OslamImage {
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t channels = 0;   // 1 (gray) or 3 (rgb)
  uint32_t bit_depth = 0;  // 8 or 16
  uint8_t* data = nullptr; // row-major, host-endian for 16-bit
};

// Decode a PNG file. Gray stays gray (8/16-bit); palette/gray-alpha/RGBA
// are normalized to 8-bit RGB; 16-bit is byte-swapped to host order.
// Returns nullptr on any error.
OslamImage* oslam_image_load(const char* path) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return nullptr;

  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return nullptr;
  }

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return nullptr; }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return nullptr;
  }

  OslamImage* img = nullptr;
  std::vector<png_bytep> rows;

  if (setjmp(png_jmpbuf(png))) {  // libpng error unwinding
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    if (img) { free(img->data); delete img; }
    return nullptr;
  }

  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // Normalization: expand palettes & sub-8-bit gray, drop alpha, keep
  // 16-bit gray (TUM depth) as-is but host-endian.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth == 16) {
    const uint16_t one = 1;
    if (*reinterpret_cast<const uint8_t*>(&one) == 1) png_set_swap(png);
  }
  png_read_update_info(png, info);

  bit_depth = png_get_bit_depth(png, info);
  color_type = png_get_color_type(png, info);
  uint32_t channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  img = new OslamImage();
  img->width = width;
  img->height = height;
  img->channels = channels;
  img->bit_depth = static_cast<uint32_t>(bit_depth);
  img->data = static_cast<uint8_t*>(malloc(rowbytes * height));
  if (!img->data) longjmp(png_jmpbuf(png), 1);

  rows.resize(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = img->data + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);

  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return img;
}

uint32_t oslam_image_width(const OslamImage* im) { return im->width; }
uint32_t oslam_image_height(const OslamImage* im) { return im->height; }
uint32_t oslam_image_channels(const OslamImage* im) { return im->channels; }
uint32_t oslam_image_bit_depth(const OslamImage* im) { return im->bit_depth; }
const uint8_t* oslam_image_data(const OslamImage* im) { return im->data; }

void oslam_image_free(OslamImage* im) {
  if (!im) return;
  free(im->data);
  delete im;
}

// Encode an 8-bit image (1, 3, or 4 channels) to a PNG file.
// Returns 0 on success.
int oslam_png_write(const char* path, const uint8_t* data, uint32_t width,
                    uint32_t height, uint32_t channels) {
  if (channels != 1 && channels != 3 && channels != 4) return -1;
  FILE* fp = fopen(path, "wb");
  if (!fp) return -2;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    fclose(fp);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return -4;
  }
  png_init_io(png, fp);
  int ctype = channels == 1   ? PNG_COLOR_TYPE_GRAY
              : channels == 3 ? PNG_COLOR_TYPE_RGB
                              : PNG_COLOR_TYPE_RGBA;
  png_set_IHDR(png, info, width, height, 8, ctype, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  // Frame dumps favor speed over ratio: the app writes one per rendered
  // frame while the TPU computes the next step.
  png_set_compression_level(png, 1);
  png_write_info(png, info);
  std::vector<png_bytep> rows(height);
  const size_t rowbytes = static_cast<size_t>(width) * channels;
  for (uint32_t y = 0; y < height; ++y)
    rows[y] = const_cast<uint8_t*>(data) + y * rowbytes;
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

}  // extern "C"
