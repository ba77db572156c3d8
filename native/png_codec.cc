#include "png_codec.h"

#include <png.h>

#include <cstdio>
#include <cstring>

namespace popup {

namespace {

struct FileCloser {
  FILE* f;
  ~FileCloser() {
    if (f) fclose(f);
  }
};

}  // namespace

bool DecodePng(const std::string& path, Image* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    *err = "cannot open " + path;
    return false;
  }
  FileCloser closer{f};

  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
    *err = "not a PNG: " + path;
    return false;
  }

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    *err = "png_create_read_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    *err = "png_create_info_struct failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "libpng error decoding " + path;
    return false;
  }

  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // Normalize: palette -> RGB, gray<8 -> 8, drop alpha, 16-bit stays
  // 16-bit only for grayscale (TUM depth); 16-bit color is downshifted.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  bool keep16 =
      bit_depth == 16 && (color_type == PNG_COLOR_TYPE_GRAY ||
                          color_type == PNG_COLOR_TYPE_GRAY_ALPHA);
  if (bit_depth == 16 && !keep16) png_set_strip_16(png);
  if (keep16) png_set_swap(png);  // PNG is big-endian; we want host (LE)

  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->channels = channels;
  out->bit_depth = keep16 ? 16 : 8;

  std::vector<png_bytep> rows(h);
  if (keep16) {
    out->u16.resize(size_t(w) * h * channels);
    out->u8.clear();
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out->u16.data() +
                                            size_t(y) * w * channels);
  } else {
    out->u8.resize(size_t(h) * rowbytes);
    out->u16.clear();
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = out->u8.data() + size_t(y) * rowbytes;
  }
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool EncodePng(const std::string& path, const Image& img, std::string* err) {
  if (img.bit_depth != 8 && img.bit_depth != 16) {
    *err = "unsupported bit depth";
    return false;
  }
  if (img.bit_depth == 16 && img.channels != 1) {
    *err = "16-bit encode supports 1 channel only";
    return false;
  }
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) {
    *err = "cannot open for write: " + path;
    return false;
  }
  FileCloser closer{f};

  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    *err = "png_create_write_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    *err = "png_create_info_struct failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    *err = "libpng error encoding " + path;
    return false;
  }
  png_init_io(png, f);

  int color_type =
      img.channels == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_GRAY;
  png_set_IHDR(png, info, img.width, img.height, img.bit_depth, color_type,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  if (img.bit_depth == 16) png_set_swap(png);

  std::vector<png_bytep> rows(img.height);
  size_t rowbytes = size_t(img.width) * img.channels * (img.bit_depth / 8);
  for (int y = 0; y < img.height; ++y) {
    const uint8_t* base = img.bit_depth == 16
                              ? reinterpret_cast<const uint8_t*>(img.u16.data())
                              : img.u8.data();
    rows[y] = const_cast<png_bytep>(base + size_t(y) * rowbytes);
  }
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  return true;
}

}  // namespace popup
