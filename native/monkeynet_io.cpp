// monkeynet_tpu native data-loader core.
//
// Decodes the framework's video container formats directly with libpng /
// libjpeg (no Python imaging stack in the training hot path) and emits
// float32 RGB in [0, 1]:
//
//   * stacked-frame images: one PNG/JPG whose width is T x frame_width,
//     frames side by side (the reference's primary dataset format).
//
// C ABI (ctypes-friendly):
//   mk_probe(path, &height, &width)            -> 0 on success
//   mk_decode_image(path, buf, h, w)           -> 0; buf is h*w*3 floats
//   mk_decode_stacked(path, frame_h, frame_w, buf, max_frames)
//       -> number of frames written (buf is T*frame_h*frame_w*3 floats,
//          frame-major), or -errcode
//
// Grayscale expands to RGB; alpha is dropped; 16-bit PNG is scaled.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrDecode = -3;
constexpr int kErrGeometry = -4;

bool has_suffix(const std::string& s, const char* suf) {
  std::string lower(s);
  for (auto& c : lower) c = static_cast<char>(tolower(c));
  const size_t n = strlen(suf);
  return lower.size() >= n && lower.compare(lower.size() - n, n, suf) == 0;
}

// ----------------------------------------------------------------- PNG path

struct PngImage {
  std::vector<uint8_t> rgb;  // h*w*3
  int h = 0, w = 0;
};

int decode_png(const char* path, PngImage* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return kErrDecode;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return kErrDecode;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  // Normalize every variant to 8-bit RGB.
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->h = static_cast<int>(png_get_image_height(png, info));
  out->w = static_cast<int>(png_get_image_width(png, info));
  const size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(out->w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return kErrFormat;
  }

  out->rgb.resize(static_cast<size_t>(out->h) * out->w * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------- JPEG path

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);  // never exit() the host process on bad input
}

int decode_jpeg(const char* path, PngImage* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return kErrDecode;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->h = static_cast<int>(cinfo.output_height);
  out->w = static_cast<int>(cinfo.output_width);
  out->rgb.resize(static_cast<size_t>(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        out->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

int decode_any(const char* path, PngImage* out) {
  // Sniff magic bytes — extensions lie (e.g. PNG data in .jpg files).
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  uint8_t magic[4] = {0};
  const size_t got = fread(magic, 1, sizeof(magic), fp);
  fclose(fp);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N' &&
      magic[3] == 'G')
    return decode_png(path, out);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8)
    return decode_jpeg(path, out);
  std::string p(path);
  if (has_suffix(p, ".png")) return decode_png(path, out);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
    return decode_jpeg(path, out);
  return kErrFormat;
}

}  // namespace

extern "C" {

int mk_probe(const char* path, int* height, int* width) {
  // Header-only: never decodes pixel data.
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  uint8_t magic[4] = {0};
  const size_t got = fread(magic, 1, sizeof(magic), fp);

  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    rewind(fp);
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
      if (png) png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return kErrDecode;
    }
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return kErrDecode;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    *height = static_cast<int>(png_get_image_height(png, info));
    *width = static_cast<int>(png_get_image_width(png, info));
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
  }
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rewind(fp);
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_longjmp;
    if (setjmp(jerr.jump)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(fp);
      return kErrDecode;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
      jpeg_destroy_decompress(&cinfo);
      fclose(fp);
      return kErrDecode;
    }
    *height = static_cast<int>(cinfo.image_height);
    *width = static_cast<int>(cinfo.image_width);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 0;
  }
  fclose(fp);
  return kErrFormat;
}

int mk_decode_image(const char* path, float* out, int h, int w) {
  PngImage img;
  const int rc = decode_any(path, &img);
  if (rc != 0) return rc;
  if (img.h != h || img.w != w) return kErrGeometry;
  const size_t n = static_cast<size_t>(h) * w * 3;
  constexpr float kInv255 = 1.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) out[i] = img.rgb[i] * kInv255;
  return 0;
}

// Decode a horizontally-stacked frame image into (T, frame_h, frame_w, 3)
// float32, frame-major. Returns T (>0) or a negative error code.
int mk_decode_stacked(const char* path, int frame_h, int frame_w, float* out,
                      int max_frames) {
  PngImage img;
  const int rc = decode_any(path, &img);
  if (rc != 0) return rc;
  if (img.h != frame_h || img.w % frame_w != 0) return kErrGeometry;
  int t = img.w / frame_w;
  if (t > max_frames) return kErrGeometry;

  constexpr float kInv255 = 1.0f / 255.0f;
  const size_t src_row = static_cast<size_t>(img.w) * 3;
  const size_t frame_row = static_cast<size_t>(frame_w) * 3;
  for (int f = 0; f < t; ++f) {
    float* dst = out + static_cast<size_t>(f) * frame_h * frame_row;
    const uint8_t* src = img.rgb.data() + static_cast<size_t>(f) * frame_row;
    for (int y = 0; y < frame_h; ++y) {
      const uint8_t* s = src + static_cast<size_t>(y) * src_row;
      float* d = dst + static_cast<size_t>(y) * frame_row;
      for (size_t i = 0; i < frame_row; ++i) d[i] = s[i] * kInv255;
    }
  }
  return t;
}

}  // extern "C"
