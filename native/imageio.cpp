// fastmatch-tpu native image I/O (first-party C++, no OpenCV).
//
// The reference's native surface is OpenCV's C++ (SIFT + image decode);
// the TPU build replaces SIFT with XLA (features/sift.py) and the host-side
// decode path with this library: JPEG (libjpeg), PNG (libpng), and PGM/PPM,
// decoded straight to grayscale float32 in [0,1] with optional bilinear
// resize — the exact tensor the detector ingests, so the host never touches
// uint8 HWC intermediates in Python.
//
// C ABI (ctypes-friendly); all functions return 0 on success.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cstdint>

#include <jpeglib.h>
#include <png.h>

extern "C" {

struct FmImage {
  float* data;  // grayscale, row-major, [0,1]
  int w;
  int h;
};

static float* alloc_f(int n) { return (float*)malloc(sizeof(float) * n); }

// ---------- JPEG ----------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = (JpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

static int load_jpeg(FILE* f, FmImage* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;  // libjpeg does the BT.601 mix
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  out->data = alloc_f(w * h);
  out->w = w;
  out->h = h;
  unsigned char* row = (unsigned char*)malloc(w);
  for (int y = 0; y < h; y++) {
    unsigned char* rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
    float* dst = out->data + (size_t)y * w;
    for (int x = 0; x < w; x++) dst[x] = row[x] * (1.0f / 255.0f);
  }
  free(row);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------- PNG ----------

static int load_png(FILE* f, FmImage* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return 2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);  // BT.601, error action 1
  png_read_update_info(png, info);
  out->data = alloc_f(w * h);
  out->w = (int)w;
  out->h = (int)h;
  unsigned char* row = (unsigned char*)malloc(png_get_rowbytes(png, info));
  for (png_uint_32 y = 0; y < h; y++) {
    png_read_row(png, row, nullptr);
    float* dst = out->data + (size_t)y * w;
    for (png_uint_32 x = 0; x < w; x++) dst[x] = row[x] * (1.0f / 255.0f);
  }
  free(row);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------- PGM / PPM (P5 / P6 binary) ----------

static int pnm_token(FILE* f, char* buf, int cap) {
  int c;
  do {
    c = fgetc(f);
    if (c == '#') {
      while (c != '\n' && c != EOF) c = fgetc(f);
    }
  } while (c == ' ' || c == '\t' || c == '\n' || c == '\r');
  int i = 0;
  while (c != EOF && c > ' ' && i < cap - 1) {
    buf[i++] = (char)c;
    c = fgetc(f);
  }
  buf[i] = 0;
  return i > 0 ? 0 : 1;
}

static int load_pnm(FILE* f, FmImage* out) {
  char tok[64];
  if (pnm_token(f, tok, 64)) return 2;
  int chans;
  if (!strcmp(tok, "P5")) chans = 1;
  else if (!strcmp(tok, "P6")) chans = 3;
  else return 2;
  if (pnm_token(f, tok, 64)) return 2;
  int w = atoi(tok);
  if (pnm_token(f, tok, 64)) return 2;
  int h = atoi(tok);
  if (pnm_token(f, tok, 64)) return 2;
  int maxv = atoi(tok);
  if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return 2;
  size_t n = (size_t)w * h * chans;
  unsigned char* raw = (unsigned char*)malloc(n);
  if (fread(raw, 1, n, f) != n) {
    free(raw);
    return 2;
  }
  out->data = alloc_f(w * h);
  out->w = w;
  out->h = h;
  float inv = 1.0f / maxv;
  for (int i = 0; i < w * h; i++) {
    if (chans == 1) {
      out->data[i] = raw[i] * inv;
    } else {
      const unsigned char* p = raw + 3 * (size_t)i;
      out->data[i] = (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]) * inv;
    }
  }
  free(raw);
  return 0;
}

// ---------- public API ----------

int fm_load_gray(const char* path, float** data, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  unsigned char magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  FmImage img{nullptr, 0, 0};
  int rc = 2;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) rc = load_jpeg(f, &img);
  else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) rc = load_png(f, &img);
  else if (got >= 2 && magic[0] == 'P' && (magic[1] == '5' || magic[1] == '6'))
    rc = load_pnm(f, &img);
  fclose(f);
  if (rc == 0) {
    *data = img.data;
    *w = img.w;
    *h = img.h;
  } else if (img.data) {
    free(img.data);
  }
  return rc;
}

// Bilinear resize (separate so callers can batch-normalize sizes for the
// static-shape detector).
int fm_resize_bilinear(const float* src, int sw, int sh, float* dst, int dw, int dh) {
  if (!src || !dst || sw <= 0 || sh <= 0 || dw <= 0 || dh <= 0) return 1;
  const float sx = (float)sw / dw, sy = (float)sh / dh;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      const float* r0 = src + (size_t)y0 * sw;
      const float* r1 = src + (size_t)y1 * sw;
      dst[(size_t)y * dw + x] =
          (1 - wy) * ((1 - wx) * r0[x0] + wx * r0[x1]) +
          wy * ((1 - wx) * r1[x0] + wx * r1[x1]);
    }
  }
  return 0;
}

void fm_free(float* p) { free(p); }

}  // extern "C"
