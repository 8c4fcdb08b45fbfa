// byogan_io: native image decode + batch normalization for the data pipeline.
//
// The reference's data path is torchvision ImageFolder + PIL decode per
// epoch (reference train.py:109-117).  This library replaces the per-image
// Python/PIL hot path with C++: libpng/libjpeg decode straight into caller
// buffers, and fused uint8 -> float32 [-1,1] NHWC normalization with
// per-sample horizontal flip (the transform chain of train.py:43-50).
// Exposed as a plain C ABI consumed via ctypes (byogan_tpu/data/native.py).
//
// Build: python -m byogan_tpu.native.build   (g++ -O3 -shared, links
// libpng/libjpeg/libz; see that module).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>
#include <atomic>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// PNG

// Decode an 8-bit PNG into RGB uint8.  Returns 0 on success; fills *h/*w.
// If out is null, only reports dimensions.  out must hold h*w*3 bytes.
static int decode_png(const char* path, uint8_t* out, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -3; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(fp); return -3; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // Normalize every variant to 8-bit RGB.
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  bool trns = png_get_valid(png, info, PNG_INFO_tRNS);
  if (trns) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // Strip alpha BOTH when the original color type carried it AND when the
  // tRNS conversion above just added it (palette/gray/RGB + transparency) —
  // otherwise 4-channel rows would overflow the 3-channel output buffer.
  if ((color & PNG_COLOR_MASK_ALPHA) || trns) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_channels(png, info) != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -6;  // defensive: never write non-RGB rows into the RGB buffer
  }

  if (out) {
    std::vector<png_bytep> rows(*h);
    for (int y = 0; y < *h; y++) rows[y] = out + (size_t)y * (*w) * 3;
    png_read_image(png, rows.data());
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jmp, 1);
}

static int decode_jpeg(const char* path, uint8_t* out, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return -4;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  if (out) {
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row = out + (size_t)cinfo.output_scanline * (*w) * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
  } else {
    jpeg_abort_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

static bool has_suffix(const char* path, const char* suf) {
  size_t lp = strlen(path), ls = strlen(suf);
  if (ls > lp) return false;
  for (size_t i = 0; i < ls; i++) {
    char a = path[lp - ls + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

// Decode one image (PNG or JPEG by extension) to RGB uint8.
int byogan_decode(const char* path, uint8_t* out, int* h, int* w) {
  if (has_suffix(path, ".png")) return decode_png(path, out, h, w);
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
    return decode_jpeg(path, out, h, w);
  // try PNG then JPEG by content
  if (decode_png(path, out, h, w) == 0) return 0;
  return decode_jpeg(path, out, h, w);
}

// Decode a batch into a contiguous uint8 NHWC buffer (n, h, w, 3).
// Every image must decode to exactly (h, w).  Parallel over `threads`.
// Returns 0 on success, else the first nonzero per-image status.
int byogan_decode_batch(const char** paths, int n, int h, int w,
                        uint8_t* out, int threads) {
  std::atomic<int> next(0), status(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      int ih = 0, iw = 0;
      int rc = byogan_decode(paths[i], out + (size_t)i * h * w * 3, &ih, &iw);
      if (rc == 0 && (ih != h || iw != w)) rc = -5;
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };
  if (threads <= 1 || n <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    int k = threads < n ? threads : n;
    for (int t = 0; t < k; t++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

// Fused normalize: uint8 NHWC (n,h,w,3) -> float32 [-1,1], with per-sample
// horizontal flip where flips[i] != 0 (train.py:43-50 transform chain).
void byogan_normalize(const uint8_t* in, int n, int h, int w,
                      const uint8_t* flips, float* out) {
  static float lut[256];
  static bool lut_ready = false;
  if (!lut_ready) {
    for (int v = 0; v < 256; v++) lut[v] = (float)v * (2.0f / 255.0f) - 1.0f;
    lut_ready = true;
  }
  const size_t row = (size_t)w * 3;
  for (int i = 0; i < n; i++) {
    const uint8_t* src = in + (size_t)i * h * row;
    float* dst = out + (size_t)i * h * row;
    if (flips && flips[i]) {
      for (int y = 0; y < h; y++) {
        const uint8_t* s = src + y * row;
        float* d = dst + y * row;
        for (int x = 0; x < w; x++) {
          const uint8_t* sp = s + (size_t)(w - 1 - x) * 3;
          float* dp = d + (size_t)x * 3;
          dp[0] = lut[sp[0]];
          dp[1] = lut[sp[1]];
          dp[2] = lut[sp[2]];
        }
      }
    } else {
      const size_t count = (size_t)h * row;
      for (size_t j = 0; j < count; j++) dst[j] = lut[src[j]];
    }
  }
}

// Decode + normalize in one call (batch -> float32 [-1,1] NHWC).
int byogan_decode_batch_normalize(const char** paths, int n, int h, int w,
                                  const uint8_t* flips, float* out,
                                  uint8_t* scratch_u8, int threads) {
  int rc = byogan_decode_batch(paths, n, h, w, scratch_u8, threads);
  if (rc != 0) return rc;
  byogan_normalize(scratch_u8, n, h, w, flips, out);
  return 0;
}

// Encode an RGB uint8 HWC image as PNG.  `compression` is zlib level 0-9
// (PIL defaults to 6; level 1 is ~10x faster at ~15% larger files — the
// right trade for the serving path, byogan_tpu/serve.py).
int byogan_encode_png(const char* path, const uint8_t* data, int h, int w,
                      int compression) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(fp); return -3; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_write_struct(&png, nullptr); fclose(fp); return -3; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return -4;
  }
  png_init_io(png, fp);
  png_set_compression_level(png, compression);
  // Speed-oriented filter heuristic: SUB only (cheap, compresses photos well).
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  for (int y = 0; y < h; y++) {
    png_write_row(png, const_cast<png_bytep>(data + (size_t)y * w * 3));
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

// Encode an RGB uint8 HWC image as JPEG at the given quality (1-100).
// PNG at 512px is zlib-bound (~19 img/s measured on this host, serve.py);
// libjpeg-turbo's SIMD DCT path is an order of magnitude faster at visually
// lossless quality — the opt-in fast lane for bulk serving
// (Sampler.save_stream(format="jpeg"), byogan-generate --format jpeg).
int byogan_encode_jpeg(const char* path, const uint8_t* data, int h, int w,
                       int quality) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    // libjpeg's default error_exit would exit() the whole process (e.g. on
    // a full disk mid-write); return an error code like the PNG paths do.
    jpeg_destroy_compress(&cinfo);
    fclose(fp);
    return -4;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, fp);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row =
        const_cast<JSAMPROW>(data + (size_t)cinfo.next_scanline * w * 3);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(fp);
  return 0;
}

int byogan_abi_version() { return 2; }

}  // extern "C"
