// Native host-side data loader: threaded JPEG/PNG decode + affine crop.
//
// The TPU input pipeline is host-bound: per-item image decode and the
// bilinear bbox crop dominate loader time (the reference does both in
// Python workers via cv2, pocolib/dataset/base_dataset.py:276-283 /
// image_utils.py:189-206). This module provides the same two operations
// as a C ABI shared library with an internal thread pool so a whole
// batch decodes+crops in one call:
//
//   poco_decode_image         one image (JPEG or PNG), RGB uint8 out
//   poco_affine_crop          one crop,   float32 RGB out (cv2-parity
//                             bilinear, BORDER_CONSTANT=0)
//   poco_batch_decode_crop    N files -> (N, R, R, 3) float32 batch,
//                             parallel across a thread pool
//
// Built by poco_tpu/runtime/loader.py with:
//   g++ -O3 -shared -fPIC poco_loader.cpp -o libpoco_loader.so \
//       -ljpeg [-lpng -DPOCO_HAS_PNG]
// (PNG support is compiled in when libpng is present; the builder
// retries without it so JPEG keeps working on libpng-less hosts.)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

#include <jpeglib.h>
#ifdef POCO_HAS_PNG
#include <png.h>
#endif

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}


// Scan JPEG APP1 for the EXIF Orientation tag (0x0112). Returns the
// orientation value (1..8) or 1 when absent/unparseable.
int exif_orientation(const uint8_t* d, size_t n) {
  if (n < 4 || d[0] != 0xFF || d[1] != 0xD8) return 1;
  size_t i = 2;
  while (i + 4 <= n) {
    if (d[i] != 0xFF) return 1;
    const uint8_t marker = d[i + 1];
    if (marker == 0xDA || marker == 0xD9) return 1;  // SOS/EOI: no EXIF
    const size_t seg = (static_cast<size_t>(d[i + 2]) << 8) | d[i + 3];
    if (seg < 2 || i + 2 + seg > n) return 1;
    if (marker == 0xE1 && seg >= 16 &&
        std::memcmp(d + i + 4, "Exif\0\0", 6) == 0) {
      const uint8_t* t = d + i + 10;          // TIFF header
      const size_t tn = seg - 8;
      if (tn < 8) return 1;
      const bool le = t[0] == 'I';
      auto rd16 = [&](size_t off) -> uint32_t {
        return le ? (t[off] | (t[off + 1] << 8))
                  : ((t[off] << 8) | t[off + 1]);
      };
      auto rd32 = [&](size_t off) -> uint32_t {
        return le ? (t[off] | (t[off + 1] << 8) | (t[off + 2] << 16) |
                     (static_cast<uint32_t>(t[off + 3]) << 24))
                  : ((static_cast<uint32_t>(t[off]) << 24) |
                     (t[off + 1] << 16) | (t[off + 2] << 8) | t[off + 3]);
      };
      const size_t ifd = rd32(4);
      if (ifd + 2 > tn) return 1;
      const uint32_t count = rd16(ifd);
      for (uint32_t e = 0; e < count; ++e) {
        const size_t off = ifd + 2 + 12 * static_cast<size_t>(e);
        if (off + 12 > tn) return 1;
        if (rd16(off) == 0x0112) {
          const uint32_t v = rd16(off + 8);
          return (v >= 1 && v <= 8) ? static_cast<int>(v) : 1;
        }
      }
      return 1;
    }
    i += 2 + seg;
  }
  return 1;
}

// Decode a JPEG byte buffer to RGB8. Returns 0 on success,
// -1 decode error, -2 over max size, -4 EXIF-rotated (caller
// must fall back to an EXIF-aware decoder, e.g. cv2).
int decode_jpeg_impl(const uint8_t* data, size_t size, uint8_t* out,
                     int max_h, int max_w, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  if (exif_orientation(data, size) != 1) return -4;
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (h > max_h || w > max_w) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *out_h = h;
  *out_w = w;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}


// Decode into a resizable buffer sized from the JPEG header (so worker
// threads allocate per-image, not 48 MB up front). Same status codes.
int decode_jpeg_vec(const uint8_t* data, size_t size,
                    std::vector<uint8_t>& out_vec,
                    int max_h, int max_w, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  if (exif_orientation(data, size) != 1) return -4;
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (h > max_h || w > max_w) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  if (out_vec.size() < static_cast<size_t>(h) * w * 3)
    out_vec.resize(static_cast<size_t>(h) * w * 3);
  *out_h = h;
  *out_w = w;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        out_vec.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

#ifdef POCO_HAS_PNG
struct PngMemSrc {
  const uint8_t* data;
  size_t size;
  size_t off;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngMemSrc* src = static_cast<PngMemSrc*>(png_get_io_ptr(png));
  if (src->off + n > src->size) png_error(png, "truncated PNG");
  std::memcpy(out, src->data + src->off, n);
  src->off += n;
}

// Decode a PNG byte buffer to RGB8 with the classic libpng read API.
// The transform set mirrors cv2.imread(IMREAD_COLOR) — the fallback
// path that defines parity here:
//   * palette / low-bit gray expand to 8-bit RGB
//   * alpha is DROPPED (no background compositing)
//   * gAMA/cHRM/sRGB/iCCP chunks are IGNORED (no gamma conversion —
//     the simplified png_image API would color-manage to sRGB and
//     diverge from cv2 on gamma-tagged files)
//   * 16-bit files are rejected (-5): libpng and cv2 disagree on the
//     16->8 conversion, so they take the cv2 path
// Same status codes as the JPEG decoder.
int decode_png_vec(const uint8_t* data, size_t size,
                   std::vector<uint8_t>& out_vec,
                   int max_h, int max_w, int* out_h, int* out_w) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  // NOTE: no C++ objects with destructors may live in this scope —
  // png_error longjmps here, skipping destructors. The row-pointer
  // vector lives in a helper scope below, after the last png_* call
  // that can error is inside it... so keep everything needed for
  // cleanup in POD form and let out_vec (caller-owned) hold pixels.
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  PngMemSrc src{data, size, 0};
  png_set_read_fn(png, &src, png_mem_read);
  png_read_info(png, info);

  const png_uint_32 w32 = png_get_image_width(png, info);
  const png_uint_32 h32 = png_get_image_height(png, info);
  const int bit_depth = png_get_bit_depth(png, info);
  const int color_type = png_get_color_type(png, info);
  if (bit_depth == 16) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;
  }
  if (h32 > static_cast<png_uint_32>(max_h) ||
      w32 > static_cast<png_uint_32>(max_w)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);  // cv2 drops alpha; never composite
  png_set_interlace_handling(png);
  png_read_update_info(png, info);

  const int h = static_cast<int>(h32);
  const int w = static_cast<int>(w32);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  if (out_vec.size() < static_cast<size_t>(h) * w * 3)
    out_vec.resize(static_cast<size_t>(h) * w * 3);
  // Raw row-pointer array (not std::vector: longjmp above would leak
  // past destructors mid-read). Freed on both paths.
  png_bytep* rows = static_cast<png_bytep*>(
      std::malloc(sizeof(png_bytep) * h));
  if (!rows) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  for (int i = 0; i < h; ++i)
    rows[i] = out_vec.data() + static_cast<size_t>(i) * w * 3;
  if (setjmp(png_jmpbuf(png))) {
    std::free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_read_image(png, rows);
  std::free(rows);
  png_destroy_read_struct(&png, &info, nullptr);
  *out_h = h;
  *out_w = w;
  return 0;
}
#endif  // POCO_HAS_PNG

inline bool is_png(const uint8_t* d, size_t n) {
  static const uint8_t kMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                    0x1A, '\n'};
  return n >= 8 && std::memcmp(d, kMagic, 8) == 0;
}

inline bool is_jpeg(const uint8_t* d, size_t n) {
  return n >= 3 && d[0] == 0xFF && d[1] == 0xD8 && d[2] == 0xFF;
}

// Content-sniffing dispatch (extensions lie; magic bytes do not).
// -5 = unsupported container format.
int decode_image_vec(const uint8_t* data, size_t size,
                     std::vector<uint8_t>& out_vec,
                     int max_h, int max_w, int* out_h, int* out_w) {
  if (is_jpeg(data, size))
    return decode_jpeg_vec(data, size, out_vec, max_h, max_w, out_h, out_w);
#ifdef POCO_HAS_PNG
  if (is_png(data, size))
    return decode_png_vec(data, size, out_vec, max_h, max_w, out_h, out_w);
#endif
  return -5;
}

// cv2-parity bilinear sample with BORDER_CONSTANT=0.
inline void sample_bilinear(const uint8_t* img, int h, int w,
                            float x, float y, float* rgb) {
  const int x0 = static_cast<int>(std::floor(x));
  const int y0 = static_cast<int>(std::floor(y));
  const float wx = x - x0;
  const float wy = y - y0;
  if (x0 >= 0 && y0 >= 0 && x0 + 1 < w && y0 + 1 < h) {
    // Fast interior path: all four taps in bounds, no branches.
    const uint8_t* p0 = img + (static_cast<size_t>(y0) * w + x0) * 3;
    const uint8_t* p1 = p0 + static_cast<size_t>(w) * 3;
    const float f00 = (1.f - wy) * (1.f - wx);
    const float f01 = (1.f - wy) * wx;
    const float f10 = wy * (1.f - wx);
    const float f11 = wy * wx;
    rgb[0] = f00 * p0[0] + f01 * p0[3] + f10 * p1[0] + f11 * p1[3];
    rgb[1] = f00 * p0[1] + f01 * p0[4] + f10 * p1[1] + f11 * p1[4];
    rgb[2] = f00 * p0[2] + f01 * p0[5] + f10 * p1[2] + f11 * p1[5];
    return;
  }
  for (int c = 0; c < 3; ++c) rgb[c] = 0.f;
  for (int dy = 0; dy < 2; ++dy) {
    const int yy = y0 + dy;
    if (yy < 0 || yy >= h) continue;
    const float fy = dy ? wy : 1.f - wy;
    for (int dx = 0; dx < 2; ++dx) {
      const int xx = x0 + dx;
      if (xx < 0 || xx >= w) continue;
      const float f = fy * (dx ? wx : 1.f - wx);
      const uint8_t* p = img + (static_cast<size_t>(yy) * w + xx) * 3;
      rgb[0] += f * p[0];
      rgb[1] += f * p[1];
      rgb[2] += f * p[2];
    }
  }
}

void affine_crop_impl(const uint8_t* img, int h, int w, float cx, float cy,
                      float bbox_size, int out_res, float* out) {
  const float scale = bbox_size / out_res;
  for (int i = 0; i < out_res; ++i) {
    const float sy = (i - out_res * 0.5f) * scale + cy;
    for (int j = 0; j < out_res; ++j) {
      const float sx = (j - out_res * 0.5f) * scale + cx;
      sample_bilinear(img, h, w,
                      sx, sy,
                      out + (static_cast<size_t>(i) * out_res + j) * 3);
    }
  }
}

// General 2x3 output->source affine warp (rotation / flip / scale encoded
// in the matrix, built host-side with the same cv2-convention math as the
// Python path) + per-channel gain with [0,255] clamp (channel-noise aug).
void affine_warp_impl(const uint8_t* img, int h, int w, const float* m,
                      const float* gain, int out_res, float* out) {
  const float g0 = gain[0], g1 = gain[1], g2 = gain[2];
  for (int i = 0; i < out_res; ++i) {
    // Source coordinates advance by a constant step along the row.
    float sx = m[1] * i + m[2];
    float sy = m[4] * i + m[5];
    float* px = out + static_cast<size_t>(i) * out_res * 3;
    for (int j = 0; j < out_res; ++j, px += 3, sx += m[0], sy += m[3]) {
      sample_bilinear(img, h, w, sx, sy, px);
      px[0] = std::min(std::max(px[0] * g0, 0.f), 255.f);
      px[1] = std::min(std::max(px[1] * g1, 0.f), 255.f);
      px[2] = std::min(std::max(px[2] * g2, 0.f), 255.f);
    }
  }
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  // reject ftell errors and absurd sizes (a mislabeled multi-GB file
  // must become statuses=-3, not a bad_alloc out of a worker thread)
  if (size < 0 || size > (512L << 20)) {
    std::fclose(f);
    return buf;
  }
  buf.resize(static_cast<size_t>(size));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  std::fclose(f);
  return buf;
}

}  // namespace

extern "C" {

int poco_decode_jpeg(const uint8_t* data, size_t size, uint8_t* out,
                     int max_h, int max_w, int* out_h, int* out_w) {
  return decode_jpeg_impl(data, size, out, max_h, max_w, out_h, out_w);
}

// 1 when PNG decode was compiled in (libpng present at build time).
int poco_has_png(void) {
#ifdef POCO_HAS_PNG
  return 1;
#else
  return 0;
#endif
}

// Format-sniffing single-image decode (JPEG or PNG) into a caller
// buffer of at least max_h*max_w*3 bytes, rows packed at stride w*3.
int poco_decode_image(const uint8_t* data, size_t size, uint8_t* out,
                      int max_h, int max_w, int* out_h, int* out_w) {
  if (is_jpeg(data, size))
    return decode_jpeg_impl(data, size, out, max_h, max_w, out_h, out_w);
#ifdef POCO_HAS_PNG
  if (is_png(data, size)) {
    std::vector<uint8_t> buf;
    const int rc =
        decode_png_vec(data, size, buf, max_h, max_w, out_h, out_w);
    if (rc == 0)
      std::memcpy(out, buf.data(),
                  static_cast<size_t>(*out_h) * *out_w * 3);
    return rc;
  }
#endif
  return -5;
}

void poco_affine_crop(const uint8_t* img, int h, int w, float cx, float cy,
                      float bbox_size, int out_res, float* out) {
  affine_crop_impl(img, h, w, cx, cy, bbox_size, out_res, out);
}

// Decode + crop a batch of JPEG files in parallel.
//   paths: n C strings; centers: (n, 2); bbox_sizes: (n,)
//   out: (n, out_res, out_res, 3) float32
//   statuses: (n,) int (0 ok, negative = decode failure)
void poco_batch_decode_crop(const char** paths, int n,
                            const float* centers, const float* bbox_sizes,
                            int out_res, int max_h, int max_w,
                            float* out, int* statuses, int num_threads) {
  if (num_threads < 1) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads < 1) num_threads = 1;
  }
  num_threads = std::min(num_threads, n);

  auto worker = [&](int tid) {
    // reused per-thread buffer, grown to the largest image actually
    // seen (NOT max_h*max_w*3 = 48 MB up front)
    std::vector<uint8_t> decode_buf;
    for (int i = tid; i < n; i += num_threads) {
      try {
      std::vector<uint8_t> bytes = read_file(paths[i]);
      if (bytes.empty()) {
        statuses[i] = -3;
        continue;
      }
      int h = 0, w = 0;
      const int rc = decode_image_vec(bytes.data(), bytes.size(),
                                      decode_buf, max_h, max_w, &h, &w);
      statuses[i] = rc;
      if (rc != 0) continue;
      affine_crop_impl(decode_buf.data(), h, w,
                       centers[2 * i], centers[2 * i + 1], bbox_sizes[i],
                       out_res,
                       out + static_cast<size_t>(i) * out_res * out_res * 3);
      } catch (...) {
        statuses[i] = -3;  // no exception may escape a worker thread
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
}

// Decode + general affine warp of a batch of JPEG files in parallel —
// the whole-batch training input path (augmented crops).
//   affines: (n, 6) row-major 2x3 output->source matrices
//   gains:   (n, 3) per-channel multipliers (clamped to [0, 255])
//   dims:    (n, 2) int32 out — decoded (h, w) per image
void poco_batch_decode_affine(const char** paths, int n,
                              const float* affines, const float* gains,
                              int out_res, int max_h, int max_w,
                              float* out, int* statuses, int* dims,
                              int num_threads) {
  if (num_threads < 1) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads < 1) num_threads = 1;
  }
  num_threads = std::min(num_threads, n);

  auto worker = [&](int tid) {
    // reused per-thread buffer, grown to the largest image actually
    // seen (NOT max_h*max_w*3 = 48 MB up front)
    std::vector<uint8_t> decode_buf;
    for (int i = tid; i < n; i += num_threads) {
      try {
      std::vector<uint8_t> bytes = read_file(paths[i]);
      if (bytes.empty()) {
        statuses[i] = -3;
        continue;
      }
      int h = 0, w = 0;
      const int rc = decode_image_vec(bytes.data(), bytes.size(),
                                      decode_buf, max_h, max_w, &h, &w);
      statuses[i] = rc;
      if (rc != 0) continue;
      dims[2 * i] = h;
      dims[2 * i + 1] = w;
      affine_warp_impl(decode_buf.data(), h, w,
                       affines + 6 * i, gains + 3 * i, out_res,
                       out + static_cast<size_t>(i) * out_res * out_res * 3);
      } catch (...) {
        statuses[i] = -3;  // no exception may escape a worker thread
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
  for (auto& t : threads) t.join();
}

}  // extern "C"
