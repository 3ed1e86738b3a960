// Native image decode for the host data pipeline: PNG (libpng) / JPEG
// (libjpeg) -> float32 BGR(A) in [0,1], the exact tensor
// data/pipeline.py::load_image_bgr produces (cv2.imread(UNCHANGED)/255
// semantics, reference utils/data_loaders.py:71).
//
// Why native: the decode AND the uint8->float BGR conversion run here
// with the GIL released, so the loader's NUM_WORKER threads scale on
// real cores instead of serializing on numpy conversion passes.
//
// Build: g++ -O3 -shared -fPIC imgcodec.cc -lpng -ljpeg -o imgcodec.so
// (driven by native/runtime.py, which falls back to PIL when libs or a
// compiler are missing).

#include <png.h>

#include <csetjmp>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>

extern "C" {
// Decodes buf[0:n] into a malloc'd float32 buffer (*out_data), writing
// [height, width, channels] into out_dims (channels 3 or 4, BGR(A)).
// Returns 0 on success, < 0 on error.  Caller frees via imgcodec_free.
long imgcodec_decode(const unsigned char* buf, long n, float** out_data,
                     long* out_dims);
void imgcodec_free(float* p);
}

void imgcodec_free(float* p) { free(p); }

static long decode_png(const unsigned char* buf, long n, float** out,
                       long* dims) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, (size_t)n)) return -2;
  if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    // 16-bit PNG: bail out so the caller's PIL fallback decides the
    // semantics instead of silently down-converting to 8 bits
    png_image_free(&image);
    return -7;
  }
  const int has_alpha = (image.format & PNG_FORMAT_FLAG_ALPHA) ? 1 : 0;
  // the simplified API converts gray/palette to BGR(A) for us, matching
  // load_image_bgr's gray->3ch stacking
  image.format = has_alpha ? PNG_FORMAT_BGRA : PNG_FORMAT_BGR;
  const int c = has_alpha ? 4 : 3;
  const size_t stride = (size_t)image.width * c;
  const size_t count = stride * image.height;
  unsigned char* raw = (unsigned char*)malloc(count);
  if (!raw) {
    png_image_free(&image);
    return -3;
  }
  if (!png_image_finish_read(&image, nullptr, raw, (png_int_32)stride,
                             nullptr)) {
    free(raw);
    return -4;
  }
  float* f = (float*)malloc(count * sizeof(float));
  if (!f) {
    free(raw);
    return -3;
  }
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < count; i++) f[i] = raw[i] * inv;
  free(raw);
  dims[0] = image.height;
  dims[1] = image.width;
  dims[2] = c;
  *out = f;
  return 0;
}

namespace {
struct JerrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  JerrMgr* e = (JerrMgr*)cinfo->err;
  longjmp(e->jb, 1);
}
}  // namespace

static long decode_jpeg(const unsigned char* buf, long n, float** out,
                        long* dims) {
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  // volatile: modified between setjmp and longjmp (C11 7.13.2.1) — the
  // error path must free the REAL pointers, not register-restored ones
  unsigned char* volatile row = nullptr;
  float* volatile f = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    free(row);
    free(f);
    return -5;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // gray upsamples to RGB too
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  row = (unsigned char*)malloc((size_t)w * 3);
  f = (float*)malloc((size_t)w * h * 3 * sizeof(float));
  if (!row || !f) {
    jpeg_destroy_decompress(&cinfo);
    free(row);
    free(f);
    return -3;
  }
  const float inv = 1.0f / 255.0f;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rp = row;
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = f + (size_t)y * w * 3;
    for (int x = 0; x < w; x++) {  // RGB -> BGR
      dst[x * 3 + 0] = row[x * 3 + 2] * inv;
      dst[x * 3 + 1] = row[x * 3 + 1] * inv;
      dst[x * 3 + 2] = row[x * 3 + 0] * inv;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(row);
  dims[0] = h;
  dims[1] = w;
  dims[2] = 3;
  *out = f;
  return 0;
}

long imgcodec_decode(const unsigned char* buf, long n, float** out_data,
                     long* out_dims) {
  if (n < 4 || !buf || !out_data || !out_dims) return -1;
  if (buf[0] == 0x89 && buf[1] == 'P' && buf[2] == 'N' && buf[3] == 'G')
    return decode_png(buf, n, out_data, out_dims);
  if (buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf, n, out_data, out_dims);
  return -6;  // unknown format -> caller falls back to PIL
}

// Half-pixel-aligned bilinear resize (cv2 INTER_LINEAR semantics, matching
// transforms.resize_bilinear_np): src [h, w, c] float32 -> dst [oh, ow, c].
// Runs with the GIL released (ctypes), so loader threads scale on cores.
// Returns 0 on success, -1 on allocation failure (dst untouched — the
// Python wrapper falls back to the numpy path).
extern "C" long imgcodec_resize_bilinear(const float* src, long h, long w,
                                         long c, float* dst, long oh,
                                         long ow) {
  const float sy = (float)h / (float)oh;
  const float sx = (float)w / (float)ow;
  // precompute x-axis taps once per row sweep
  long* x0s = (long*)malloc(sizeof(long) * ow);
  long* x1s = (long*)malloc(sizeof(long) * ow);
  float* wxs = (float*)malloc(sizeof(float) * ow);
  if (!x0s || !x1s || !wxs) {
    free(x0s);
    free(x1s);
    free(wxs);
    return -1;
  }
  for (long ox = 0; ox < ow; ox++) {
    float xs = ((float)ox + 0.5f) * sx - 0.5f;
    if (xs < 0.0f) xs = 0.0f;
    if (xs > (float)(w - 1)) xs = (float)(w - 1);
    long x0 = (long)xs;
    x0s[ox] = x0;
    x1s[ox] = x0 + 1 < w ? x0 + 1 : w - 1;
    wxs[ox] = xs - (float)x0;
  }
  for (long oy = 0; oy < oh; oy++) {
    float ys = ((float)oy + 0.5f) * sy - 0.5f;
    if (ys < 0.0f) ys = 0.0f;
    if (ys > (float)(h - 1)) ys = (float)(h - 1);
    const long y0 = (long)ys;
    const long y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const float wy = ys - (float)y0;
    const float* r0 = src + (size_t)y0 * w * c;
    const float* r1 = src + (size_t)y1 * w * c;
    float* out = dst + (size_t)oy * ow * c;
    for (long ox = 0; ox < ow; ox++) {
      const float* p00 = r0 + (size_t)x0s[ox] * c;
      const float* p01 = r0 + (size_t)x1s[ox] * c;
      const float* p10 = r1 + (size_t)x0s[ox] * c;
      const float* p11 = r1 + (size_t)x1s[ox] * c;
      const float wx = wxs[ox];
      for (long ch = 0; ch < c; ch++) {
        const float top = p00[ch] * (1.0f - wx) + p01[ch] * wx;
        const float bot = p10[ch] * (1.0f - wx) + p11[ch] * wx;
        out[ox * c + ch] = top * (1.0f - wy) + bot * wy;
      }
    }
  }
  free(x0s);
  free(x1s);
  free(wxs);
  return 0;
}
