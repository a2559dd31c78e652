// jpegroi: region-of-interest JPEG decode + PIL-style triangle resize.
//
// The pretrain input pipeline crops a random box out of a 720x1280 frame and
// resizes it to 224x224; decoding the whole frame first wastes most of the
// DCT work. libjpeg-turbo can (a) scale 1/d in the DCT domain and (b) decode
// only a horizontal band (jpeg_crop_scanline) and skip rows
// (jpeg_skip_scanlines). This library fuses decode(crop, scale) + the same
// separable triangle filter PIL uses for Image.resize(BILINEAR) (support
// widens with the downscale factor, i.e. antialiased), so the Python side
// gets the finished [out_h, out_w, 3] uint8 crop in one call.
//
// The decoded band is widened by the filter support on every side (clamped
// to the image bounds): PIL's Image.resize(box=...) samples real image
// pixels *outside* the crop box wherever the triangle window extends past
// it, so the band must cover that margin for exact parity at max_denom=1.
//
// C ABI (ctypes bindings in pixflow_tpu/data/jpegroi.py):
//   jr_header(buf, len, &w, &h)                         -> 0 on success
//   jr_decode_crop_resize(buf, len, x, y, w, h,
//                         out_w, out_h, max_denom, out) -> 0 on success
// (x, y, w, h) is the crop box in original-image pixels; max_denom bounds
// the DCT-domain downscale (1 = always decode the band at full resolution).

#include <cstddef>
#include <cstdio>  // jpeglib.h needs size_t/FILE declared first
#include <jpeglib.h>
#include <setjmp.h>

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

void err_silent(j_common_ptr, int) {}
void err_silent_msg(j_common_ptr) {}

// PIL-style separable triangle filter: for output index i, the source
// center is box0 + (i + 0.5) * scale, support = max(scale, 1).
struct Span {
  int start;
  std::vector<float> w;
};

std::vector<Span> coeffs(int out_size, double box0, double box_len,
                         int in_size) {
  std::vector<Span> spans(out_size);
  double scale = box_len / out_size;
  double support = std::max(scale, 1.0);
  for (int i = 0; i < out_size; ++i) {
    double center = box0 + (i + 0.5) * scale;
    int lo = std::max(0, (int)std::floor(center - support));
    int hi = std::min(in_size, (int)std::ceil(center + support));
    if (hi <= lo) {  // degenerate: clamp to nearest texel
      lo = std::min(std::max(0, (int)center), in_size - 1);
      hi = lo + 1;
    }
    Span& s = spans[i];
    s.start = lo;
    s.w.resize(hi - lo);
    double total = 0.0;
    for (int k = lo; k < hi; ++k) {
      double d = (k + 0.5 - center) / std::max(scale, 1.0);
      double v = std::max(0.0, 1.0 - std::fabs(d));
      s.w[k - lo] = (float)v;
      total += v;
    }
    if (total <= 0.0) {  // all-zero window: nearest fallback
      s.w.assign(s.w.size(), 0.f);
      s.w[std::min<size_t>(s.w.size() - 1,
                           (size_t)std::max(0.0, center - lo))] = 1.f;
      total = 1.0;
    }
    for (auto& v : s.w) v = (float)(v / total);
  }
  return spans;
}

// Everything the libjpeg error path can interrupt. The band buffer lives
// here — OUTSIDE the setjmp frame — so a longjmp from a corrupt JPEG
// mid-decode never skips a std::vector destructor (the decode helper below
// keeps only trivially-destructible locals).
struct BandResult {
  std::vector<unsigned char> band;
  int band_w = 0, band_h = 0;
  // crop box in scaled (1/denom) coordinates, band-relative
  double bx = 0, by = 0, bw = 0, bh = 0;
};

// Decode the (support-widened) band covering the crop box. All jpeg calls
// and the setjmp target are confined to this function; its locals are all
// trivially destructible, so the longjmp error path is well-defined.
int decode_band(const unsigned char* buf, long len, int x, int y, int w,
                int h, int out_w, int out_h, int max_denom, BandResult* res) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.emit_message = err_silent;
  jerr.pub.output_message = err_silent_msg;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);

  if (x < 0 || y < 0 || x + w > (int)cinfo.image_width ||
      y + h > (int)cinfo.image_height) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }

  // DCT-domain downscale: largest 1/d with the scaled crop still >= target
  int denom = 1;
  while (denom * 2 <= max_denom && w / (denom * 2) >= out_w &&
         h / (denom * 2) >= out_h)
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = (unsigned int)denom;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const double inv = 1.0 / denom;
  // crop box in scaled coordinates (float-exact; the decode band below is
  // integer-aligned and we resample against the fractional box)
  const double bx = x * inv, by = y * inv, bw = w * inv, bh = h * inv;
  // filter support in scaled pixels; the band is widened by this margin so
  // out-of-box source pixels are available, exactly as PIL sees them
  const double sup_x = std::max(bw / out_w, 1.0);
  const double sup_y = std::max(bh / out_h, 1.0);

  JDIMENSION xoff = (JDIMENSION)std::max(0.0, std::floor(bx - sup_x));
  JDIMENSION xend = std::min<JDIMENSION>(
      cinfo.output_width, (JDIMENSION)std::ceil(bx + bw + sup_x));
  JDIMENSION xw = xend - xoff;
  jpeg_crop_scanline(&cinfo, &xoff, &xw);  // may widen to iMCU boundary

  int sy0 = std::max(0, (int)std::floor(by - sup_y));
  int sy1 = std::min<int>((int)cinfo.output_height,
                          (int)std::ceil(by + bh + sup_y));
  if (sy0 > 0) jpeg_skip_scanlines(&cinfo, (JDIMENSION)sy0);

  const int band_h = sy1 - sy0;
  const int band_w = (int)xw;
  res->band.resize((size_t)band_h * band_w * 3);
  for (int r = 0; r < band_h; ++r) {
    JSAMPROW row = res->band.data() + (size_t)r * band_w * 3;
    if (jpeg_read_scanlines(&cinfo, &row, 1) != 1) {
      jpeg_destroy_decompress(&cinfo);
      return 4;
    }
  }
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  res->band_w = band_w;
  res->band_h = band_h;
  res->bx = bx - (double)xoff;
  res->by = by - (double)sy0;
  res->bw = bw;
  res->bh = bh;
  return 0;
}

}  // namespace

extern "C" int jr_header(const unsigned char* buf, long len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.emit_message = err_silent;
  jerr.pub.output_message = err_silent_msg;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *w = (int)cinfo.image_width;
  *h = (int)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

extern "C" int jr_decode_crop_resize(const unsigned char* buf, long len,
                                     int x, int y, int w, int h, int out_w,
                                     int out_h, int max_denom,
                                     unsigned char* out) {
  if (w <= 0 || h <= 0 || out_w <= 0 || out_h <= 0) return 2;
  BandResult res;
  int rc = decode_band(buf, len, x, y, w, h, out_w, out_h, max_denom, &res);
  if (rc != 0) return rc;

  const int band_w = res.band_w, band_h = res.band_h;
  // separable triangle resize of the fractional box (band-relative; band
  // carries the support margin, so windows only clamp at true image edges)
  auto xs = coeffs(out_w, res.bx, res.bw, band_w);
  auto ys = coeffs(out_h, res.by, res.bh, band_h);

  // float band once: the passes below are then contiguous float SAXPY /
  // small-tap accumulations that -O3 auto-vectorizes (the previous
  // uint8-strided gather loops cost more than the JPEG decode itself)
  const size_t band_elems = (size_t)band_h * band_w * 3;
  std::vector<float> bandf(band_elems);
  for (size_t i = 0; i < band_elems; ++i)
    bandf[i] = (float)res.band[i];
  res.band.clear();
  res.band.shrink_to_fit();

  // vertical pass (row SAXPY over the full contiguous row width):
  // [band_h, band_w*3] -> [out_h, band_w*3]
  const int w3 = band_w * 3;
  std::vector<float> vert((size_t)out_h * w3);
  for (int r = 0; r < out_h; ++r) {
    const Span& s = ys[r];
    float* dst = vert.data() + (size_t)r * w3;
    std::memset(dst, 0, sizeof(float) * w3);
    for (size_t k = 0; k < s.w.size(); ++k) {
      const float wk = s.w[k];
      const float* srow = bandf.data() + (size_t)(s.start + k) * w3;
      for (int i = 0; i < w3; ++i) dst[i] += wk * srow[i];
    }
  }

  // horizontal pass on the reduced [out_h] rows -> out uint8
  for (int r = 0; r < out_h; ++r) {
    const float* src = vert.data() + (size_t)r * w3;
    unsigned char* dst = out + (size_t)r * out_w * 3;
    for (int i = 0; i < out_w; ++i) {
      const Span& s = xs[i];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const float* p = src + (size_t)s.start * 3;
      for (size_t k = 0; k < s.w.size(); ++k, p += 3) {
        acc0 += s.w[k] * p[0];
        acc1 += s.w[k] * p[1];
        acc2 += s.w[k] * p[2];
      }
      dst[i * 3 + 0] = (unsigned char)std::min(
          255L, std::max(0L, std::lround(acc0)));
      dst[i * 3 + 1] = (unsigned char)std::min(
          255L, std::max(0L, std::lround(acc1)));
      dst[i * 3 + 2] = (unsigned char)std::min(
          255L, std::max(0L, std::lround(acc2)));
    }
  }
  return 0;
}
