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
//   jr_transcode_restart(buf, len, rows, out, cap, &n)  -> 0 on success
//   jr_restart_rows(buf, len)      -> MCU rows per restart interval (0: none)
//   jr_splice_used()               -> 1 if the last decode on this thread
//                                     took the restart-splice fast path
// (x, y, w, h) is the crop box in original-image pixels; max_denom bounds
// the DCT-domain downscale (1 = always decode the band at full resolution).
//
// Restart-marker fast path: jpeg_skip_scanlines still Huffman-decodes every
// skipped row, so a random-crop band decode pays entropy work proportional
// to the band's BOTTOM edge, not its height — the measured host floor
// (docs/PERF.md). `jr_transcode_restart` losslessly re-wraps a JPEG's DCT
// coefficients with a DRI restart interval of one MCU row at data-prep
// time; restart intervals are independently entropy-decodable, so the
// decoder below splices a valid in-memory JPEG containing ONLY the needed
// MCU rows (header with a patched SOF height + the chosen intervals with
// renumbered RST markers + EOI) and decodes that. Output is bit-identical
// to the non-spliced decode: the splice keeps the resize filter's support
// margin plus one guard MCU row on each side so fancy chroma upsampling
// sees the same neighbor rows.

#include <cstddef>
#include <cstdio>  // jpeglib.h needs size_t/FILE declared first
#include <jpeglib.h>
#include <jerror.h>  // ERREXIT macros for the custom destination manager
#include <setjmp.h>

#include <algorithm>
#include <cmath>
#include <cstdlib>
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

  // long arithmetic: x + w on hostile int32 boxes would signed-overflow
  if (x < 0 || y < 0 || (long)x + w > (long)cinfo.image_width ||
      (long)y + h > (long)cinfo.image_height) {
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

// ---------------------------------------------------------------------------
// Restart-marker fast path (see the header comment).

thread_local int g_splice_used = 0;

struct MarkerScan {
  size_t entropy_start = 0;  // first byte after the SOS header
  size_t height_off = 0;     // absolute offset of the SOF height bytes
  int width = 0, height = 0;
  int mcu_w = 8, mcu_h = 8;  // iMCU size in pixels
  int restart_interval = 0;  // MCUs per restart interval (DRI)
  bool progressive = false;
};

// Lightweight byte-level segment walk of a baseline JPEG header, up to and
// including the SOS header (the entropy stream is NOT scanned here — the
// splice machinery below touches entropy bytes only up to the end of the
// band it extracts). Returns false for anything the splice path can't
// handle (progressive, arithmetic, truncated).
bool scan_header(const unsigned char* b, size_t n, MarkerScan* s) {
  if (n < 4 || b[0] != 0xFF || b[1] != 0xD8) return false;
  size_t p = 2;
  bool got_sof = false;
  while (p + 4 <= n) {
    if (b[p] != 0xFF) return false;
    while (p < n && b[p] == 0xFF) ++p;  // optional fill bytes
    if (p + 2 >= n) return false;
    unsigned m = b[p++];
    if (m == 0xD8 || m == 0x01) continue;  // no payload
    size_t seglen = ((size_t)b[p] << 8) | b[p + 1];
    if (seglen < 2 || p + seglen > n) return false;
    if (m == 0xC0 || m == 0xC1 || m == 0xC2) {  // SOF0/1/2
      s->progressive = (m == 0xC2);
      if (seglen < 8) return false;
      s->height_off = p + 3;
      s->height = ((int)b[p + 3] << 8) | b[p + 4];
      s->width = ((int)b[p + 5] << 8) | b[p + 6];
      int ncomp = b[p + 7];
      if (seglen < (size_t)(8 + 3 * ncomp)) return false;
      int hmax = 1, vmax = 1;
      for (int c = 0; c < ncomp; ++c) {
        int samp = b[p + 9 + 3 * c];
        hmax = std::max(hmax, samp >> 4);
        vmax = std::max(vmax, samp & 15);
      }
      s->mcu_w = 8 * hmax;
      s->mcu_h = 8 * vmax;
      got_sof = true;
    } else if ((m >= 0xC3 && m <= 0xCF) && m != 0xC4 && m != 0xC8 &&
               m != 0xCC) {
      return false;  // arithmetic / lossless / hierarchical SOFs
    } else if (m == 0xDD) {  // DRI
      if (seglen < 4) return false;
      s->restart_interval = ((int)b[p + 2] << 8) | b[p + 3];
    } else if (m == 0xDA) {  // SOS: entropy-coded data follows
      if (!got_sof) return false;
      s->entropy_start = p + seglen;
      return true;
    }
    p += seglen;
  }
  return false;
}

// memchr-driven seek past `count` RST markers starting at entropy offset
// `p`; returns the offset of the interval that follows (0 = not found /
// stream anomaly). 0xFF 0x00 is a stuffed data byte, 0xFF 0xFF a fill byte;
// neither is a marker.
size_t seek_intervals(const unsigned char* b, size_t n, size_t p,
                      long count) {
  long seen = 0;
  while (seen < count) {
    const void* f = std::memchr(b + p, 0xFF, n - p);
    if (f == nullptr) return 0;
    p = (size_t)((const unsigned char*)f - b);
    if (p + 1 >= n) return 0;
    unsigned c = b[p + 1];
    if (c == 0x00) p += 2;
    else if (c == 0xFF) ++p;
    else if (c >= 0xD0 && c <= 0xD7) { ++seen; p += 2; }
    else return 0;  // EOI or another marker before enough intervals
  }
  return p;
}

// Copy `count` restart intervals starting at entropy offset `p` into `out`,
// renumbering the RST markers between them from 0 (the decoder checks the
// mod-8 cycle). Restart intervals reset the DC predictors, so the cut is
// exact. The final interval may be terminated by the stream's EOI (the
// m1 == bottom case); either terminator is accepted, neither is copied.
bool copy_intervals(const unsigned char* b, size_t n, size_t p, long count,
                    std::vector<unsigned char>* out) {
  long done = 0;
  size_t seg = p;
  while (true) {
    const void* f = std::memchr(b + p, 0xFF, n - p);
    if (f == nullptr) return false;
    size_t q = (size_t)((const unsigned char*)f - b);
    if (q + 1 >= n) return false;
    unsigned c = b[q + 1];
    if (c == 0x00) { p = q + 2; continue; }
    if (c == 0xFF) { p = q + 1; continue; }
    out->insert(out->end(), b + seg, b + q);  // interval `done` is complete
    ++done;
    if (c >= 0xD0 && c <= 0xD7) {
      if (done == count) return true;  // cut before the terminating RST
      out->push_back(0xFF);
      out->push_back((unsigned char)(0xD0 | ((done - 1) & 7)));
      p = seg = q + 2;
      continue;
    }
    if (c == 0xD9) return done == count;  // EOI terminates the last interval
    return false;  // any other marker (multi-scan): unsupported
  }
}

// If `buf` is a restart-aligned baseline JPEG, splice out just the MCU rows
// the band decode will touch (crop box + resize support + one guard MCU row
// per side for fancy chroma upsampling). Returns true with the spliced
// stream and the pixel row of its top edge; false = use the original.
bool try_restart_splice(const unsigned char* buf, long len, int y, int w,
                        int h, int out_w, int out_h, int max_denom,
                        std::vector<unsigned char>* spliced, int* row0_px) {
  MarkerScan s;
  const unsigned char* b = buf;
  const size_t n = (size_t)len;
  if (!scan_header(b, n, &s)) return false;
  if (s.progressive || s.restart_interval <= 0 || s.width <= 0 ||
      s.height <= 0)
    return false;
  // hostile boxes: bound y/h against the scanned dims BEFORE any band
  // arithmetic (JPEG dims are u16, so everything below then fits int);
  // decode_band re-validates the full box for the plain path
  if (y < 0 || h <= 0 || w <= 0 || (long)y + h > (long)s.height)
    return false;
  int mcus_per_row = (s.width + s.mcu_w - 1) / s.mcu_w;
  int rows_per_rst;
  if (s.restart_interval % mcus_per_row == 0)
    rows_per_rst = s.restart_interval / mcus_per_row;
  else if (mcus_per_row % s.restart_interval == 0)
    rows_per_rst = 1;  // several restarts per row: every row start aligns
  else
    return false;
  int total_rows = (s.height + s.mcu_h - 1) / s.mcu_h;

  // replicate decode_band's DCT-downscale choice, then the original-pixel
  // band it will read: crop box +/- the resize support (+denom: scaled-
  // coordinate floor/ceil slack), +1 guard MCU row per side so fancy
  // chroma upsampling sees the same neighbor rows as in the full image
  int denom = 1;
  while (denom * 2 <= max_denom && w / (denom * 2) >= out_w &&
         h / (denom * 2) >= out_h)
    denom *= 2;
  double sup_y = std::max((double)h / out_h, (double)denom);
  int oy0 = (int)std::floor(y - sup_y) - denom;
  int oy1 = (int)std::ceil(y + h + sup_y) + denom;
  int m0 = std::max(0, oy0 / s.mcu_h - 1);
  int m1 = std::min(total_rows, (oy1 + s.mcu_h - 1) / s.mcu_h + 1);
  m0 -= m0 % rows_per_rst;
  m1 = std::min(total_rows,
                (m1 + rows_per_rst - 1) / rows_per_rst * rows_per_rst);
  if (m1 <= m0) return false;
  if (m0 <= 0 && m1 >= total_rows) return false;  // nothing to skip

  long i0 = (long)m0 * mcus_per_row / s.restart_interval;
  long total_mcus = (long)total_rows * mcus_per_row;
  long i1 = (m1 >= total_rows)
                ? (total_mcus + s.restart_interval - 1) / s.restart_interval
                : ((long)m1 * mcus_per_row) / s.restart_interval;
  size_t start = (i0 == 0)
                     ? s.entropy_start
                     : seek_intervals(b, n, s.entropy_start, i0);
  if (start == 0) return false;

  int new_h = std::min(s.height - m0 * s.mcu_h, (m1 - m0) * s.mcu_h);
  spliced->clear();
  spliced->reserve(s.entropy_start + (n - start) / 2 + 2);
  spliced->insert(spliced->end(), b, b + s.entropy_start);
  (*spliced)[s.height_off] = (unsigned char)(new_h >> 8);
  (*spliced)[s.height_off + 1] = (unsigned char)(new_h & 0xFF);
  if (!copy_intervals(b, n, start, i1 - i0, spliced)) return false;
  spliced->push_back(0xFF);
  spliced->push_back(0xD9);
  *row0_px = m0 * s.mcu_h;
  return true;
}

// Lossless coefficient-domain transcode (jpegtran-style) writing a DRI
// restart interval of `rows` MCU rows — the data-prep half of the fast
// path.
//
// Output goes through a CUSTOM in-memory destination manager, not libjpeg's
// jpeg_mem_dest: that one frees the old buffer on every growth but only
// publishes the new pointer in term_destination, so an ERREXIT raised
// between a growth and term (corrupt-but-decodable coefficients, OOM)
// leaves *outbuffer dangling and any cleanup free() is a double free — and
// since its initial buffer is 4KB, every real image grows at least once.
// Here the live pointer is kept in the thread_local at all times (realloc
// publishes immediately), the buffer persists across calls (no per-call
// malloc churn; bounded by the largest JPEG a thread transcodes), and the
// longjmp error path needs no buffer cleanup at all. thread_locals have
// static storage duration: well-defined across longjmp, per decode_band's
// pattern.
thread_local unsigned char* tl_obuf = nullptr;
thread_local unsigned long tl_ocap = 0;   // live allocation size
thread_local unsigned long tl_osize = 0;  // bytes produced by the last run

void mem_dst_init(j_compress_ptr c) {
  if (tl_obuf == nullptr) {
    tl_ocap = 64 * 1024;
    tl_obuf = static_cast<unsigned char*>(malloc(tl_ocap));
    if (tl_obuf == nullptr) {
      tl_ocap = 0;
      ERREXIT1(c, JERR_OUT_OF_MEMORY, 12);
    }
  }
  c->dest->next_output_byte = tl_obuf;
  c->dest->free_in_buffer = tl_ocap;
}

boolean mem_dst_empty(j_compress_ptr c) {
  // contract: called with the buffer completely full; grow and continue
  unsigned long newcap = tl_ocap * 2;
  unsigned char* nb = static_cast<unsigned char*>(realloc(tl_obuf, newcap));
  if (nb == nullptr) ERREXIT1(c, JERR_OUT_OF_MEMORY, 12);
  tl_obuf = nb;  // published before any fallible op: error paths stay exact
  c->dest->next_output_byte = tl_obuf + tl_ocap;
  c->dest->free_in_buffer = newcap - tl_ocap;
  tl_ocap = newcap;
  return TRUE;
}

void mem_dst_term(j_compress_ptr c) {
  tl_osize = tl_ocap - static_cast<unsigned long>(c->dest->free_in_buffer);
}

int transcode_impl(const unsigned char* buf, long len, int rows,
                   unsigned char* out, long out_cap, long* out_len) {
  jpeg_decompress_struct src;
  jpeg_compress_struct dst;
  ErrMgr jerr;
  volatile int created = 0;
  tl_osize = 0;
  src.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.emit_message = err_silent;
  jerr.pub.output_message = err_silent_msg;
  if (setjmp(jerr.jb)) {
    if (created >= 2) jpeg_destroy_compress(&dst);
    jpeg_destroy_decompress(&src);
    return 1;  // tl_obuf stays live for the next call — nothing to free
  }
  jpeg_create_decompress(&src);
  created = 1;
  jpeg_mem_src(&src, buf, (unsigned long)len);
  jpeg_read_header(&src, TRUE);
  jvirt_barray_ptr* coefs = jpeg_read_coefficients(&src);
  jpeg_create_compress(&dst);
  created = 2;
  dst.err = src.err;
  jpeg_destination_mgr dmgr;
  dmgr.init_destination = mem_dst_init;
  dmgr.empty_output_buffer = mem_dst_empty;
  dmgr.term_destination = mem_dst_term;
  dst.dest = &dmgr;
  jpeg_copy_critical_parameters(&src, &dst);
  dst.restart_in_rows = rows;
  jpeg_write_coefficients(&dst, coefs);
  jpeg_finish_compress(&dst);
  jpeg_finish_decompress(&src);
  jpeg_destroy_compress(&dst);
  jpeg_destroy_decompress(&src);
  *out_len = (long)tl_osize;
  if ((long)tl_osize > out_cap) {
    return 5;  // caller retries with a *out_len-byte buffer
  }
  std::memcpy(out, tl_obuf, tl_osize);
  return 0;
}

}  // namespace

extern "C" int jr_transcode_restart(const unsigned char* buf, long len,
                                    int rows, unsigned char* out,
                                    long out_cap, long* out_len) {
  if (rows <= 0 || out_len == nullptr) return 2;
  return transcode_impl(buf, len, rows, out, out_cap, out_len);
}

// MCU rows per restart interval if the stream is restart-row-aligned
// (spliceable); 0 otherwise.
extern "C" int jr_restart_rows(const unsigned char* buf, long len) {
  MarkerScan s;
  if (!scan_header(buf, (size_t)len, &s)) return 0;
  if (s.progressive || s.restart_interval <= 0 || s.width <= 0) return 0;
  int mcus_per_row = (s.width + s.mcu_w - 1) / s.mcu_w;
  if (s.restart_interval % mcus_per_row == 0)
    return s.restart_interval / mcus_per_row;
  if (mcus_per_row % s.restart_interval == 0) return 1;
  return 0;
}

extern "C" int jr_splice_used(void) { return g_splice_used; }

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
  std::vector<unsigned char> spliced;
  int row0 = 0, rc = -1;
  g_splice_used = 0;
  if (try_restart_splice(buf, len, y, w, h, out_w, out_h, max_denom,
                         &spliced, &row0)) {
    rc = decode_band(spliced.data(), (long)spliced.size(), x, y - row0, w, h,
                     out_w, out_h, max_denom, &res);
    g_splice_used = (rc == 0);
  }
  if (rc != 0)  // no restart rows, or a damaged stream: plain band decode
    rc = decode_band(buf, len, x, y, w, h, out_w, out_h, max_denom, &res);
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
