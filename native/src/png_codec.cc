// Native PNG decode for the data-loader hot path.
//
// The loader's measured bottleneck is PNG decode (PERF.md "Host data path"):
// PIL's decode is zlib inflate + unfilter + two Python-side copies
// (convert("RGB"), np.asarray). This decoder replaces that stage for the
// common case (8-bit, non-interlaced gray/RGB/palette/alpha PNGs — i.e.
// everything the ETL writes, reference Utils.py:106-113 semantics):
//
//   * whole-buffer zlib inflate via libdeflate (~2.2x zlib on this host,
//     measured), dlopen'd at runtime with a zlib fallback so the shared
//     library stays loadable on hosts without libdeflate;
//   * tight scalar unfilter (the PNG spec's five filters) directly into a
//     reusable thread-local buffer;
//   * RGB conversion fused with the unfiltered-row copy (alpha dropped —
//     PIL convert("RGB") semantics);
//   * optional fusion with the resize+center-crop window resample in
//     image_ops.cc, so one C call takes PNG bytes -> (crop, crop, 3) u8
//     with no intermediate Python objects.
//
// Unsupported shapes (16-bit, Adam7 interlace, sub-byte palette depths)
// return a nonzero code and the Python side falls back to PIL
// (utils/native.py) — correctness never depends on this path.

#include <cstdint>
#include <cstring>
#include <dlfcn.h>
#include <vector>
#include <zlib.h>

// from image_ops.cc
extern "C" void apvt_resize_center_crop(const uint8_t* src, int h, int w,
                                        int resize, int crop, uint8_t* dst);

namespace {

// ---------------------------------------------------------------------------
// inflate backend: libdeflate when present, zlib otherwise
// ---------------------------------------------------------------------------

using ld_alloc_fn = void* (*)();
using ld_inflate_fn = int (*)(void*, const void*, size_t, void*, size_t,
                              size_t*);
using ld_alloc_c_fn = void* (*)(int);
using ld_compress_fn = size_t (*)(void*, const void*, size_t, void*, size_t);

struct InflateBackend {
  ld_alloc_fn ld_alloc = nullptr;
  ld_inflate_fn ld_inflate = nullptr;
  ld_alloc_c_fn ld_alloc_c = nullptr;
  ld_compress_fn ld_compress = nullptr;
  bool have_libdeflate = false;
  bool have_ld_compress = false;
  InflateBackend() {
    void* h = dlopen("libdeflate.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!h) h = dlopen("libdeflate.so", RTLD_NOW | RTLD_LOCAL);
    if (h) {
      ld_alloc =
          reinterpret_cast<ld_alloc_fn>(dlsym(h, "libdeflate_alloc_decompressor"));
      ld_inflate =
          reinterpret_cast<ld_inflate_fn>(dlsym(h, "libdeflate_zlib_decompress"));
      have_libdeflate = ld_alloc && ld_inflate;
      ld_alloc_c =
          reinterpret_cast<ld_alloc_c_fn>(dlsym(h, "libdeflate_alloc_compressor"));
      ld_compress =
          reinterpret_cast<ld_compress_fn>(dlsym(h, "libdeflate_zlib_compress"));
      have_ld_compress = ld_alloc_c && ld_compress;
    }
  }
};

const InflateBackend& backend() {
  static InflateBackend b;
  return b;
}

// Inflate `src` into exactly `out_len` bytes of `dst`. Returns true on
// success (trailing compressed garbage tolerated, short output not).
bool zlib_inflate_exact(const uint8_t* src, size_t src_len, uint8_t* dst,
                        size_t out_len) {
  const InflateBackend& b = backend();
  if (b.have_libdeflate) {
    // one decompressor per thread, reused across calls
    thread_local void* dec = b.ld_alloc();
    if (dec) {
      size_t actual = 0;
      // libdeflate: 0 == LIBDEFLATE_SUCCESS
      if (b.ld_inflate(dec, src, src_len, dst, out_len, &actual) == 0 &&
          actual == out_len) {
        return true;
      }
      return false;
    }
  }
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(out_len);
  const int rc = inflate(&zs, Z_FINISH);
  const bool ok = (rc == Z_STREAM_END) && zs.avail_out == 0;
  inflateEnd(&zs);
  return ok;
}

// ---------------------------------------------------------------------------
// PNG container
// ---------------------------------------------------------------------------

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngHeader {
  int w = 0, h = 0;
  int bit_depth = 0;
  int color_type = 0;   // 0 gray, 2 rgb, 3 palette, 4 gray+alpha, 6 rgba
  int interlace = 0;
  int channels = 0;     // source channels per pixel
};

// error codes surfaced to Python (any nonzero -> PIL fallback)
enum {
  APVT_PNG_OK = 0,
  APVT_PNG_BAD_SIGNATURE = 1,
  APVT_PNG_TRUNCATED = 2,
  APVT_PNG_UNSUPPORTED = 3,  // 16-bit / interlaced / sub-byte palette / type
  APVT_PNG_BAD_DEFLATE = 4,
  APVT_PNG_BAD_FILTER = 5,
  APVT_PNG_NO_PALETTE = 6,
};

int parse_header(const uint8_t* png, size_t len, PngHeader* hdr) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (len < 8 + 25 || std::memcmp(png, sig, 8) != 0)
    return APVT_PNG_BAD_SIGNATURE;
  // first chunk must be IHDR (13-byte payload)
  const uint8_t* p = png + 8;
  if (be32(p) != 13 || std::memcmp(p + 4, "IHDR", 4) != 0)
    return APVT_PNG_BAD_SIGNATURE;
  const uint8_t* d = p + 8;
  hdr->w = static_cast<int>(be32(d));
  hdr->h = static_cast<int>(be32(d + 4));
  hdr->bit_depth = d[8];
  hdr->color_type = d[9];
  hdr->interlace = d[12];
  if (hdr->w <= 0 || hdr->h <= 0) return APVT_PNG_BAD_SIGNATURE;
  if (hdr->bit_depth != 8 || hdr->interlace != 0) return APVT_PNG_UNSUPPORTED;
  switch (hdr->color_type) {
    case 0: hdr->channels = 1; break;
    case 2: hdr->channels = 3; break;
    case 3: hdr->channels = 1; break;
    case 4: hdr->channels = 2; break;
    case 6: hdr->channels = 4; break;
    default: return APVT_PNG_UNSUPPORTED;
  }
  return APVT_PNG_OK;
}

inline uint8_t paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
}

// Unfilter `raw` (h rows of [filter_byte | w*bpp bytes]) in place, leaving
// each row's pixel data where it lies. Returns false on an invalid filter id.
bool unfilter(uint8_t* raw, int h, int row_bytes, int bpp) {
  const int stride = 1 + row_bytes;
  const uint8_t* prev = nullptr;
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw + static_cast<size_t>(y) * stride;
    const int f = row[0];
    uint8_t* cur = row + 1;
    switch (f) {
      case 0:
        break;
      case 1:  // sub
        for (int i = bpp; i < row_bytes; ++i) cur[i] += cur[i - bpp];
        break;
      case 2:  // up
        if (prev)
          for (int i = 0; i < row_bytes; ++i) cur[i] += prev[i];
        break;
      case 3:  // average
        if (prev) {
          for (int i = 0; i < bpp; ++i) cur[i] += prev[i] >> 1;
          for (int i = bpp; i < row_bytes; ++i)
            cur[i] += static_cast<uint8_t>((cur[i - bpp] + prev[i]) >> 1);
        } else {
          for (int i = bpp; i < row_bytes; ++i) cur[i] += cur[i - bpp] >> 1;
        }
        break;
      case 4:  // paeth
        if (prev) {
          for (int i = 0; i < bpp; ++i) cur[i] += paeth(0, prev[i], 0);
          for (int i = bpp; i < row_bytes; ++i)
            cur[i] += paeth(cur[i - bpp], prev[i], prev[i - bpp]);
        } else {
          for (int i = bpp; i < row_bytes; ++i) cur[i] += cur[i - bpp];
        }
        break;
      default:
        return false;
    }
    prev = cur;
  }
  return true;
}

// Decode into `rgb` as (h, w, 3). Thread-local scratch keeps the hot path
// allocation-free after the first image of each size.
int decode_rgb(const uint8_t* png, size_t len, PngHeader* hdr,
               std::vector<uint8_t>* rgb) {
  int rc = parse_header(png, len, hdr);
  if (rc != APVT_PNG_OK) return rc;

  // chunk walk: gather IDAT extents + palette
  thread_local std::vector<uint8_t> idat;
  idat.clear();
  const uint8_t* palette = nullptr;
  size_t palette_len = 0;
  const uint8_t* first_idat = nullptr;
  size_t first_idat_len = 0;
  int n_idat = 0;
  size_t off = 8;
  while (off + 12 <= len) {
    const uint32_t clen = be32(png + off);
    const uint8_t* ctype = png + off + 4;
    if (off + 12 + clen > len) return APVT_PNG_TRUNCATED;
    const uint8_t* data = png + off + 8;
    if (std::memcmp(ctype, "IDAT", 4) == 0) {
      if (n_idat++ == 0) {
        first_idat = data;
        first_idat_len = clen;
      } else {
        if (idat.empty()) idat.assign(first_idat, first_idat + first_idat_len);
        idat.insert(idat.end(), data, data + clen);
      }
    } else if (std::memcmp(ctype, "PLTE", 4) == 0) {
      palette = data;
      palette_len = clen;
    } else if (std::memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    off += 12 + clen;
  }
  if (n_idat == 0) return APVT_PNG_TRUNCATED;
  if (hdr->color_type == 3 && (palette == nullptr || palette_len % 3 != 0))
    return APVT_PNG_NO_PALETTE;

  const int w = hdr->w, h = hdr->h, bpp = hdr->channels;
  const int row_bytes = w * bpp;
  const size_t raw_len = static_cast<size_t>(h) * (1 + row_bytes);
  thread_local std::vector<uint8_t> raw;
  raw.resize(raw_len);
  const uint8_t* comp = n_idat == 1 ? first_idat : idat.data();
  const size_t comp_len = n_idat == 1 ? first_idat_len : idat.size();
  if (!zlib_inflate_exact(comp, comp_len, raw.data(), raw_len))
    return APVT_PNG_BAD_DEFLATE;
  if (!unfilter(raw.data(), h, row_bytes, bpp)) return APVT_PNG_BAD_FILTER;

  rgb->resize(static_cast<size_t>(h) * w * 3);
  const int stride = 1 + row_bytes;
  const int n_pal = static_cast<int>(palette_len / 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + static_cast<size_t>(y) * stride + 1;
    uint8_t* out = rgb->data() + static_cast<size_t>(y) * w * 3;
    switch (hdr->color_type) {
      case 2:  // rgb: rows are already the output layout
        std::memcpy(out, src, static_cast<size_t>(row_bytes));
        break;
      case 0:  // gray
        for (int x = 0; x < w; ++x) {
          const uint8_t g = src[x];
          out[x * 3] = out[x * 3 + 1] = out[x * 3 + 2] = g;
        }
        break;
      case 3:  // palette (PIL convert("RGB"): straight PLTE lookup)
        for (int x = 0; x < w; ++x) {
          const int idx = src[x] < n_pal ? src[x] : 0;
          const uint8_t* e = palette + idx * 3;
          out[x * 3] = e[0];
          out[x * 3 + 1] = e[1];
          out[x * 3 + 2] = e[2];
        }
        break;
      case 4:  // gray+alpha: drop alpha (PIL convert("RGB") semantics)
        for (int x = 0; x < w; ++x) {
          const uint8_t g = src[x * 2];
          out[x * 3] = out[x * 3 + 1] = out[x * 3 + 2] = g;
        }
        break;
      case 6:  // rgba: drop alpha
        for (int x = 0; x < w; ++x) {
          out[x * 3] = src[x * 4];
          out[x * 3 + 1] = src[x * 4 + 1];
          out[x * 3 + 2] = src[x * 4 + 2];
        }
        break;
    }
  }
  return APVT_PNG_OK;
}

// Deflate `src` into `dst` (zlib container). Returns compressed size, or 0
// if dst_cap is too small.
size_t zlib_deflate(const uint8_t* src, size_t src_len, uint8_t* dst,
                    size_t dst_cap, int level) {
  const InflateBackend& b = backend();
  if (b.have_ld_compress) {
    // one compressor per (thread, level); level changes are rare
    thread_local void* comp = nullptr;
    thread_local int comp_level = -1;
    if (comp == nullptr || comp_level != level) {
      comp = b.ld_alloc_c(level);
      comp_level = level;
    }
    if (comp) return b.ld_compress(comp, src, src_len, dst, dst_cap);
  }
  uLongf out_len = static_cast<uLongf>(dst_cap);
  if (compress2(dst, &out_len, src, static_cast<uLong>(src_len), level) != Z_OK)
    return 0;
  return out_len;
}

void put_be32(uint8_t* p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v >> 24);
  p[1] = static_cast<uint8_t>(v >> 16);
  p[2] = static_cast<uint8_t>(v >> 8);
  p[3] = static_cast<uint8_t>(v);
}

// Write one chunk (type + data + CRC) at `p`; returns bytes written.
size_t put_chunk(uint8_t* p, const char* type, const uint8_t* data,
                 size_t len) {
  put_be32(p, static_cast<uint32_t>(len));
  std::memcpy(p + 4, type, 4);
  if (len) std::memcpy(p + 8, data, len);
  uLong c = crc32(0L, Z_NULL, 0);
  c = crc32(c, p + 4, static_cast<uInt>(4 + len));
  put_be32(p + 8 + len, static_cast<uint32_t>(c));
  return 12 + len;
}

}  // namespace

extern "C" {

// Header peek: fills (*h, *w); nonzero means this decoder can't handle the
// file (caller should fall back to PIL).
int apvt_png_info(const uint8_t* png, long len, int* h, int* w) {
  PngHeader hdr;
  const int rc = parse_header(png, static_cast<size_t>(len), &hdr);
  if (rc == APVT_PNG_OK) {
    *h = hdr.h;
    *w = hdr.w;
  }
  return rc;
}

// Full decode to (h, w, 3) u8 RGB. dst must hold h*w*3 bytes (use
// apvt_png_info first).
int apvt_png_decode_rgb(const uint8_t* png, long len, uint8_t* dst) {
  PngHeader hdr;
  thread_local std::vector<uint8_t> rgb;
  const int rc = decode_rgb(png, static_cast<size_t>(len), &hdr, &rgb);
  if (rc != APVT_PNG_OK) return rc;
  std::memcpy(dst, rgb.data(), rgb.size());
  return APVT_PNG_OK;
}

// The loader hot path in one call: PNG bytes -> shorter-side resize +
// center-crop -> (crop, crop, 3) u8, no intermediate Python objects.
// (Replaces PIL open + convert("RGB") + np.asarray + resize_center_crop.)
int apvt_png_decode_resize_center_crop(const uint8_t* png, long len,
                                       int resize, int crop, uint8_t* dst) {
  PngHeader hdr;
  thread_local std::vector<uint8_t> rgb;
  const int rc = decode_rgb(png, static_cast<size_t>(len), &hdr, &rgb);
  if (rc != APVT_PNG_OK) return rc;
  apvt_resize_center_crop(rgb.data(), hdr.h, hdr.w, resize, crop, dst);
  return APVT_PNG_OK;
}

// Encode (h, w, 3) u8 RGB as a PNG (8-bit color type 2, non-interlaced).
// Any spec-valid encoding is pixel-lossless, so this trades PIL's adaptive
// per-row filter search for one fixed filter: "up" (row delta) — near-free
// to compute and close to adaptive ratios on photographic content — then
// libdeflate zlib compression (zlib compress2 fallback). `level`: deflate
// level 1-12 (libdeflate) / 1-9 (zlib). Returns bytes written into `out`
// (caller provides `out_cap` >= apvt_png_encode_bound(h, w)), or -1.
long apvt_png_encode_rgb(const uint8_t* src, int h, int w, int level,
                         uint8_t* out, long out_cap) {
  if (h <= 0 || w <= 0 || out_cap <= 0) return -1;
  const size_t row_bytes = static_cast<size_t>(w) * 3;
  const size_t raw_len = static_cast<size_t>(h) * (1 + row_bytes);
  thread_local std::vector<uint8_t> raw;
  raw.resize(raw_len);
  for (int y = 0; y < h; ++y) {
    uint8_t* dst_row = raw.data() + static_cast<size_t>(y) * (1 + row_bytes);
    const uint8_t* cur = src + static_cast<size_t>(y) * row_bytes;
    if (y == 0) {
      dst_row[0] = 1;  // sub filter for the first row (no row above)
      dst_row[1] = cur[0];
      dst_row[2] = cur[1];
      dst_row[3] = cur[2];
      for (size_t i = 3; i < row_bytes; ++i)
        dst_row[1 + i] = static_cast<uint8_t>(cur[i] - cur[i - 3]);
    } else {
      dst_row[0] = 2;  // up filter
      const uint8_t* prev = cur - row_bytes;
      for (size_t i = 0; i < row_bytes; ++i)
        dst_row[1 + i] = static_cast<uint8_t>(cur[i] - prev[i]);
    }
  }

  thread_local std::vector<uint8_t> comp;
  comp.resize(raw_len + raw_len / 2 + 512);
  const size_t comp_len =
      zlib_deflate(raw.data(), raw_len, comp.data(), comp.size(), level);
  if (comp_len == 0) return -1;

  const size_t total = 8 + 25 + (12 + comp_len) + 12;
  if (static_cast<size_t>(out_cap) < total) return -1;
  uint8_t* p = out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  std::memcpy(p, sig, 8);
  p += 8;
  uint8_t ihdr[13];
  put_be32(ihdr, static_cast<uint32_t>(w));
  put_be32(ihdr + 4, static_cast<uint32_t>(h));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter method
  ihdr[12] = 0;  // no interlace
  p += put_chunk(p, "IHDR", ihdr, 13);
  p += put_chunk(p, "IDAT", comp.data(), comp_len);
  p += put_chunk(p, "IEND", nullptr, 0);
  return static_cast<long>(p - out);
}

// Worst-case output size for apvt_png_encode_rgb's buffer.
long apvt_png_encode_bound(int h, int w) {
  const size_t raw_len = static_cast<size_t>(h) * (1 + static_cast<size_t>(w) * 3);
  return static_cast<long>(8 + 25 + 12 + 12 + raw_len + raw_len / 2 + 512);
}

}  // extern "C"
