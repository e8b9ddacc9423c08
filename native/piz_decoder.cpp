// PIZ (wavelet + Huffman) decompressor for OpenEXR scanline blocks.
//
// Native IO-runtime component: lets the framework read the
// PIZ-compressed Tungsten golden renders shipped with the reference
// scenes (Scenes/{Teapot,dragon}/TungstenRender.exr) for golden-image
// RMSE gates. Implemented from the documented OpenEXR PIZ format:
// block = [u16 minNonZero, u16 maxNonZero, bitmap bytes,
//          i32 hufLength, huffman stream], where the Huffman payload
// decodes to per-channel u16 planes that are 2D-wavelet (re)composed
// and mapped through the bitmap-derived LUT.
//
// Build: g++ -O3 -shared -fPIC -o libtbpiz.so piz_decoder.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int HUF_ENCBITS = 16;
constexpr int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;
constexpr int HUF_DECBITS = 14;
constexpr int HUF_DECSIZE = 1 << HUF_DECBITS;
constexpr int HUF_DECMASK = HUF_DECSIZE - 1;

constexpr int SHORT_ZEROCODE_RUN = 59;
constexpr int LONG_ZEROCODE_RUN = 63;
constexpr int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t c = 0;  // bit buffer
  int lc = 0;      // bits in buffer

  BitReader(const uint8_t* ptr, const uint8_t* e) : p(ptr), end(e) {}

  inline int get_bits(int n) {
    while (lc < n) {
      c = (c << 8) | (p < end ? *p++ : 0);
      lc += 8;
    }
    lc -= n;
    return (int)((c >> lc) & ((1ull << n) - 1));
  }
};

struct HufDec {
  int len = 0;        // code length if short code
  int lit = 0;        // symbol if short code
  std::vector<int> p; // long-code symbol candidates
};

// Unpack the 6-bit code-length table with zero-run encoding.
bool unpack_enc_table(BitReader& br, int im, int iM,
                      std::vector<int64_t>& hcode) {
  hcode.assign(HUF_ENCSIZE, 0);
  for (int i = im; i <= iM; i++) {
    int l = br.get_bits(6);
    hcode[i] = l;
    if (l == LONG_ZEROCODE_RUN) {
      int zerun = br.get_bits(8) + SHORTEST_LONG_RUN;
      if (i + zerun > iM + 1) return false;
      while (zerun--) hcode[i++] = 0;
      i--;
    } else if (l >= SHORT_ZEROCODE_RUN) {
      int zerun = l - SHORT_ZEROCODE_RUN + 2;
      if (i + zerun > iM + 1) return false;
      while (zerun--) hcode[i++] = 0;
      i--;
    }
  }
  // Canonical code assignment (hufCanonicalCodeTable): hcode[i] holds the
  // length; build codes so that shorter codes numerically precede.
  int64_t n[59] = {0};
  for (int i = 0; i < HUF_ENCSIZE; i++) n[hcode[i]] += 1;
  int64_t c = 0;
  for (int i = 58; i > 0; --i) {
    int64_t nc = ((c + n[i]) >> 1);
    n[i] = c;
    c = nc;
  }
  for (int i = 0; i < HUF_ENCSIZE; i++) {
    int l = (int)hcode[i];
    if (l > 0) hcode[i] = l | (n[l]++ << 6);
  }
  return true;
}

bool build_dec_table(const std::vector<int64_t>& hcode, int im, int iM,
                     std::vector<HufDec>& hdecod) {
  hdecod.assign(HUF_DECSIZE, HufDec());
  for (int i = im; i <= iM; i++) {
    int64_t cc = hcode[i] >> 6;
    int l = (int)(hcode[i] & 63);
    if (cc >> l) return false;
    if (l > HUF_DECBITS) {
      HufDec& pl = hdecod[(cc >> (l - HUF_DECBITS))];
      if (pl.len) return false;
      pl.lit++;
      pl.p.push_back(i);
    } else if (l) {
      int64_t base = cc << (HUF_DECBITS - l);
      int64_t count = 1ll << (HUF_DECBITS - l);
      for (int64_t j = 0; j < count; j++) {
        HufDec& pl = hdecod[base + j];
        if (pl.len || !pl.p.empty()) return false;
        pl.len = l;
        pl.lit = i;
      }
    }
  }
  return true;
}

// Huffman-decode ni u16 symbols from the bitstream.
bool huf_decode(const std::vector<int64_t>& hcode,
                const std::vector<HufDec>& hdecod, const uint8_t* in,
                int64_t nbits, int rlc, uint16_t* out, int64_t no) {
  int64_t c = 0;
  int lc = 0;
  const uint8_t* ie = in + (nbits + 7) / 8;
  uint16_t* outb = out;
  uint16_t* oe = out + no;
  const uint8_t* p = in;

  auto get_char = [&]() {
    c = (c << 8) | (p < ie ? *p++ : 0);
    lc += 8;
  };
  auto get_code = [&](int po) -> bool {
    if (po == rlc) {
      if (lc < 8) get_char();
      lc -= 8;
      int cs = (int)((c >> lc) & 0xff);
      if (out == outb || out + cs > oe) return false;
      uint16_t s = out[-1];
      while (cs-- > 0) *out++ = s;
    } else if (out < oe) {
      *out++ = (uint16_t)po;
    } else {
      return false;
    }
    return true;
  };

  while (p < ie) {
    get_char();
    while (lc >= HUF_DECBITS) {
      const HufDec& pl = hdecod[(c >> (lc - HUF_DECBITS)) & HUF_DECMASK];
      if (pl.len) {
        lc -= pl.len;
        if (!get_code(pl.lit)) return false;
      } else {
        if (pl.p.empty()) return false;
        size_t j;
        for (j = 0; j < pl.p.size(); j++) {
          int l = (int)(hcode[pl.p[j]] & 63);
          while (lc < l && p < ie) get_char();
          if (lc >= l) {
            if ((hcode[pl.p[j]] >> 6) ==
                ((c >> (lc - l)) & ((1ll << l) - 1))) {
              lc -= l;
              if (!get_code(pl.p[j])) return false;
              break;
            }
          }
        }
        if (j == pl.p.size()) return false;
      }
    }
  }

  // Flush remaining bits (< HUF_DECBITS) from the last partial byte.
  int i = (8 - (int)(nbits & 7)) & 7;
  c >>= i;
  lc -= i;
  while (lc > 0) {
    const HufDec& pl = hdecod[(c << (HUF_DECBITS - lc)) & HUF_DECMASK];
    if (pl.len && pl.len <= lc) {
      lc -= pl.len;
      if (!get_code(pl.lit)) return false;
    } else {
      return false;
    }
  }
  return out == oe;
}

bool huf_uncompress(const uint8_t* in, int n_in, uint16_t* out, int64_t no) {
  if (n_in < 20) return false;
  auto rd_u32 = [&](int off) {
    uint32_t v;
    std::memcpy(&v, in + off, 4);
    return v;
  };
  int im = (int)rd_u32(0);
  int iM = (int)rd_u32(4);
  // rd_u32(8) = tableLength (unused), rd_u32(12) = nBits, rd_u32(16) pad
  int64_t nbits = rd_u32(12);
  if (im < 0 || im >= HUF_ENCSIZE || iM < 0 || iM >= HUF_ENCSIZE)
    return false;
  const uint8_t* ptr = in + 20;
  BitReader br(ptr, in + n_in);
  std::vector<int64_t> hcode;
  if (!unpack_enc_table(br, im, iM, hcode)) return false;
  // Table is byte-aligned? In OpenEXR the table read advances ptr by
  // whole bytes consumed; the bitstream starts at the next byte.
  const uint8_t* data = br.p;
  if (br.lc >= 8) data -= br.lc / 8;  // unread whole buffered bytes
  if (nbits > 8 * (int64_t)(in + n_in - data)) return false;
  std::vector<HufDec> hdecod;
  if (!build_dec_table(hcode, im, iM, hdecod)) return false;
  return huf_decode(hcode, hdecod, data, nbits, iM, out, no);
}

// ---------------------------------------------------------------------------
// 2D wavelet decode (ImfWav semantics)

constexpr int NBITS = 16;
constexpr int A_OFFSET = 1 << (NBITS - 1);
constexpr int MOD_MASK = (1 << NBITS) - 1;

inline void wdec14(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int16_t ls = (int16_t)l;
  int16_t hs = (int16_t)h;
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  a = (uint16_t)ai;
  b = (uint16_t)(ai - hi);
}

inline void wdec16(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int m = l;
  int d = h;
  int bb = (m - (d >> 1)) & MOD_MASK;
  int aa = (d + bb - A_OFFSET) & MOD_MASK;
  b = (uint16_t)bb;
  a = (uint16_t)aa;
}

void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy, uint16_t mx) {
  bool w14 = (mx < (1 << 14));
  int n = (nx > ny) ? ny : nx;
  int p = 1;
  int p2;
  while (p <= n) p <<= 1;
  p >>= 1;
  p2 = p;
  p >>= 1;

  while (p >= 1) {
    uint16_t* py = in;
    uint16_t* ey = in + oy * (ny - p2);
    int oy1 = oy * p;
    int oy2 = oy * p2;
    int ox1 = ox * p;
    int ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;

    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wdec14(*px, *p10, i00, i10);
          wdec14(*p01, *p11, i01, i11);
          wdec14(i00, i01, *px, *p01);
          wdec14(i10, i11, *p10, *p11);
        } else {
          wdec16(*px, *p10, i00, i10);
          wdec16(*p01, *p11, i01, i11);
          wdec16(i00, i01, *px, *p01);
          wdec16(i10, i11, *p10, *p11);
        }
      }
      if (nx & p) {  // odd column remainder
        uint16_t* p10 = px + oy1;
        if (w14)
          wdec14(*px, *p10, i00, *p10);
        else
          wdec16(*px, *p10, i00, *p10);
        *px = i00;
      }
    }
    if (ny & p) {  // odd row remainder
      uint16_t* px = py;
      uint16_t* ex = py + ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14)
          wdec14(*px, *p01, i00, *p01);
        else
          wdec16(*px, *p01, i00, *p01);
        *px = i00;
      }
    }
    p2 = p;
    p >>= 1;
  }
}

}  // namespace

extern "C" {

// Decompress one PIZ block into per-channel planes.
// channels are described by (nx, ny, size) triples; `out` receives
// channel 0's plane (ny*nx*size u16s), then channel 1's, etc.
// Returns 0 on success.
int tb_piz_uncompress(const uint8_t* in, int in_len, uint16_t* out,
                      int64_t out_len, const int* ch_nx, const int* ch_ny,
                      const int* ch_size, int n_ch) {
  if (in_len < 4) return 1;
  int pos = 0;
  uint16_t min_nz, max_nz;
  std::memcpy(&min_nz, in + pos, 2);
  pos += 2;
  std::memcpy(&max_nz, in + pos, 2);
  pos += 2;
  if (max_nz >= 8192) return 2;

  std::vector<uint8_t> bitmap(8192, 0);
  if (min_nz <= max_nz) {
    int nbytes = max_nz - min_nz + 1;
    if (pos + nbytes > in_len) return 3;
    std::memcpy(bitmap.data() + min_nz, in + pos, nbytes);
    pos += nbytes;
  }

  // Reverse LUT: k-th set bit -> value.
  std::vector<uint16_t> lut(1 << 16, 0);
  int k = 0;
  for (int i = 0; i < (1 << 16); i++) {
    if ((i == 0) || (bitmap[i >> 3] & (1 << (i & 7)))) lut[k++] = (uint16_t)i;
  }
  uint16_t max_value = (uint16_t)(k - 1);

  int32_t huf_len;
  if (pos + 4 > in_len) return 4;
  std::memcpy(&huf_len, in + pos, 4);
  pos += 4;
  if (huf_len < 0 || pos + huf_len > in_len) return 5;

  if (!huf_uncompress(in + pos, huf_len, out, out_len)) return 6;

  // Wavelet-decode each channel plane in place.
  int64_t off = 0;
  for (int c = 0; c < n_ch; c++) {
    int nx = ch_nx[c], ny = ch_ny[c], size = ch_size[c];
    for (int s = 0; s < size; s++) {
      wav2_decode(out + off + s, nx, size * 1, ny, size * nx, max_value);
    }
    off += (int64_t)nx * ny * size;
  }
  if (off != out_len) return 7;

  // Apply LUT.
  for (int64_t i = 0; i < out_len; i++) out[i] = lut[out[i]];
  return 0;
}

}  // extern "C"
