/* Scalar delta-of-delta stream decoder, C twin of the Python reference
 * (oracle.py dod_decode / _dod_scalar_continue).  Bit-exact: uint64
 * arithmetic is the same mod-2^64 semantics the numpy/python paths use,
 * and words are big-endian in the stream buffer (bswap on load).
 *
 * Compiled at import time by native/__init__.py with plain `cc -O2
 * -shared -fPIC` and called through ctypes — no Python headers, no build
 * system, graceful fallback to the pure-numpy wavefront when no compiler
 * exists.  One stream decodes at a few ns/value here vs ~160 ns/value for
 * the vectorized wavefront (gather-bound), which makes the store's read
 * path compute-trivial relative to parquet IO.
 *
 * Layout contract: streams live anywhere in one shared byte buffer,
 * stream s starting at byte byte_off[s]; decoded values land at
 * out[out_off[s] .. out_off[s] + counts[s]).  The caller guarantees at
 * least 9 readable bytes past every stream's last code (inter-stream
 * bytes count; only the physical end of the buffer needs a guard).
 */

#include <stdint.h>
#include <string.h>

static inline uint64_t bswap64(uint64_t x) {
#if defined(__GNUC__) || defined(__clang__)
    return __builtin_bswap64(x);
#else
    x = ((x & 0x00000000FFFFFFFFULL) << 32) | (x >> 32);
    x = ((x & 0x0000FFFF0000FFFFULL) << 16) | ((x >> 16) & 0x0000FFFF0000FFFFULL);
    x = ((x & 0x00FF00FF00FF00FFULL) << 8) | ((x >> 8) & 0x00FF00FF00FF00FFULL);
    return x;
#endif
}

/* 64-bit peek starting at bit `pos` of a big-endian BYTE stream.  Byte
 * addressing (not word) so streams can start at any offset of a shared
 * buffer — e.g. directly inside an Arrow binary column's values buffer.
 * Reads at most 9 bytes starting at pos/8; the caller guarantees 9
 * readable bytes past each stream's last code (padding, the next stream's
 * bytes, or an explicit guard at the very end of the buffer). */
static inline uint64_t peek(const uint8_t *base, int64_t pos) {
    int64_t byte = pos >> 3;
    int b = (int)(pos & 7);
    uint64_t hi;
    memcpy(&hi, base + byte, 8);
    hi = bswap64(hi);
    if (b == 0)
        return hi;
    return (hi << b) | ((uint64_t)base[byte + 8] >> (8 - b));
}

static void decode_one(const uint8_t *base, int64_t count, int64_t *out) {
    if (count <= 0)
        return;
    uint64_t cur = peek(base, 0);
    uint64_t delta = 0;
    int64_t pos = 64;
    out[0] = (int64_t)cur;
    for (int64_t i = 1; i < count; i++) {
        uint64_t chunk = peek(base, pos);
        uint64_t top4 = chunk >> 60;
        uint64_t dod;
        if (top4 < 8) { /* '0' */
            dod = 0;
            pos += 1;
        } else if (top4 < 12) { /* '10' + 7 */
            dod = ((chunk >> 55) & 0x7F) - 63;
            pos += 9;
        } else if (top4 < 14) { /* '110' + 12 */
            dod = ((chunk >> 49) & 0xFFF) - 2047;
            pos += 15;
        } else if (top4 == 14) { /* '1110' + 32 */
            dod = ((chunk >> 28) & 0xFFFFFFFFULL) - ((1ULL << 31) - 1);
            pos += 36;
        } else { /* '1111' + raw 64 */
            dod = peek(base, pos + 4);
            pos += 68;
        }
        delta += dod;
        cur += delta;
        out[i] = (int64_t)cur;
    }
}

void dod_decode_streams_c(const uint8_t *base, const int64_t *byte_off,
                          const int64_t *counts, const int64_t *out_off,
                          int64_t n_streams, int64_t *out) {
    for (int64_t s = 0; s < n_streams; s++)
        decode_one(base + byte_off[s], counts[s], out + out_off[s]);
}

/* ---------------- encoder: exact C twin of oracle.dod_encode_py ---------- */

typedef struct { uint8_t *p; uint64_t acc; int nbits; } BW;

/* MSB-first bit writer; n <= 56 so acc never overflows (nbits < 8 between
 * calls).  64-bit payloads are written as two 32-bit halves. */
static inline void bw_put(BW *w, uint64_t v, int n) {
    w->acc = (w->acc << n) | (v & ((1ULL << n) - 1));
    w->nbits += n;
    while (w->nbits >= 8) {
        w->nbits -= 8;
        *w->p++ = (uint8_t)(w->acc >> w->nbits);
    }
}

static int64_t encode_one(const int64_t *v, int64_t n, uint8_t *out) {
    if (n <= 0)
        return 0;
    BW w = {out, 0, 0};
    uint64_t first = (uint64_t)v[0];
    bw_put(&w, first >> 32, 32);
    bw_put(&w, first & 0xFFFFFFFFULL, 32);
    uint64_t prev_delta = 0;
    for (int64_t i = 1; i < n; i++) {
        /* mod-2^64 arithmetic == numpy int64 wraparound semantics */
        uint64_t delta = (uint64_t)v[i] - (uint64_t)v[i - 1];
        uint64_t ud = delta - prev_delta;
        prev_delta = delta;
        int64_t d = (int64_t)ud;
        if (d == 0)
            bw_put(&w, 0, 1);
        else if (d >= -63 && d <= 64)
            bw_put(&w, (2ULL << 7) | (uint64_t)(d + 63), 9);
        else if (d >= -2047 && d <= 2048)
            bw_put(&w, (6ULL << 12) | (uint64_t)(d + 2047), 15);
        else if (d >= -(1LL << 31) + 1 && d <= (1LL << 31))
            bw_put(&w, (14ULL << 32) | (uint64_t)(d + (1LL << 31) - 1), 36);
        else {
            bw_put(&w, 15, 4);
            bw_put(&w, ud >> 32, 32);
            bw_put(&w, ud & 0xFFFFFFFFULL, 32);
        }
    }
    if (w.nbits > 0)
        *w.p++ = (uint8_t)(w.acc << (8 - w.nbits)); /* zero pad to byte */
    return (int64_t)(w.p - out);
}

/* Encode many independent streams from one flat int64 value array.  Stream
 * s holds vals[val_off[s] .. val_off[s+1]); its bytes land at
 * out + cap_off[s] (caller sizes capacity >= 16 + 9*(count-1) per stream);
 * actual byte length is returned in nbytes[s]. */
void dod_encode_streams_c(const int64_t *vals, const int64_t *val_off,
                          int64_t n_streams, uint8_t *out,
                          const int64_t *cap_off, int64_t *nbytes) {
    for (int64_t s = 0; s < n_streams; s++)
        nbytes[s] = encode_one(vals + val_off[s], val_off[s + 1] - val_off[s],
                               out + cap_off[s]);
}

/* Variable-length segmented memcpy: segment s is src[src_off[s] ..
 * src_off[s]+lens[s]) -> dst[dst_off[s] ..).  Used to splice encoded
 * streams into their final framed-blob positions without per-row Python. */
void gather_segments_c(const uint8_t *src, const int64_t *src_off,
                       const int64_t *lens, uint8_t *dst,
                       const int64_t *dst_off, int64_t n) {
    for (int64_t s = 0; s < n; s++)
        memcpy(dst + dst_off[s], src + src_off[s], (size_t)lens[s]);
}
