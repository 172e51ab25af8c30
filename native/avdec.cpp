// Exact-decode module: libavcodec MJPEG + libswscale -> exact gray plane.
//
// The reference decodes with cv2.VideoCapture (FFmpeg: avcodec mjpeg decode
// to yuvj420p, swscale conversion to BGR24) and converts each frame to
// grayscale (track_eval.py:156-366, 181). cv2's per-frame path materialises
// a full BGR Mat (3.4 MB at 1228x922) that the preprocessor immediately
// reduces to gray. This module runs the SAME libraries directly on the
// demuxed JPEG chunks and fuses the conversion: swscale emits BGR24 into a
// thread-local scratch buffer and the exact BGR2GRAY recipe (gray_recipe.h)
// consumes it in place — the Python-side frame object and cv2's videoio
// Mat allocation/copy disappear (measured ~0.8 ms/frame at 1228x922).
//
// The ffmpeg functions are resolved at runtime via dlopen/dlsym, preferring
// the libraries cv2 itself bundles (opencv_python.libs/libavcodec-*.so.*):
// running cv2's own build guarantees the same decoder arithmetic AND is
// measurably faster than the distro build (3.7 vs 4.15 ms/frame here).
// Only the ABI-frozen prefixes of AVPacket (data/size) and AVFrame
// (data/linesize/width/height/format) are touched, and an
// avcodec_version() major-range gate rejects unknown layouts. System
// sonames are the fallback when cv2's copies are absent.
//
// Bit-exactness is NOT assumed even then: the caller (io/video.py) decodes
// the first frame through BOTH paths and byte-compares them before
// committing to this module; any mismatch falls back to cv2 for the file.
//
// Built as its own shared library (libysmr_avdec.so) so the core runtime
// keeps zero ffmpeg dependencies (dev headers are only needed at compile
// time for the struct definitions).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

#include <dlfcn.h>
#include <malloc.h>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libswscale/swscale.h>
}

#include "gray_recipe.h"

namespace {

// avcodec majors whose AVPacket/AVFrame prefix layout matches the compile
// headers (verified: data/size and data/linesize/width/height/format have
// not moved across these); outside the range we refuse rather than risk it
constexpr unsigned kMinAvcodecMajor = 58;
constexpr unsigned kMaxAvcodecMajor = 62;

struct AvApi {
    void* h_avcodec = nullptr;
    void* h_swscale = nullptr;
    bool ready = false;

    unsigned (*avcodec_version)(void) = nullptr;
    const AVCodec* (*avcodec_find_decoder)(enum AVCodecID) = nullptr;
    AVCodecContext* (*avcodec_alloc_context3)(const AVCodec*) = nullptr;
    int (*avcodec_open2)(AVCodecContext*, const AVCodec*,
                         AVDictionary**) = nullptr;
    AVPacket* (*av_packet_alloc)(void) = nullptr;
    AVFrame* (*av_frame_alloc)(void) = nullptr;
    int (*avcodec_send_packet)(AVCodecContext*, const AVPacket*) = nullptr;
    int (*avcodec_receive_frame)(AVCodecContext*, AVFrame*) = nullptr;
    SwsContext* (*sws_getContext)(int, int, enum AVPixelFormat, int, int,
                                  enum AVPixelFormat, int, SwsFilter*,
                                  SwsFilter*, const double*) = nullptr;
    int (*sws_scale)(SwsContext*, const uint8_t* const[], const int[], int,
                     int, uint8_t* const[], const int[]) = nullptr;
    void (*sws_freeContext)(SwsContext*) = nullptr;

    template <typename T>
    static bool sym(void* handle, const char* name, T& fn) {
        fn = reinterpret_cast<T>(dlsym(handle, name));
        return fn != nullptr;
    }

    bool load_from(const char* avcodec_path, const char* swscale_path) {
        // RTLD_LOCAL keeps the chosen copy out of the global symbol scope
        // (two ffmpeg builds coexist in this process when cv2 is loaded)
        void* ha = dlopen(avcodec_path, RTLD_NOW | RTLD_LOCAL);
        if (ha == nullptr) return false;
        void* hs = dlopen(swscale_path, RTLD_NOW | RTLD_LOCAL);
        if (hs == nullptr) { dlclose(ha); return false; }
        AvApi tmp;
        tmp.h_avcodec = ha;
        tmp.h_swscale = hs;
        bool ok = sym(ha, "avcodec_version", tmp.avcodec_version) &&
                  sym(ha, "avcodec_find_decoder", tmp.avcodec_find_decoder) &&
                  sym(ha, "avcodec_alloc_context3",
                      tmp.avcodec_alloc_context3) &&
                  sym(ha, "avcodec_open2", tmp.avcodec_open2) &&
                  sym(ha, "av_packet_alloc", tmp.av_packet_alloc) &&
                  sym(ha, "av_frame_alloc", tmp.av_frame_alloc) &&
                  sym(ha, "avcodec_send_packet", tmp.avcodec_send_packet) &&
                  sym(ha, "avcodec_receive_frame",
                      tmp.avcodec_receive_frame) &&
                  sym(hs, "sws_getContext", tmp.sws_getContext) &&
                  sym(hs, "sws_scale", tmp.sws_scale) &&
                  sym(hs, "sws_freeContext", tmp.sws_freeContext);
        if (ok) {
            const unsigned major = tmp.avcodec_version() >> 16;
            ok = major >= kMinAvcodecMajor && major <= kMaxAvcodecMajor;
        }
        if (!ok) {
            dlclose(ha);
            dlclose(hs);
            return false;
        }
        tmp.ready = true;
        *this = tmp;
        return true;
    }
};

AvApi g_api;  // set once before any decoding thread starts

struct AvState {
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    SwsContext* sws = nullptr;
    int sws_w = 0, sws_h = 0, sws_fmt = -1;
    std::vector<uint8_t> band;    // BGR24 scratch (over-allocated, see below)
    std::vector<uint8_t> padded;  // packet copy with the required padding
    bool failed = false;

    bool init() {
        if (ctx != nullptr || failed) return ctx != nullptr;
        if (!g_api.ready) { failed = true; return false; }
        const AVCodec* codec = g_api.avcodec_find_decoder(AV_CODEC_ID_MJPEG);
        if (codec == nullptr) { failed = true; return false; }
        ctx = g_api.avcodec_alloc_context3(codec);
        pkt = g_api.av_packet_alloc();
        frame = g_api.av_frame_alloc();
        if (ctx == nullptr || pkt == nullptr || frame == nullptr ||
            g_api.avcodec_open2(ctx, codec, nullptr) < 0) {
            failed = true;
            return false;
        }
        return true;
    }
};

// one decoder per thread: striped decode runs several workers, and the
// held frame must survive between avdec_decode and avdec_frame_to_gray
thread_local AvState tl_av;

// ---------------------------------------------------------------------------
// Gray-content fast path.
//
// Grayscale content stored as MJPG (the common case for microscopy cameras)
// decodes to U/V planes that take at most two distinct constants — ffmpeg's
// own mjpeg encoder rounds gray input to chroma 127 or 128 depending on the
// gray value. swscale's unscaled planar-YUV -> BGR24 converter is pointwise
// in luma and block-replicated in chroma, so over such frames the whole
// yuv -> swscale BGR24 -> exact-gray chain collapses to
// gray(x, y) = LUT[U_blk, V_blk][Y(x, y)]. None of that is assumed — it is
// established at runtime, per (w, h, pix_fmt, chroma value set), by running
// the REAL swscale converter over (a) 256 full-size constant-Y frames for
// EACH (u, v) combination, verifying the output at EVERY pixel position
// (rules out any positional term such as dithering), (b) one dense
// varying-Y pattern per combination (rules out cross-pixel luma filtering),
// and (c) a mixed chroma-checkerboard frame (rules out chroma
// interpolation across blocks). Only if every byte of every probe matches
// does the fast path arm; frames whose chroma has >2 values per plane (real
// color content) always take the full swscale path. The per-file
// first-frame byte-compare against cv2 (io/video.py) remains the outer
// guard.
struct ProvenGray {
    int w = 0, h = 0, fmt = -1;
    int n_u = 0, n_v = 0;
    uint8_t uvals[2] = {0, 0}, vvals[2] = {0, 0};
    bool ok = false;
    alignas(64) uint8_t lut[2][2][256];  // [u index][v index][Y]
};

// swapped under g_prove_mu, read lock-free; superseded sets are retired to
// a keep-alive list rather than freed (another decode thread may still be
// applying one; geometry changes are rare so the list stays tiny)
std::atomic<const ProvenGray*> g_proven{nullptr};
std::mutex g_prove_mu;
std::vector<const ProvenGray*> g_retired;
std::atomic<long> g_gray_fast_frames{0};

// chroma subsampling shifts for the formats the fast path understands;
// false for anything else (incl. non-planar or >8-bit formats)
bool chroma_shifts(int fmt, int* hsub, int* vsub) {
    switch (fmt) {
        case AV_PIX_FMT_YUV420P:
        case AV_PIX_FMT_YUVJ420P:
            *hsub = 1; *vsub = 1; return true;
        case AV_PIX_FMT_YUV422P:
        case AV_PIX_FMT_YUVJ422P:
            *hsub = 1; *vsub = 0; return true;
        case AV_PIX_FMT_YUV444P:
        case AV_PIX_FMT_YUVJ444P:
            *hsub = 0; *vsub = 0; return true;
        default:
            return false;
    }
}

void chroma_plane_dims(int w, int h, int hsub, int vsub, int* cw, int* ch) {
    *cw = (w + (1 << hsub) - 1) >> hsub;
    *ch = (h + (1 << vsub) - 1) >> vsub;
}

// Distinct values of one chroma plane, up to two; false when a third
// appears (real color content — fast path ineligible).
bool scan_plane_values(const uint8_t* p, int stride, int w, int h,
                       uint8_t vals[2], int* n_vals) {
    int n = 0;
    uint8_t v0 = 0, v1 = 0;
    for (int y = 0; y < h; ++y, p += stride) {
        int x = 0;
#if defined(__AVX512BW__)
        __m512i z0 = _mm512_set1_epi8(static_cast<char>(v0));
        __m512i z1 = _mm512_set1_epi8(static_cast<char>(v1));
        for (; x + 64 <= w;) {
            const __m512i q = _mm512_loadu_si512(p + x);
            __mmask64 known = _mm512_cmpeq_epi8_mask(q, z0);
            if (n == 2) known |= _mm512_cmpeq_epi8_mask(q, z1);
            if (n != 0 && known == ~__mmask64(0)) {
                x += 64;
                continue;
            }
            const uint8_t b = p[x + (n == 0 ? 0 : _tzcnt_u64(~known))];
            if (n == 0) {
                v0 = b; n = 1;
            } else if (n == 1) {
                v1 = b; n = 2;
            } else {
                return false;
            }
            z0 = _mm512_set1_epi8(static_cast<char>(v0));
            z1 = _mm512_set1_epi8(static_cast<char>(v1));
        }
#endif
        for (; x < w; ++x) {
            const uint8_t b = p[x];
            if (n != 0 && (b == v0 || (n == 2 && b == v1))) continue;
            if (n == 0) {
                v0 = b; n = 1;
            } else if (n == 1) {
                v1 = b; n = 2;
            } else {
                return false;
            }
        }
    }
    vals[0] = v0;
    vals[1] = n == 2 ? v1 : v0;
    *n_vals = n == 0 ? 1 : n;  // empty plane cannot happen for real frames
    return true;
}

#if defined(__AVX512BW__) && defined(__AVX512VBMI__)
// one 256-entry LUT lookup of 64 bytes: vpermi2b indexes 128 bytes by the
// low 7 bits; the high bit selects which half-table's result survives
inline __m512i lut256(__m512i x, __mmask64 top, const __m512i t[4]) {
    __m512i lo = _mm512_permutex2var_epi8(t[0], x, t[1]);
    __m512i hi = _mm512_permutex2var_epi8(t[2], x, t[3]);
    return _mm512_mask_blend_epi8(top, lo, hi);
}
#endif

// gray = lut[sel][y] over the luma plane, sel per chroma block: the
// per-pixel "second chroma value" selector masks come straight from
// compare + pdep bit-doubling on the chroma rows (no materialised selector
// rows).
void apply_gray_lut(const AVFrame* f, const ProvenGray& pg, uint8_t* out) {
    const int w = f->width, h = f->height;
    int hsub = 0, vsub = 0;
    chroma_shifts(f->format, &hsub, &vsub);
    const uint8_t* yp = f->data[0];
    const bool multi = pg.n_u == 2 || pg.n_v == 2;
    for (int y = 0; y < h; ++y, yp += f->linesize[0], out += w) {
        const int cy = y >> vsub;
        const uint8_t* up =
            f->data[1] + static_cast<int64_t>(cy) * f->linesize[1];
        const uint8_t* vp =
            f->data[2] + static_cast<int64_t>(cy) * f->linesize[2];
        int64_t i = 0;
#if defined(__AVX512BW__) && defined(__AVX512VBMI__) && \
    defined(__AVX512VL__) && defined(__BMI2__)
        __m512i t[2][2][4];
        for (int a = 0; a < (multi ? 2 : 1); ++a) {
            for (int b = 0; b < (multi ? 2 : 1); ++b) {
                for (int k = 0; k < 4; ++k) {
                    t[a][b][k] =
                        _mm512_loadu_si512(pg.lut[a][b] + 64 * k);
                }
            }
        }
        if (!multi) {
            for (; i + 64 <= w; i += 64) {
                __m512i x = _mm512_loadu_si512(yp + i);
                __mmask64 top = _mm512_movepi8_mask(x);
                _mm512_storeu_si512(out + i, lut256(x, top, t[0][0]));
            }
        } else {
            const __m256i u1 =
                _mm256_set1_epi8(static_cast<char>(pg.uvals[1]));
            const __m256i v1 =
                _mm256_set1_epi8(static_cast<char>(pg.vvals[1]));
            for (; i + 64 <= w; i += 64) {
                __m512i x = _mm512_loadu_si512(yp + i);
                __mmask64 top = _mm512_movepi8_mask(x);
                __mmask64 mu, mv;
                if (hsub != 0) {
                    // 32 chroma samples cover these 64 pixels; double each
                    // compare bit into a pixel-pair mask
                    const __m256i uc = _mm256_loadu_si256(
                        reinterpret_cast<const __m256i*>(up + (i >> 1)));
                    const __m256i vc = _mm256_loadu_si256(
                        reinterpret_cast<const __m256i*>(vp + (i >> 1)));
                    const uint64_t su = _pdep_u64(
                        _mm256_cmpeq_epi8_mask(uc, u1),
                        0x5555555555555555ull);
                    const uint64_t sv = _pdep_u64(
                        _mm256_cmpeq_epi8_mask(vc, v1),
                        0x5555555555555555ull);
                    mu = su | (su << 1);
                    mv = sv | (sv << 1);
                } else {
                    mu = _mm512_cmpeq_epi8_mask(
                        _mm512_loadu_si512(up + i),
                        _mm512_broadcast_i32x4(_mm256_castsi256_si128(u1)));
                    mv = _mm512_cmpeq_epi8_mask(
                        _mm512_loadu_si512(vp + i),
                        _mm512_broadcast_i32x4(_mm256_castsi256_si128(v1)));
                }
                __m512i r0 = _mm512_mask_blend_epi8(
                    mv, lut256(x, top, t[0][0]), lut256(x, top, t[0][1]));
                __m512i r1 = _mm512_mask_blend_epi8(
                    mv, lut256(x, top, t[1][0]), lut256(x, top, t[1][1]));
                _mm512_storeu_si512(out + i,
                                    _mm512_mask_blend_epi8(mu, r0, r1));
            }
        }
#endif
        if (!multi) {
            for (; i < w; ++i) {
                out[i] = pg.lut[0][0][yp[i]];
            }
        } else {
            for (; i < w; ++i) {
                const int cx = static_cast<int>(i) >> hsub;
                out[i] = pg.lut[up[cx] == pg.uvals[1]]
                               [vp[cx] == pg.vvals[1]][yp[i]];
            }
        }
    }
}

// Run the real converter on synthetic probe frames to derive and verify
// the per-(u, v) LUTs; fills pg.lut and sets pg.ok.
void prove_gray_identity(ProvenGray& pg) {
    pg.ok = false;
    int hsub = 0, vsub = 0;
    if (!chroma_shifts(pg.fmt, &hsub, &vsub)) return;
    int cw = 0, ch = 0;
    chroma_plane_dims(pg.w, pg.h, hsub, vsub, &cw, &ch);
    SwsContext* sws = g_api.sws_getContext(
        pg.w, pg.h, static_cast<AVPixelFormat>(pg.fmt),
        pg.w, pg.h, AV_PIX_FMT_BGR24, SWS_BICUBIC, nullptr, nullptr,
        nullptr);
    if (sws == nullptr) return;
    const int w = pg.w, h = pg.h;
    const int64_t n = static_cast<int64_t>(w) * h;
    const size_t cn = static_cast<size_t>(cw) * ch;
    std::vector<uint8_t> yp(n), up(cn), vp(cn), bgr(n * 3 + 256), gray(n);
    const uint8_t* src[4] = {yp.data(), up.data(), vp.data(), nullptr};
    int sstride[4] = {w, cw, cw, 0};
    uint8_t* dst[4] = {bgr.data(), nullptr, nullptr, nullptr};
    int dstride[4] = {w * 3, 0, 0, 0};
    const auto dense_y = [&]() {
        uint32_t s = 0x9e3779b9u;
        for (int64_t i = 0; i < n; ++i) {
            s = s * 1664525u + 1013904223u;
            yp[i] = static_cast<uint8_t>((s >> 24) ^ (i & 0xff));
        }
    };
    bool ok = true;
    for (int a = 0; a < pg.n_u && ok; ++a) {
        for (int b = 0; b < pg.n_v && ok; ++b) {
            std::memset(up.data(), pg.uvals[a], cn);
            std::memset(vp.data(), pg.vvals[b], cn);
            uint8_t* lut = pg.lut[a][b];
            // (a) every Y value at every position, constant chroma
            for (int v = 0; v < 256 && ok; ++v) {
                std::memset(yp.data(), v, n);
                if (g_api.sws_scale(sws, src, sstride, 0, h, dst,
                                    dstride) != h) {
                    ok = false;
                    break;
                }
                ysmr_gray::bgr_to_gray(bgr.data(), n, gray.data());
                lut[v] = gray[0];
                for (int64_t i = 0; i < n; ++i) {
                    if (gray[i] != lut[v]) { ok = false; break; }
                }
            }
            // (b) dense varying Y: refutes cross-pixel luma filtering
            if (ok) {
                dense_y();
                ok = g_api.sws_scale(sws, src, sstride, 0, h, dst,
                                     dstride) == h;
                if (ok) {
                    ysmr_gray::bgr_to_gray(bgr.data(), n, gray.data());
                    for (int64_t i = 0; i < n; ++i) {
                        if (gray[i] != lut[yp[i]]) { ok = false; break; }
                    }
                }
            }
        }
    }
    // (c) mixed chroma checkerboard + dense Y: refutes chroma
    // interpolation/bleed across blocks (the converter must replicate each
    // chroma sample over its own block only)
    if (ok && (pg.n_u == 2 || pg.n_v == 2)) {
        dense_y();
        for (int cy = 0; cy < ch; ++cy) {
            for (int cx = 0; cx < cw; ++cx) {
                up[static_cast<size_t>(cy) * cw + cx] =
                    pg.uvals[(cx + cy) & (pg.n_u - 1)];
                vp[static_cast<size_t>(cy) * cw + cx] =
                    pg.vvals[(cx + (cy >> 1)) & (pg.n_v - 1)];
            }
        }
        ok = g_api.sws_scale(sws, src, sstride, 0, h, dst, dstride) == h;
        if (ok) {
            ysmr_gray::bgr_to_gray(bgr.data(), n, gray.data());
            for (int64_t i = 0; i < n && ok; ++i) {
                const int x = static_cast<int>(i % w);
                const int y = static_cast<int>(i / w);
                const int cx = x >> hsub, cy = y >> vsub;
                const uint8_t* lut =
                    pg.lut[(cx + cy) & (pg.n_u - 1)]
                          [(cx + (cy >> 1)) & (pg.n_v - 1)];
                if (gray[i] != lut[yp[i]]) ok = false;
            }
        }
    }
    g_api.sws_freeContext(sws);
    pg.ok = ok;
}

// The proven set matching the held frame, or nullptr. Scans the chroma
// planes (<= 2 distinct values each, else ineligible) and arms the proof
// on first sight of a new (geometry, chroma set) combination.
const ProvenGray* gray_fast_eligible(AvState& av) {
    const int w = av.frame->width, h = av.frame->height;
    const int fmt = av.frame->format;
    int hsub = 0, vsub = 0;
    if (!chroma_shifts(fmt, &hsub, &vsub)) return nullptr;
    if (av.frame->data[1] == nullptr || av.frame->data[2] == nullptr) {
        return nullptr;
    }
    int cw = 0, ch = 0;
    chroma_plane_dims(w, h, hsub, vsub, &cw, &ch);
    uint8_t uvals[2], vvals[2];
    int n_u = 0, n_v = 0;
    if (!scan_plane_values(av.frame->data[1], av.frame->linesize[1], cw, ch,
                           uvals, &n_u) ||
        !scan_plane_values(av.frame->data[2], av.frame->linesize[2], cw, ch,
                           vvals, &n_v)) {
        return nullptr;
    }
    // the frame's chroma values must be a SUBSET of the proven set (apply
    // compares the actual chroma bytes against the set's values, so a
    // single-value frame runs fine under a two-value proof)
    const auto subset = [](const uint8_t* fv, int fn, const uint8_t* pv,
                           int pn) {
        for (int i = 0; i < fn; ++i) {
            bool found = false;
            for (int j = 0; j < pn; ++j) found |= fv[i] == pv[j];
            if (!found) return false;
        }
        return true;
    };
    const auto matches = [&](const ProvenGray* pg) {
        return pg != nullptr && pg->w == w && pg->h == h &&
               pg->fmt == fmt && subset(uvals, n_u, pg->uvals, pg->n_u) &&
               subset(vvals, n_v, pg->vvals, pg->n_v);
    };
    const ProvenGray* cur = g_proven.load(std::memory_order_acquire);
    if (matches(cur)) return cur->ok ? cur : nullptr;
    std::lock_guard<std::mutex> lock(g_prove_mu);
    cur = g_proven.load(std::memory_order_relaxed);
    if (matches(cur)) return cur->ok ? cur : nullptr;
    ProvenGray* pg = new ProvenGray();
    pg->w = w; pg->h = h; pg->fmt = fmt;
    pg->n_u = n_u; pg->n_v = n_v;
    pg->uvals[0] = uvals[0]; pg->uvals[1] = uvals[1];
    pg->vvals[0] = vvals[0]; pg->vvals[1] = vvals[1];
    // merge the superseded set's values (same geometry) so alternating
    // single-value frames cannot thrash re-proofs
    if (cur != nullptr && cur->w == w && cur->h == h && cur->fmt == fmt) {
        const auto merge = [](uint8_t* vals, int* n, const uint8_t* old,
                              int n_old) {
            for (int i = 0; i < n_old && *n < 2; ++i) {
                bool present = false;
                for (int j = 0; j < *n; ++j) present |= old[i] == vals[j];
                if (!present) vals[(*n)++] = old[i];
            }
            if (*n == 1) vals[1] = vals[0];
        };
        merge(pg->uvals, &pg->n_u, cur->uvals, cur->n_u);
        merge(pg->vvals, &pg->n_v, cur->vvals, cur->n_v);
    }
    prove_gray_identity(*pg);
    if (cur != nullptr) g_retired.push_back(cur);
    g_proven.store(pg, std::memory_order_release);
    return pg->ok ? pg : nullptr;
}

// ---------------------------------------------------------------------------
// First-party baseline MJPEG decoder ("jdec").
//
// Replaces the libavcodec decode call for the gray-content fast path while
// staying byte-exact with it: the bitstream layer reproduces mjpegdec's
// dequant semantics exactly (DC prediction in the dequantized domain with
// initial bias 1024 and int16 clipping; AC level*quant stored with int16
// wraparound; coefficients placed through the FF_IDCT_PERM_TRANSPOSE
// scantable), and the final transform is THE DECODER'S OWN idct_put
// routine, located at runtime inside the opened codec's IDCTDSPContext by
// structural signature (six code pointers + a 64-byte permutation table —
// see avdec_find_idct below). Exactness was validated plane-by-plane
// against libavcodec on real clips (Y/U/V 100 %); the per-file first-frame
// byte-compare in io/video.py remains the outer guard, and ANY feature
// outside the cv2-MJPG-writer profile (non-baseline, restart intervals,
// chroma AC energy, unproven gray LUT, ...) declines to the regular
// libavcodec path. What it buys: no avcodec per-frame overhead, no chroma
// IDCT/store for DC-only chroma (one flat value per block via a tiny LUT),
// and luma IDCT output written once into a padded plane that feeds the
// proven gray LUT directly.
// ---------------------------------------------------------------------------

// the decoder's own idct_put, discovered once per process
struct IdctHook {
    void (*idct_put)(uint8_t*, ptrdiff_t, int16_t*) = nullptr;
    bool tried = false;
};
IdctHook g_idct;
std::mutex g_idct_mu;
std::atomic<long> g_jdec_frames{0};
std::atomic<uint64_t> g_jdec_tsc_entropy{0};  // entropy+idct cycles
std::atomic<uint64_t> g_jdec_tsc_lut{0};      // gray-LUT band cycles

// transposed-natural position of each zigzag index (the layout the located
// idct expects: FF_IDCT_PERM_TRANSPOSE applied to the natural scan)
constexpr uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct TransposedZigzag {
    uint8_t tz[64];
    constexpr TransposedZigzag() : tz() {
        for (int i = 0; i < 64; ++i) {
            tz[i] = static_cast<uint8_t>((kZigzag[i] & 7) * 8 +
                                         (kZigzag[i] >> 3));
        }
    }
};
constexpr TransposedZigzag kTz;

// scan the opened decoder's private context for the IDCTDSPContext
// signature; returns the number of matches and fills ptrs/perm/perm_type
// for up to max_out of them
int scan_idct_candidates(AvState& av, int max_out, int64_t ptrs[][6],
                         uint8_t perm[][64], int32_t* perm_type,
                         size_t* priv_off, uintptr_t* lib_base) {
    Dl_info info;
    if (dladdr(reinterpret_cast<void*>(g_api.avcodec_version), &info) == 0 ||
        info.dli_fbase == nullptr) {
        return -1;
    }
    const uintptr_t base = reinterpret_cast<uintptr_t>(info.dli_fbase);
    const uintptr_t lib_hi = base + (uintptr_t(1) << 25);
    if (lib_base != nullptr) *lib_base = base;
    const uint8_t* priv = static_cast<const uint8_t*>(av.ctx->priv_data);
    if (priv == nullptr) return -2;
    const size_t usable = malloc_usable_size(
        const_cast<void*>(static_cast<const void*>(priv)));
    if (usable < 128 || usable > (size_t(1) << 24)) return -3;
    int n = 0;
    for (size_t o = 48; o + 68 <= usable && n < max_out; o += 8) {
        const uint8_t* p = priv + o;
        uint64_t seen_lo = 0, seen_hi = 0;
        bool is_perm = true;
        for (int i = 0; i < 64; ++i) {
            const uint8_t v = p[i];
            if (v >= 64) { is_perm = false; break; }
            uint64_t& word = v < 32 ? seen_lo : seen_hi;
            const uint64_t bit = uint64_t(1) << (v & 31);
            if (word & bit) { is_perm = false; break; }
            word |= bit;
        }
        if (!is_perm) continue;
        const int64_t* words = reinterpret_cast<const int64_t*>(priv + o - 48);
        int in_lib = 0, nulls = 0;
        for (int i = 0; i < 6; ++i) {
            const uint64_t v = static_cast<uint64_t>(words[i]);
            if (v == 0) { ++nulls; continue; }
            if (v >= base && v < lib_hi) ++in_lib;
        }
        if (in_lib < 4 || in_lib + nulls != 6) continue;
        for (int i = 0; i < 6; ++i) ptrs[n][i] = words[i];
        std::memcpy(perm[n], p, 64);
        if (perm_type != nullptr) {
            perm_type[n] = *reinterpret_cast<const int32_t*>(p + 64);
        }
        if (priv_off != nullptr) priv_off[n] = o;
        ++n;
    }
    return n;
}

// locate + functionally sanity-check the decoder's idct_put once per
// process; false when unavailable (jdec declines, avcodec path serves)
bool idct_hook_ready(AvState& av) {
    std::lock_guard<std::mutex> lock(g_idct_mu);
    if (g_idct.tried) return g_idct.idct_put != nullptr;
    g_idct.tried = true;
    int64_t ptrs[2][6];
    uint8_t perm[2][64];
    int32_t ptype[2];
    const int n = scan_idct_candidates(av, 2, ptrs, perm, ptype, nullptr,
                                       nullptr);
    if (n != 1) return false;  // ambiguous or missing: stay on avcodec
    // the dequant layout above bakes in the transpose permutation — accept
    // only that layout (perm[i] == transpose(i))
    for (int i = 0; i < 64; ++i) {
        if (perm[0][i] != (i & 7) * 8 + (i >> 3)) return false;
    }
    auto put = reinterpret_cast<void (*)(uint8_t*, ptrdiff_t, int16_t*)>(
        ptrs[0][4]);
    if (put == nullptr) return false;
    // functional probes: a DC-only block must come out flat at round(dc/8)
    // (the 1024 bias is mid-gray 128), clamped to u8 at the top. Probes
    // stay within |dc<<3| < 2^15: ffmpeg's SIMD simple_idct wraps 16-bit
    // beyond that (measured: dc=4096 -> 0), and since the hook IS the
    // decoder's own routine that wraparound is exactness, not error.
    alignas(64) int16_t blk[64];
    alignas(64) uint8_t out[64];
    const int dc_probe[4] = {0, 8, 1024, 2040};
    const int expect[4] = {0, 1, 128, 255};
    for (int t = 0; t < 4; ++t) {
        std::memset(blk, 0, sizeof blk);
        blk[0] = static_cast<int16_t>(dc_probe[t]);
        put(out, 8, blk);
        for (int i = 0; i < 64; ++i) {
            if (out[i] != expect[t]) return false;
        }
    }
    g_idct.idct_put = put;
    return true;
}

// flat output byte of a DC-only block through the real idct (lazy map;
// chroma blocks of gray content are DC-only so one transform per distinct
// DC value ever runs)
struct DcFlatLut {
    std::vector<int16_t> map;  // -1 = unknown, else 0..255
    DcFlatLut() : map(65536, -1) {}
    // returns -1 when the real idct's output is not flat (cannot happen
    // for a linear-in-DC transform, but verified rather than assumed)
    int get(int16_t dc) {
        int16_t& slot = map[static_cast<uint16_t>(dc)];
        if (slot >= 0) return slot;
        alignas(64) int16_t blk[64];
        alignas(64) uint8_t out[64];
        std::memset(blk, 0, sizeof blk);
        blk[0] = dc;
        g_idct.idct_put(out, 8, blk);
        for (int i = 1; i < 64; ++i) {
            if (out[i] != out[0]) return -1;
        }
        slot = out[0];
        return slot;
    }
};
thread_local DcFlatLut tl_dcflat;

// MSB-first bit reader over the unstuffed entropy bytes; reads past the
// end deliver zero bits, and ``bits_consumed()`` exposes exactly how many
// bits the decode used so the caller can verify none were fabricated.
// Protocol: call refill56() once, then consume at most 56 bits before the
// next refill — TWO Huffman code + value pairs (<=27 bits each: code <=16
// after the fallback size guard, value <=11) fit in one window, which is
// what lets the block loop decode two coefficients per refill.
struct BitReader {
    uint64_t buf;       // next bits, left-aligned
    int n;              // valid bits in buf
    const uint8_t* p;
    const uint8_t* start;
    const uint8_t* end;
    int64_t overrun = 0;  // zero bytes appended past the stream end

    BitReader(const uint8_t* d, const uint8_t* e)
        : buf(0), n(0), p(d), start(d), end(e) {}

    __attribute__((always_inline)) inline void refill56() {
        if (n >= 56) return;
        if (__builtin_expect(p + 8 <= end, 1)) {
            // branchless 8-byte refill (lookahead style): the OR also
            // deposits <8 uncounted bits of the first unconsumed byte,
            // but those are the correct next stream bits at the correct
            // position, so the next refill's OR over them is idempotent.
            uint64_t v;
            std::memcpy(&v, p, 8);
            buf |= __builtin_bswap64(v) >> n;
            p += (63 - n) >> 3;
            n |= 56;  // == n + 8 * ((63 - n) >> 3)
            return;
        }
        while (n <= 56) {
            if (p < end) {
                buf |= static_cast<uint64_t>(*p++) << (56 - n);
            } else {
                ++overrun;
            }
            n += 8;
        }
    }
    // k in [1, 32] and already refilled
    __attribute__((always_inline)) inline int bits(int k) {
        const int v = static_cast<int>(buf >> (64 - k));
        buf <<= k;
        n -= k;
        return v;
    }
    // bits actually taken from the stream so far; beyond 8*stream_size
    // means zero bits were fabricated into decoded values (phantom bytes
    // merely BUFFERED by an end-of-stream refill do not count)
    int64_t bits_consumed() const {
        return 8 * ((p - start) + overrun) - n;
    }
};

// two-level Huffman table: 12-bit combined (code + run/size split) fast
// lookup + mincode/maxcode fallback for longer codes
struct HuffTab {
    int16_t fast[1 << 10];  // (symbol << 5) | code_length, 0 = long code
    // combined entry for codes of length <= 12:
    // len | run << 5 | size << 9; -1 = long code (fallback). For DC
    // tables the symbol s lands in the size nibble (run = 0), so the
    // same one-step decode serves DC diffs and AC run/levels.
    int16_t comb[1 << 12];
    int32_t maxcode[17];    // per length, largest code (or -1)
    int32_t valbase[17];    // vals index of first code of this length
    int32_t mincode[17];
    uint8_t vals[256];
    bool ok = false;

    bool build(const uint8_t* bits, const uint8_t* v, int nv) {
        ok = false;
        std::memset(fast, 0, sizeof fast);
        std::memset(comb, 0xFF, sizeof comb);
        std::memcpy(vals, v, nv);
        int code = 0, k = 0;
        for (int len = 1; len <= 16; ++len) {
            mincode[len] = code;
            valbase[len] = k;
            for (int c = 0; c < bits[len - 1]; ++c, ++k, ++code) {
                if (k >= nv || code >= (1 << len)) return false;
                if (len <= 10) {
                    const int shift = 10 - len;
                    const int lo = code << shift;
                    const int16_t e = static_cast<int16_t>((v[k] << 5) | len);
                    for (int f = 0; f < (1 << shift); ++f) fast[lo + f] = e;
                }
                if (len <= 12) {
                    const int shift = 12 - len;
                    const int lo = code << shift;
                    const int16_t e = static_cast<int16_t>(
                        len | ((v[k] >> 4) << 5) | ((v[k] & 15) << 9));
                    for (int f = 0; f < (1 << shift); ++f) comb[lo + f] = e;
                }
            }
            maxcode[len] = code - 1;
            if (bits[len - 1] == 0) maxcode[len] = -1;
            code <<= 1;
        }
        ok = true;
        return true;
    }

    // -1 on invalid code; caller must have refilled (>=16 bits buffered)
    __attribute__((always_inline)) inline int decode(BitReader& br) {
        const uint32_t look = static_cast<uint32_t>(br.buf >> 48);
        const int16_t e = fast[look >> 6];
        if (__builtin_expect(e != 0, 1)) {
            const int len = e & 31;
            br.buf <<= len;
            br.n -= len;
            return e >> 5;
        }
        // long code: walk lengths 11..16
        int code = static_cast<int>(look >> 5);  // 11 bits
        for (int len = 11; len <= 16; ++len) {
            if (maxcode[len] >= 0 && code <= maxcode[len]) {
                br.buf <<= len;
                br.n -= len;
                return vals[valbase[len] + (code - mincode[len])];
            }
            code = (code << 1) | static_cast<int>(
                (look >> (16 - len - 1)) & 1);
        }
        return -1;
    }

    // one (run, size, raw value bits) triple in a single step: the comb
    // fast path consumes code + value bits with one shift pair; long codes
    // fall back to the mincode walk. Needs >=31 buffered bits (code <=16,
    // value <=15). Returns false on an invalid code.
    __attribute__((always_inline)) inline bool rsv(BitReader& br, int* r,
                                                   int* sz, int* raw) {
        const int e = comb[static_cast<uint32_t>(br.buf >> 52)];
        if (__builtin_expect(e >= 0, 1)) {
            const int len = e & 31;
            *r = (e >> 5) & 15;
            *sz = (e >> 9) & 15;
            const uint64_t sh = br.buf << len;
            br.buf = sh << *sz;
            br.n -= len + *sz;
            // (sh>>1)>>(63-sz) == sh>>(64-sz), safe at sz==0
            *raw = static_cast<int>((sh >> 1) >> (63 - *sz));
            return true;
        }
        const int rs = decode(br);
        if (rs < 0) return false;
        *r = rs >> 4;
        *sz = rs & 15;
        *raw = *sz != 0 ? br.bits(*sz) : 0;
        return true;
    }
};

struct JdecHeader {
    int w = 0, h = 0;
    int ch = 0, cv = 0;          // luma sampling factors (chroma fixed 1x1)
    int comp_q[3] = {0, 0, 0};   // quant table id per component
    int comp_dc[3] = {0, 0, 0};  // huffman table ids per component
    int comp_ac[3] = {0, 0, 0};
    int64_t scan_start = 0;      // byte offset of entropy data
};

struct JDec {
    uint64_t hdr_hash = 0;
    bool tables_ok = false;
    HuffTab hdc[4], hac[4];
    uint16_t qtab[4][64];        // zigzag order, 8-bit precision
    bool qvalid[4] = {false, false, false, false};
    std::vector<uint8_t> scan;   // unstuffed entropy bytes
    std::vector<uint8_t> yplane; // padded to whole blocks
    std::vector<uint8_t> urow, vrow;  // synthesized chroma sample rows
};
thread_local JDec tl_jd;

// parse every marker up to SOS; returns 0 ok, 1 decline (unsupported
// profile), <0 malformed. Table segments are hashed so repeated identical
// headers (the MJPG stream case) skip the Huffman table rebuild.
int jdec_parse_header(const uint8_t* d, int64_t size, JdecHeader* hd,
                      JDec& jd, bool* tables_changed) {
    if (size < 4 || d[0] != 0xFF || d[1] != 0xD8) return -1;
    int64_t i = 2;
    uint64_t hash = 1469598103934665603ull;
    const auto mix = [&hash](const uint8_t* p, int64_t n) {
        for (int64_t k = 0; k < n; ++k) {
            hash = (hash ^ p[k]) * 1099511628211ull;
        }
    };
    struct Seg { int64_t off, len; uint8_t marker; };
    std::vector<Seg> table_segs;
    bool have_sof = false, have_sos = false;
    while (i + 4 <= size) {
        if (d[i] != 0xFF) return -2;
        const uint8_t m = d[i + 1];
        i += 2;
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;
        if (i + 2 > size) return -3;
        const int64_t ln = (static_cast<int64_t>(d[i]) << 8) | d[i + 1];
        if (ln < 2 || i + ln > size) return -4;
        const uint8_t* seg = d + i + 2;
        const int64_t segn = ln - 2;
        switch (m) {
            case 0xDB:
            case 0xC4:
                table_segs.push_back({i + 2, segn, m});
                mix(&m, 1);
                mix(seg, segn);
                break;
            case 0xC0: {  // baseline SOF
                if (segn < 6 || seg[0] != 8) return 1;
                hd->h = (seg[1] << 8) | seg[2];
                hd->w = (seg[3] << 8) | seg[4];
                if (seg[5] != 3 || segn < 6 + 9) return 1;
                for (int c = 0; c < 3; ++c) {
                    const int hv = seg[7 + 3 * c];
                    const int sh = hv >> 4, sv = hv & 15;
                    if (c == 0) {
                        if (sh < 1 || sh > 2 || sv < 1 || sv > 2) return 1;
                        hd->ch = sh;
                        hd->cv = sv;
                    } else if (sh != 1 || sv != 1) {
                        return 1;
                    }
                    hd->comp_q[c] = seg[8 + 3 * c];
                    if (hd->comp_q[c] > 3) return 1;
                }
                have_sof = true;
                break;
            }
            case 0xC1: case 0xC2: case 0xC3: case 0xC5: case 0xC6:
            case 0xC7: case 0xC9: case 0xCA: case 0xCB: case 0xCD:
            case 0xCE: case 0xCF:
                return 1;  // non-baseline frame types
            case 0xDD: {  // DRI: only a zero restart interval is supported
                if (segn < 2 || ((seg[0] << 8) | seg[1]) != 0) return 1;
                break;
            }
            case 0xDA: {  // SOS
                if (segn < 1 + 2 * 3 + 3 || seg[0] != 3) return 1;
                for (int c = 0; c < 3; ++c) {
                    const int t = seg[2 + 2 * c];
                    hd->comp_dc[c] = t >> 4;
                    hd->comp_ac[c] = t & 15;
                    if (hd->comp_dc[c] > 3 || hd->comp_ac[c] > 3) return 1;
                }
                // spectral selection / successive approximation must be
                // the baseline full-scan values
                if (seg[7] != 0 || seg[8] != 63 || seg[9] != 0) return 1;
                hd->scan_start = i + ln;
                have_sos = true;
                break;
            }
            default:
                break;  // APPn / COM / others: ignored
        }
        if (have_sos) break;
        i += ln;
    }
    if (!have_sof || !have_sos) return have_sof ? -5 : 1;
    *tables_changed = hash != jd.hdr_hash || !jd.tables_ok;
    if (*tables_changed) {
        for (auto& q : jd.qvalid) q = false;
        for (auto& t : jd.hdc) t.ok = false;
        for (auto& t : jd.hac) t.ok = false;
        for (const Seg& s : table_segs) {
            const uint8_t* seg = d + s.off;
            int64_t j = 0;
            if (s.marker == 0xDB) {
                while (j < s.len) {
                    const int pq = seg[j] >> 4, tq = seg[j] & 15;
                    if (pq != 0 || tq > 3 || j + 65 > s.len) return 1;
                    for (int k = 0; k < 64; ++k) {
                        jd.qtab[tq][k] = seg[j + 1 + k];
                    }
                    jd.qvalid[tq] = true;
                    j += 65;
                }
            } else {  // DHT
                while (j < s.len) {
                    const int tc = seg[j] >> 4, th = seg[j] & 15;
                    if (tc > 1 || th > 3 || j + 17 > s.len) return 1;
                    int nv = 0;
                    for (int k = 0; k < 16; ++k) nv += seg[j + 1 + k];
                    if (nv > 256 || j + 17 + nv > s.len) return 1;
                    HuffTab& t = tc == 0 ? jd.hdc[th] : jd.hac[th];
                    if (!t.build(seg + j + 1, seg + j + 17, nv)) return 1;
                    j += 17 + nv;
                }
            }
        }
        jd.hdr_hash = hash;
        jd.tables_ok = true;
    }
    for (int c = 0; c < 3; ++c) {
        if (!jd.qvalid[hd->comp_q[c]] || !jd.hdc[hd->comp_dc[c]].ok ||
            !jd.hac[hd->comp_ac[c]].ok) {
            return 1;
        }
    }
    return 0;
}

// strip byte-stuffing (FF 00 -> FF) from the entropy segment into
// jd.scan; stops at EOI. 1 = decline (restart marker or stray marker).
int jdec_unstuff(const uint8_t* d, int64_t size, int64_t start, JDec& jd) {
    jd.scan.clear();
    jd.scan.reserve(static_cast<size_t>(size - start));
    const uint8_t* p = d + start;
    const uint8_t* end = d + size;
    while (p < end) {
        const uint8_t* ff = static_cast<const uint8_t*>(
            std::memchr(p, 0xFF, static_cast<size_t>(end - p)));
        if (ff == nullptr) {
            jd.scan.insert(jd.scan.end(), p, end);
            break;
        }
        jd.scan.insert(jd.scan.end(), p, ff);
        if (ff + 1 >= end) break;
        const uint8_t nxt = ff[1];
        if (nxt == 0x00) {
            jd.scan.push_back(0xFF);
            p = ff + 2;
        } else if (nxt == 0xD9) {
            break;  // EOI
        } else if (nxt == 0xFF) {
            p = ff + 1;  // fill byte before a marker
        } else {
            return 1;  // restart or unexpected marker mid-scan
        }
    }
    return 0;
}

inline int extend_sign(int v, int s) {
    if (s == 0) return 0;
    // branchless: the sign bit (bit s-1) is data-dependent coin-flip noise
    // on real content — a conditional here mispredicts ~50 % of the time
    const int m = ((v >> (s - 1)) & 1) ^ 1;  // 1 when negative-coded
    return v - (((1 << s) - 1) & -m);
}

// last checkpoint jdec_decode_gray passed before returning (diagnostics)
thread_local int tl_jdec_stage = 0;

// Decode one frame straight to the exact gray plane. Returns 0 on
// success, 1 to decline (caller runs the regular libavcodec path), <0 on
// malformed data (caller also falls back).
int jdec_decode_gray(const uint8_t* jpg, int64_t size, uint8_t* gray,
                     int64_t cap, int64_t* out_dims) {
    tl_jdec_stage = 0;
    if (!g_api.ready) return 1;
    JDec& jd = tl_jd;
    JdecHeader hd;
    bool tables_changed = false;
    int rc = jdec_parse_header(jpg, size, &hd, jd, &tables_changed);
    if (rc != 0) return rc;
    tl_jdec_stage = 1;
    const int w = hd.w, h = hd.h;
    if (w <= 0 || h <= 0 ||
        static_cast<int64_t>(w) * h > cap ||
        static_cast<int64_t>(w) * h > (int64_t(1) << 28)) {
        return 1;
    }
    tl_jdec_stage = 2;
    // the gray LUT must already be proven for this exact geometry and the
    // sampling layout must match the proof's pixel format
    const ProvenGray* pg = g_proven.load(std::memory_order_acquire);
    if (pg == nullptr || !pg->ok || pg->w != w || pg->h != h) return 1;
    tl_jdec_stage = 3;
    int hsub = 0, vsub = 0;
    if (!chroma_shifts(pg->fmt, &hsub, &vsub)) return 1;
    if (hsub != hd.ch - 1 || vsub != hd.cv - 1) return 1;
    tl_jdec_stage = 4;
    AvState& av = tl_av;
    if (!av.init() || !idct_hook_ready(av)) return 1;
    tl_jdec_stage = 5;
    if (jdec_unstuff(jpg, size, hd.scan_start, jd) != 0) return 1;
    tl_jdec_stage = 6;

    const int mcu_w = 8 * hd.ch, mcu_h = 8 * hd.cv;
    const int mcus_x = (w + mcu_w - 1) / mcu_w;
    const int mcus_y = (h + mcu_h - 1) / mcu_h;
    const int ypw = mcus_x * mcu_w;
    const int yph = mcus_y * mcu_h;
    // one MCU row band only: keeps the idct stores and the LUT reads
    // inside L1/L2 instead of streaming a full padded plane through cache
    (void)yph;
    jd.yplane.resize(static_cast<size_t>(ypw) * mcu_h);
    int cw = 0, chh = 0;
    chroma_plane_dims(w, h, hsub, vsub, &cw, &chh);
    jd.urow.resize(static_cast<size_t>(mcus_x) * 8);
    jd.vrow.resize(static_cast<size_t>(mcus_x) * 8);

    DcFlatLut& dcflat = tl_dcflat;  // hoist the TLS lookup out of the loop
    BitReader br{jd.scan.data(), jd.scan.data() + jd.scan.size()};
    alignas(64) int16_t blk[64];
    int last_dc[3] = {1024, 1024, 1024};
    const uint16_t* qy = jd.qtab[hd.comp_q[0]];
    const uint16_t* qu = jd.qtab[hd.comp_q[1]];
    const uint16_t* qv = jd.qtab[hd.comp_q[2]];
    HuffTab& ydc = jd.hdc[hd.comp_dc[0]];
    HuffTab& yac = jd.hac[hd.comp_ac[0]];

    // gray LUT application state (same kernel family as apply_gray_lut,
    // but the chroma selectors come from synthesized constant rows)
    const bool multi = pg->n_u == 2 || pg->n_v == 2;
    for (int my = 0; my < mcus_y; ++my) {
        const uint64_t tsc0 = __builtin_ia32_rdtsc();
        // --- entropy-decode one MCU row ---
        for (int mx = 0; mx < mcus_x; ++mx) {
            // luma blocks
            for (int by = 0; by < hd.cv; ++by) {
                for (int bx = 0; bx < hd.ch; ++bx) {
                    std::memset(blk, 0, sizeof blk);
                    br.refill56();
                    int r, s, raw;
                    if (!ydc.rsv(br, &r, &s, &raw)) return -6;
                    if (r != 0 || s > 11) return -6;
                    const int diff = extend_sign(raw, s);
                    int val = diff * static_cast<int>(qy[0]) + last_dc[0];
                    val = val < -32768 ? -32768 : (val > 32767 ? 32767 : val);
                    last_dc[0] = val;
                    blk[0] = static_cast<int16_t>(val);
                    // two coefficients per refill window: one 56-bit
                    // refill covers two worst-case comb pairs (<=27 bits
                    // each); only when the FIRST symbol takes the
                    // long-code fallback (<=31 bits) can the window dip
                    // below the second's worst case — topped back up then.
                    // (A 12-bit TWO-coefficient pair table was tried and
                    // is SLOWER here: ~5-6-bit average symbols mean most
                    // code+value pairs spill past 12 bits, so the extra
                    // 16 KB lookup lengthens the serial chain on misses —
                    // measured +1.2 ms/frame vs this loop.)
                    int k = 1;
                    while (k < 64) {
                        br.refill56();
                        for (int rep = 0; rep < 2 && k < 64; ++rep) {
                            int sz;
                            if (__builtin_expect(rep != 0 && br.n < 32, 0)) {
                                br.refill56();
                            }
                            if (!yac.rsv(br, &r, &sz, &raw)) return -7;
                            if (sz == 0) {
                                if (r != 15) goto luma_block_done;  // EOB
                                k += 16;
                                if (k >= 64) goto luma_block_done;
                                continue;
                            }
                            k += r;
                            if (k > 63) return -8;
                            const int level = extend_sign(raw, sz);
                            blk[kTz.tz[k]] = static_cast<int16_t>(
                                static_cast<uint16_t>(
                                    level * static_cast<int>(qy[k])));
                            ++k;
                        }
                    }
                luma_block_done:
                    g_idct.idct_put(
                        jd.yplane.data() +
                            static_cast<size_t>(by * 8) * ypw +
                            static_cast<size_t>(mx) * mcu_w + bx * 8,
                        ypw, blk);
                }
            }
            // chroma blocks: DC-only or decline (gray content only)
            for (int c = 1; c < 3; ++c) {
                HuffTab& cdc = jd.hdc[hd.comp_dc[c]];
                HuffTab& cac = jd.hac[hd.comp_ac[c]];
                const uint16_t* q = c == 1 ? qu : qv;
                // one refill covers DC (<=27 bits) + the EOB code (<=16)
                br.refill56();
                const int s = cdc.decode(br);
                if (s < 0 || s > 11) return -9;
                const int diff = extend_sign(s != 0 ? br.bits(s) : 0, s);
                int val = diff * static_cast<int>(q[0]) + last_dc[c];
                val = val < -32768 ? -32768 : (val > 32767 ? 32767 : val);
                last_dc[c] = val;
                if (br.n < 16) br.refill56();
                const int rs = cac.decode(br);
                if (rs != 0) return 1;  // AC energy: color content
                const int flat = dcflat.get(static_cast<int16_t>(val));
                if (flat < 0) return 1;
                const uint8_t fv = static_cast<uint8_t>(flat);
                // constant over this chroma block == the whole MCU width
                uint8_t* row = (c == 1 ? jd.urow : jd.vrow).data() + mx * 8;
                std::memset(row, fv, 8);
                // the value must belong to the proven chroma set
                const uint8_t* pv = c == 1 ? pg->uvals : pg->vvals;
                const int pn = c == 1 ? pg->n_u : pg->n_v;
                if (fv != pv[0] && (pn < 2 || fv != pv[1])) return 1;
            }
        }
        // truncated stream: decoded values used fabricated zero bits
        if (br.bits_consumed() > 8 * static_cast<int64_t>(jd.scan.size()))
            return 1;
        const uint64_t tsc1 = __builtin_ia32_rdtsc();
        g_jdec_tsc_entropy.fetch_add(tsc1 - tsc0,
                                     std::memory_order_relaxed);
        // --- apply the proven gray LUT over this MCU row band ---
        const int y0 = my * mcu_h;
        const int y1 = y0 + mcu_h < h ? y0 + mcu_h : h;
        for (int y = y0; y < y1; ++y) {
            const uint8_t* yrow =
                jd.yplane.data() + static_cast<size_t>(y - y0) * ypw;
            uint8_t* out = gray + static_cast<size_t>(y) * w;
            int64_t i = 0;
#if defined(__AVX512BW__) && defined(__AVX512VBMI__) && \
    defined(__AVX512VL__) && defined(__BMI2__)
            __m512i t[2][2][4];
            for (int a = 0; a < (multi ? 2 : 1); ++a) {
                for (int b = 0; b < (multi ? 2 : 1); ++b) {
                    for (int k = 0; k < 4; ++k) {
                        t[a][b][k] =
                            _mm512_loadu_si512(pg->lut[a][b] + 64 * k);
                    }
                }
            }
            if (!multi) {
                for (; i + 64 <= w; i += 64) {
                    __m512i x = _mm512_loadu_si512(yrow + i);
                    __mmask64 top = _mm512_movepi8_mask(x);
                    _mm512_storeu_si512(out + i,
                                        lut256(x, top, t[0][0]));
                }
            } else {
                const __m256i u1 =
                    _mm256_set1_epi8(static_cast<char>(pg->uvals[1]));
                const __m256i v1 =
                    _mm256_set1_epi8(static_cast<char>(pg->vvals[1]));
                const uint8_t* up = jd.urow.data();
                const uint8_t* vp = jd.vrow.data();
                for (; i + 64 <= w; i += 64) {
                    __m512i x = _mm512_loadu_si512(yrow + i);
                    __mmask64 top = _mm512_movepi8_mask(x);
                    __mmask64 mu, mv;
                    if (hsub != 0) {
                        const __m256i uc = _mm256_loadu_si256(
                            reinterpret_cast<const __m256i*>(up + (i >> 1)));
                        const __m256i vc = _mm256_loadu_si256(
                            reinterpret_cast<const __m256i*>(vp + (i >> 1)));
                        const uint64_t su = _pdep_u64(
                            _mm256_cmpeq_epi8_mask(uc, u1),
                            0x5555555555555555ull);
                        const uint64_t sv = _pdep_u64(
                            _mm256_cmpeq_epi8_mask(vc, v1),
                            0x5555555555555555ull);
                        mu = su | (su << 1);
                        mv = sv | (sv << 1);
                    } else {
                        mu = _mm512_cmpeq_epi8_mask(
                            _mm512_loadu_si512(up + i),
                            _mm512_broadcast_i32x4(
                                _mm256_castsi256_si128(u1)));
                        mv = _mm512_cmpeq_epi8_mask(
                            _mm512_loadu_si512(vp + i),
                            _mm512_broadcast_i32x4(
                                _mm256_castsi256_si128(v1)));
                    }
                    __m512i r0 = _mm512_mask_blend_epi8(
                        mv, lut256(x, top, t[0][0]),
                        lut256(x, top, t[0][1]));
                    __m512i r1 = _mm512_mask_blend_epi8(
                        mv, lut256(x, top, t[1][0]),
                        lut256(x, top, t[1][1]));
                    _mm512_storeu_si512(
                        out + i, _mm512_mask_blend_epi8(mu, r0, r1));
                }
            }
#endif
            if (!multi) {
                for (; i < w; ++i) out[i] = pg->lut[0][0][yrow[i]];
            } else {
                const uint8_t* up = jd.urow.data();
                const uint8_t* vp = jd.vrow.data();
                for (; i < w; ++i) {
                    const int cx = static_cast<int>(i) >> hsub;
                    out[i] = pg->lut[up[cx] == pg->uvals[1]]
                                    [vp[cx] == pg->vvals[1]][yrow[i]];
                }
            }
        }
        g_jdec_tsc_lut.fetch_add(__builtin_ia32_rdtsc() - tsc1,
                                 std::memory_order_relaxed);
    }
    if (br.bits_consumed() > 8 * static_cast<int64_t>(jd.scan.size()))
        return 1;
    out_dims[0] = h;
    out_dims[1] = w;
    g_jdec_frames.fetch_add(1, std::memory_order_relaxed);
    return 0;
}

}  // namespace

extern "C" {

// Resolve the ffmpeg entry points. Tried in order: the caller-provided
// library pair (cv2's bundled copies), then the system sonames. Returns 1
// when an API is ready. Call once, from one thread, before decoding.
int avdec_init(const char* avcodec_path, const char* swscale_path) {
    if (g_api.ready) return 1;
    if (avcodec_path != nullptr && swscale_path != nullptr &&
        g_api.load_from(avcodec_path, swscale_path)) {
        return 1;
    }
    if (g_api.load_from("libavcodec.so", "libswscale.so")) return 1;
    // unversioned dev symlinks may be absent at runtime: try the majors in
    // the supported range, newest first
    char a[32], s[32];
    for (unsigned major = kMaxAvcodecMajor; major >= kMinAvcodecMajor;
         --major) {
        std::snprintf(a, sizeof a, "libavcodec.so.%u", major);
        // libswscale's major is avcodec's minus 53 (59->6, 60->7, ...)
        std::snprintf(s, sizeof s, "libswscale.so.%u", major - 53);
        if (g_api.load_from(a, s)) return 1;
    }
    return 0;
}

// Which avcodec build got loaded (0 when none): version as (major<<16|...).
unsigned avdec_loaded_version(void) {
    return g_api.ready ? g_api.avcodec_version() : 0;
}

int avdec_available(void) {
    return g_api.ready && tl_av.init() ? 1 : 0;
}

// Decode one complete JPEG; returns 0 and the frame dims on success.
// The decoded frame is held thread-locally for avdec_frame_to_gray.
int avdec_decode(const uint8_t* jpg, int64_t size, int64_t* out_dims) {
    AvState& av = tl_av;
    if (!av.init() || size <= 0 || size > (int64_t(1) << 30)) return 1;
    // avcodec requires AV_INPUT_BUFFER_PADDING_SIZE readable bytes past the
    // packet end; the caller's chunk is an unpadded mmap view, so copy
    av.padded.resize(static_cast<size_t>(size) + AV_INPUT_BUFFER_PADDING_SIZE);
    std::memcpy(av.padded.data(), jpg, static_cast<size_t>(size));
    std::memset(av.padded.data() + size, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    av.pkt->data = av.padded.data();
    av.pkt->size = static_cast<int>(size);
    if (g_api.avcodec_send_packet(av.ctx, av.pkt) < 0) return 2;
    if (g_api.avcodec_receive_frame(av.ctx, av.frame) < 0) return 3;
    if (av.frame->width <= 0 || av.frame->height <= 0 ||
        static_cast<int64_t>(av.frame->width) * av.frame->height >
            (int64_t(1) << 28)) {
        return 4;
    }
    out_dims[0] = av.frame->height;
    out_dims[1] = av.frame->width;
    return 0;
}

// Convert the held frame to the exact gray recipe applied to swscale's
// BGR24 output. gray_cap guards the destination size.
int avdec_frame_to_gray(uint8_t* gray, int64_t gray_cap) {
    AvState& av = tl_av;
    if (av.frame == nullptr || av.frame->width <= 0) return 1;
    const int w = av.frame->width;
    const int h = av.frame->height;
    if (static_cast<int64_t>(w) * h > gray_cap) return 2;
    if (const ProvenGray* pg = gray_fast_eligible(av)) {
        apply_gray_lut(av.frame, *pg, gray);
        g_gray_fast_frames.fetch_add(1, std::memory_order_relaxed);
        return 0;
    }
    if (av.sws == nullptr || av.sws_w != w || av.sws_h != h ||
        av.sws_fmt != av.frame->format) {
        if (av.sws != nullptr) g_api.sws_freeContext(av.sws);
        // flags are irrelevant for the unscaled same-size converter, but
        // SWS_BICUBIC mirrors cv2's retrieveFrame call
        av.sws = g_api.sws_getContext(
            w, h, static_cast<AVPixelFormat>(av.frame->format),
            w, h, AV_PIX_FMT_BGR24, SWS_BICUBIC, nullptr, nullptr, nullptr);
        if (av.sws == nullptr) return 3;
        av.sws_w = w; av.sws_h = h; av.sws_fmt = av.frame->format;
    }
    // full-frame conversion: swscale's slice API does not reproduce the
    // full-frame output for this converter (measured: non-initial slices
    // come out garbage), so the BGR24 plane is materialised once in a
    // thread-local buffer and reduced to gray from there. Still saves
    // cv2's videoio Mat allocation/copy and the Python-side frame object.
    // The buffer is over-allocated: swscale's vectorised writers store
    // whole registers and can touch bytes past the last row's end.
    av.band.resize(static_cast<size_t>(h) * w * 3 + 256);
    uint8_t* dst[4] = {av.band.data(), nullptr, nullptr, nullptr};
    int dstride[4] = {w * 3, 0, 0, 0};
    const int done = g_api.sws_scale(av.sws, av.frame->data,
                                     av.frame->linesize, 0, h, dst, dstride);
    if (done != h) return 4;
    ysmr_gray::bgr_to_gray(av.band.data(), static_cast<int64_t>(h) * w, gray);
    return 0;
}

// Diagnostics: pixel format, luma/chroma linesizes, and the first chroma
// bytes of the held frame (out must hold 8 int64).
int avdec_frame_info(int64_t* out) {
    AvState& av = tl_av;
    if (av.frame == nullptr || av.frame->width <= 0) return 1;
    out[0] = av.frame->format;
    out[1] = av.frame->linesize[0];
    out[2] = av.frame->linesize[1];
    out[3] = av.frame->linesize[2];
    out[4] = av.frame->data[1] != nullptr ? av.frame->data[1][0] : -1;
    out[5] = av.frame->data[2] != nullptr ? av.frame->data[2][0] : -1;
    out[6] = av.frame->width;
    out[7] = av.frame->height;
    return 0;
}

// Diagnostics: value histograms of the held frame's U and V planes
// (out: 2x256 int64, U then V).
int avdec_chroma_histogram(int64_t* out) {
    AvState& av = tl_av;
    if (av.frame == nullptr || av.frame->width <= 0) return 1;
    int hsub = 0, vsub = 0;
    if (!chroma_shifts(av.frame->format, &hsub, &vsub)) return 2;
    int cw = 0, ch = 0;
    chroma_plane_dims(av.frame->width, av.frame->height, hsub, vsub, &cw,
                      &ch);
    std::memset(out, 0, 2 * 256 * sizeof(int64_t));
    for (int plane = 1; plane <= 2; ++plane) {
        const uint8_t* p = av.frame->data[plane];
        if (p == nullptr) return 3;
        int64_t* hist = out + (plane - 1) * 256;
        for (int y = 0; y < ch; ++y, p += av.frame->linesize[plane]) {
            for (int x = 0; x < cw; ++x) ++hist[p[x]];
        }
    }
    return 0;
}

// Diagnostics: copy one raw plane (0 = Y, 1 = U, 2 = V) of the held frame
// into out (row-packed, no stride padding). Returns the plane's width in
// out_dims[0] and height in out_dims[1]; nonzero on error. Ground truth
// for validating the first-party MJPEG decoder (native/jpegdec.cpp).
int avdec_frame_plane(int plane, uint8_t* out, int64_t cap,
                      int64_t* out_dims) {
    AvState& av = tl_av;
    if (av.frame == nullptr || av.frame->width <= 0) return 1;
    if (plane < 0 || plane > 2) return 2;
    int w = av.frame->width, h = av.frame->height;
    if (plane > 0) {
        int hsub = 0, vsub = 0;
        if (!chroma_shifts(av.frame->format, &hsub, &vsub)) return 3;
        chroma_plane_dims(av.frame->width, av.frame->height, hsub, vsub,
                          &w, &h);
    }
    const uint8_t* p = av.frame->data[plane];
    if (p == nullptr) return 4;
    if (static_cast<int64_t>(w) * h > cap) return 5;
    for (int y = 0; y < h; ++y, p += av.frame->linesize[plane]) {
        std::memcpy(out + static_cast<int64_t>(y) * w, p, w);
    }
    out_dims[0] = w;
    out_dims[1] = h;
    return 0;
}

// Introspection for tests/diagnostics: how many frames took the proven
// gray-content LUT path (skipping swscale), and the proof status
// (0 unknown, 1 proven, -1 refuted) for the last-seen geometry.
long avdec_gray_fast_frames(void) {
    return g_gray_fast_frames.load(std::memory_order_relaxed);
}

int avdec_gray_fast_status(void) {
    const ProvenGray* pg = g_proven.load(std::memory_order_acquire);
    return pg == nullptr ? 0 : (pg->ok ? 1 : -1);
}

// Diagnostics: locate the decoder's IDCTDSPContext inside the opened
// MJPEG codec's private context by structural signature — six consecutive
// pointer-sized slots (each null or inside the loaded avcodec image)
// followed by a 64-byte permutation of 0..63 (idct_permutation). This
// yields the ADDRESS of the exact idct/idct_put routine the decoder
// executes plus the coefficient permutation it expects, without symbols.
// out layout: out[0] = avcodec image base, out[1] = n candidates (<= 4);
// then per candidate 8 slots: 6 pointer values, perm_type (the int32
// following the table), priv_data byte offset. perm_out: 64 bytes per
// candidate. Returns 0 on success. Pure introspection — reads only
// memory owned by the opened decoder (bounded by malloc_usable_size).
int avdec_find_idct(int64_t* out, uint8_t* perm_out) {
    AvState& av = tl_av;
    if (!av.init()) return 1;
    Dl_info info;
    if (dladdr(reinterpret_cast<void*>(g_api.avcodec_version), &info) == 0 ||
        info.dli_fbase == nullptr) {
        return 2;
    }
    const uintptr_t base = reinterpret_cast<uintptr_t>(info.dli_fbase);
    const uintptr_t lib_hi = base + (uintptr_t(1) << 25);  // 32 MB span
    const uint8_t* priv =
        static_cast<const uint8_t*>(av.ctx->priv_data);
    if (priv == nullptr) return 3;
    const size_t usable = malloc_usable_size(
        const_cast<void*>(static_cast<const void*>(priv)));
    if (usable < 128 || usable > (size_t(1) << 24)) return 4;
    out[0] = static_cast<int64_t>(base);
    int n = 0;
    for (size_t o = 48; o + 68 <= usable && n < 4; o += 8) {
        const uint8_t* p = priv + o;
        uint64_t seen_lo = 0, seen_hi = 0;
        bool perm = true;
        for (int i = 0; i < 64; ++i) {
            const uint8_t v = p[i];
            if (v >= 64) { perm = false; break; }
            uint64_t& word = v < 32 ? seen_lo : seen_hi;
            const uint64_t bit = uint64_t(1) << (v & 31);
            if (word & bit) { perm = false; break; }
            word |= bit;
        }
        if (!perm) continue;
        const int64_t* ptrs =
            reinterpret_cast<const int64_t*>(priv + o - 48);
        int in_lib = 0, null_cnt = 0;
        for (int i = 0; i < 6; ++i) {
            const uint64_t v = static_cast<uint64_t>(ptrs[i]);
            if (v == 0) { ++null_cnt; continue; }
            if (v >= base && v < lib_hi) ++in_lib;
        }
        if (in_lib < 4 || in_lib + null_cnt != 6) continue;
        int64_t* slot = out + 2 + n * 8;
        for (int i = 0; i < 6; ++i) slot[i] = ptrs[i];
        slot[6] = *reinterpret_cast<const int32_t*>(p + 64);
        slot[7] = static_cast<int64_t>(o);
        std::memcpy(perm_out + n * 64, p, 64);
        ++n;
    }
    out[1] = n;
    return 0;
}

// Diagnostics: call a routine located by avdec_find_idct directly.
// kind 0: void (*idct)(int16_t *block)            — in-place transform
// kind 1: void (*idct_put)(uint8_t *dest, ptrdiff_t line, int16_t *block)
// The caller owns validating fn against avdec_find_idct's output first.
int avdec_call_idct(int kind, int64_t fn, uint8_t* dest, int64_t line,
                    int16_t* block) {
    if (fn == 0) return 1;
    if (kind == 0) {
        reinterpret_cast<void (*)(int16_t*)>(fn)(block);
        return 0;
    }
    if (kind == 1) {
        reinterpret_cast<void (*)(uint8_t*, ptrdiff_t, int16_t*)>(fn)(
            dest, static_cast<ptrdiff_t>(line), block);
        return 0;
    }
    return 2;
}

// Full-BGR variant for the first-frame parity self-check and the non-gray
// paths: swscale into the padded thread-local buffer (see above), then
// one memcpy into the caller's exactly-sized (h, w, 3) array.
int avdec_frame_to_bgr(uint8_t* bgr, int64_t bgr_cap) {
    AvState& av = tl_av;
    if (av.frame == nullptr || av.frame->width <= 0) return 1;
    const int w = av.frame->width;
    const int h = av.frame->height;
    const int64_t n = static_cast<int64_t>(w) * h * 3;
    if (n > bgr_cap) return 2;
    SwsContext* sws = g_api.sws_getContext(
        w, h, static_cast<AVPixelFormat>(av.frame->format),
        w, h, AV_PIX_FMT_BGR24, SWS_BICUBIC, nullptr, nullptr, nullptr);
    if (sws == nullptr) return 3;
    av.band.resize(static_cast<size_t>(n) + 256);
    uint8_t* dst[4] = {av.band.data(), nullptr, nullptr, nullptr};
    int dstride[4] = {w * 3, 0, 0, 0};
    const int done = g_api.sws_scale(sws, av.frame->data, av.frame->linesize,
                                     0, h, dst, dstride);
    g_api.sws_freeContext(sws);
    if (done != h) return 4;
    std::memcpy(bgr, av.band.data(), static_cast<size_t>(n));
    return 0;
}

// First-party baseline MJPEG decode straight to exact gray (see the jdec
// block above). Succeeds only when every exactness precondition holds:
// the gray LUT is proven for this exact geometry, the decoder's own
// idct_put was located and probe-verified, the stream is baseline with
// the cv2-writer profile, and the chroma blocks are DC-only with values
// inside the proven set. Any other frame returns nonzero and the caller
// serves it through avdec_decode + avdec_frame_to_gray instead. The
// caller owns the byte-compare guard that validates this path against
// the avcodec one on its first served frame (ysmr_tpu/native.py).
int avdec_jdec_gray(const uint8_t* jpg, int64_t size, uint8_t* gray,
                    int64_t cap, int64_t* out_dims) {
    return jdec_decode_gray(jpg, size, gray, cap, out_dims);
}

// How many frames the first-party decoder served (diagnostics/tests).
long avdec_jdec_frames(void) {
    return g_jdec_frames.load(std::memory_order_relaxed);
}

// Last checkpoint the calling thread's jdec_decode_gray passed before it
// returned (diagnostics: 0 header .. 6 entropy loop entered).
int avdec_jdec_stage(void) {
    return tl_jdec_stage;
}

// Accumulated rdtsc cycles per phase (diagnostics: 0 = entropy+idct,
// 1 = gray LUT application).
unsigned long long avdec_jdec_tsc(int phase) {
    return phase == 0
               ? g_jdec_tsc_entropy.load(std::memory_order_relaxed)
               : g_jdec_tsc_lut.load(std::memory_order_relaxed);
}

}  // extern "C"
