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

}  // extern "C"
