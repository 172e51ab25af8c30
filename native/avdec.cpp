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

#include <cstdint>
#include <cstdio>
#include <cstring>
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
