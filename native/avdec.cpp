// Exact-decode module: libavcodec MJPEG + libswscale -> exact gray plane.
//
// The reference decodes with cv2.VideoCapture (FFmpeg: avcodec mjpeg decode
// to yuvj420p, swscale conversion to BGR24) and converts each frame to
// grayscale (track_eval.py:156-366, 181). cv2's per-frame path materialises
// a full BGR Mat (3.4 MB at 1228x922) that the preprocessor immediately
// reduces to gray. This module runs the SAME libraries directly on the
// demuxed JPEG chunks and fuses the conversion: swscale emits BGR24 into a
// 64-row band buffer (L2-resident) and the exact BGR2GRAY recipe
// (gray_recipe.h) consumes the band in place — the full-frame BGR image
// never exists, saving its DRAM round trip plus cv2's videoio overhead
// (measured ~0.8 ms/frame at 1228x922 on one core).
//
// Bit-exactness is NOT assumed: the system libavcodec may differ from the
// one cv2 bundles (different major version, different IDCT dispatch). The
// caller (io/video.py) decodes the first frame through BOTH paths and
// byte-compares the gray planes before committing to this module; any
// mismatch falls back to cv2 for the whole file.
//
// Built as its own shared library (libysmr_avdec.so) so the core runtime
// keeps zero ffmpeg dependencies; loaded optionally via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include "gray_recipe.h"

namespace {

struct AvState {
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    SwsContext* sws = nullptr;
    int sws_w = 0, sws_h = 0, sws_fmt = -1;
    std::vector<uint8_t> band;    // 64-row BGR24 band buffer
    std::vector<uint8_t> padded;  // packet copy with the required padding
    bool failed = false;

    bool init() {
        if (ctx != nullptr || failed) return ctx != nullptr;
        const AVCodec* codec = avcodec_find_decoder(AV_CODEC_ID_MJPEG);
        if (codec == nullptr) { failed = true; return false; }
        ctx = avcodec_alloc_context3(codec);
        pkt = av_packet_alloc();
        frame = av_frame_alloc();
        if (ctx == nullptr || pkt == nullptr || frame == nullptr ||
            avcodec_open2(ctx, codec, nullptr) < 0) {
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

int avdec_available(void) {
    return tl_av.init() ? 1 : 0;
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
    if (avcodec_send_packet(av.ctx, av.pkt) < 0) return 2;
    if (avcodec_receive_frame(av.ctx, av.frame) < 0) return 3;
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
// BGR24 output, in 64-row bands. gray_cap guards the destination size.
int avdec_frame_to_gray(uint8_t* gray, int64_t gray_cap) {
    AvState& av = tl_av;
    if (av.frame == nullptr || av.frame->width <= 0) return 1;
    const int w = av.frame->width;
    const int h = av.frame->height;
    if (static_cast<int64_t>(w) * h > gray_cap) return 2;
    if (av.sws == nullptr || av.sws_w != w || av.sws_h != h ||
        av.sws_fmt != av.frame->format) {
        if (av.sws != nullptr) sws_freeContext(av.sws);
        // flags are irrelevant for the unscaled same-size converter, but
        // SWS_BICUBIC mirrors cv2's retrieveFrame call
        av.sws = sws_getContext(w, h, static_cast<AVPixelFormat>(av.frame->format),
                                w, h, AV_PIX_FMT_BGR24, SWS_BICUBIC,
                                nullptr, nullptr, nullptr);
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
    const int done = sws_scale(av.sws, av.frame->data, av.frame->linesize,
                               0, h, dst, dstride);
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
    SwsContext* sws = sws_getContext(
        w, h, static_cast<AVPixelFormat>(av.frame->format),
        w, h, AV_PIX_FMT_BGR24, SWS_BICUBIC, nullptr, nullptr, nullptr);
    if (sws == nullptr) return 3;
    av.band.resize(static_cast<size_t>(n) + 256);
    uint8_t* dst[4] = {av.band.data(), nullptr, nullptr, nullptr};
    int dstride[4] = {w * 3, 0, 0, 0};
    const int done = sws_scale(sws, av.frame->data, av.frame->linesize,
                               0, h, dst, dstride);
    sws_freeContext(sws);
    if (done != h) return 4;
    std::memcpy(bgr, av.band.data(), static_cast<size_t>(n));
    return 0;
}

}  // extern "C"
