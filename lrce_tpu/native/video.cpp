// Native .avi/.mp4 decode via the system libav* (ffmpeg) libraries.
//
// TPU-native replacement for the cv2-bound host ingest of the Microsoft
// datasets (reference lrce/dataset/e2e_dataset.py:76-92 decodes with
// cv2.VideoCapture on every sample fetch). Two entry points mirror the
// Python path's split (lrce_tpu/data/video_decode.py):
//   video_probe          -- frame count by demux-packet sweep (container
//                           metadata often lies; one packet = one frame in
//                           the datasets' containers, cv2-grab semantics)
//   video_decode_sampled -- single demux pass; only sampled frames decode
//                           (intra-only codecs skip unwanted packets
//                           entirely), then RGB24 via swscale and the
//                           Pillow-exact fixed-point resize from image.cpp
//
// Built into its own shared object (liblrce_video.so) so a missing
// libavformat degrades gracefully to the cv2 path without taking the rest
// of the native runtime down. Decoding runs without the GIL (ctypes), so
// DataLoader worker threads scale on multi-core hosts.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

// from image.cpp (compiled into this library too)
extern "C" int resize_bilinear_u8(const unsigned char* src, int h, int w,
                                  int c, unsigned char* dst, int oh, int ow);

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;

  ~Reader() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    av_log_set_level(AV_LOG_ERROR);  // e.g. yuvj-deprecation spam per file
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    // find_stream_info decodes up to seconds of video to estimate fps etc.
    // (~650 ms/file measured) — only needed when the container header
    // lacks codec + dimensions (AVI/MP4 headers carry both).
    bool have_params = false;
    for (unsigned i = 0; i < fmt->nb_streams; ++i) {
      AVCodecParameters* p = fmt->streams[i]->codecpar;
      if (p->codec_type == AVMEDIA_TYPE_VIDEO && p->codec_id &&
          p->width > 0 && p->height > 0) {
        have_params = true;
        break;
      }
    }
    if (!have_params && avformat_find_stream_info(fmt, nullptr) < 0)
      return -2;
    const AVCodec* codec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (stream < 0 || !codec) return -3;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -4;
    if (avcodec_parameters_to_context(dec,
                                      fmt->streams[stream]->codecpar) < 0)
      return -5;
    dec->thread_count = 1;  // per-fetch threading comes from the DataLoader
    if (avcodec_open2(dec, codec, nullptr) < 0) return -6;
    return 0;
  }

  bool intra_only() const {
    const AVCodecDescriptor* d = avcodec_descriptor_get(dec->codec_id);
    return d && (d->props & AV_CODEC_PROP_INTRA_ONLY);
  }

  // Demux-only packet count on the video stream — the cheap sweep cv2's
  // grab() loop amounts to. One packet = one frame for the containers the
  // datasets use (MJPG .avi, h264 .mp4). Zero-size packets (AVI drop/padding
  // entries) produce no decoded frame, so they are excluded — cv2's grab()
  // count excludes them too, and sweep() skips them in the same way so the
  // two index spaces stay aligned.
  int count_packets() {
    AVPacket* pkt = av_packet_alloc();
    int n = 0;
    while (av_read_frame(fmt, pkt) >= 0) {
      if (pkt->stream_index == stream && pkt->size > 0) ++n;
      av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    return n;
  }

  // Decode frames in presentation order, invoking visit(frame, pos) for
  // each; stops early when visit returns false. Returns decoded count.
  //
  // When `wanted` is non-null (sorted ascending) and the codec is
  // intra-only (MJPEG), packets whose position is not wanted are discarded
  // WITHOUT decoding — every frame is self-contained, so skipping cannot
  // corrupt later wanted frames. For inter codecs every packet decodes.
  template <typename F>
  int sweep(F&& visit, const int* wanted = nullptr, int n_wanted = 0) {
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    const bool skip_unwanted = wanted && intra_only();
    int pos = 0;       // frame position (decode order)
    int wi = 0;        // next wanted
    bool stop = false;

    auto drain = [&]() {
      while (!stop && avcodec_receive_frame(dec, frame) == 0) {
        if (!visit(frame, pos)) stop = true;
        ++pos;
      }
    };

    while (!stop && av_read_frame(fmt, pkt) >= 0) {
      if (pkt->stream_index == stream) {
        if (pkt->size == 0) {
          // AVI drop/padding packet: no frame comes out of it (and an empty
          // packet sent to the decoder would be taken as an EOF flush), and
          // count_packets() excluded it — skip without advancing pos.
          av_packet_unref(pkt);
          continue;
        }
        if (skip_unwanted) {
          if (wi >= n_wanted) {
            av_packet_unref(pkt);
            break;
          }
          if (pos != wanted[wi]) {
            ++pos;  // discard packet: intra-only, frame not sampled
            av_packet_unref(pkt);
            continue;
          }
          ++wi;
          // decode this one packet at logical position `pos`
          int at = pos;
          if (avcodec_send_packet(dec, pkt) == 0) {
            while (!stop && avcodec_receive_frame(dec, frame) == 0) {
              if (!visit(frame, at)) stop = true;
            }
          }
          ++pos;
          av_packet_unref(pkt);
          continue;
        }
        if (avcodec_send_packet(dec, pkt) == 0) drain();
      }
      av_packet_unref(pkt);
    }
    if (!stop && !skip_unwanted && avcodec_send_packet(dec, nullptr) == 0)
      drain();  // flush

    av_frame_free(&frame);
    av_packet_free(&pkt);
    return pos;
  }
};

}  // namespace

extern "C" {

// Frame count + native dimensions. Returns 0 on success. Counts demuxed
// packets (cv2's grab()-sweep semantics); a packet the decoder later
// rejects surfaces as a video_decode_sampled error and the caller falls
// back to the cv2 path.
int video_probe(const char* path, int* n_frames, int* width, int* height) {
  Reader r;
  if (r.open(path) != 0) return -1;
  *width = r.dec->width;
  *height = r.dec->height;
  *n_frames = r.count_packets();
  return *n_frames > 0 ? 0 : -2;
}

// Decode frames at `indices` (sorted unique, ascending), resize each to
// (oh, ow) and write RGB24 into out (n_idx * oh * ow * 3). Returns 0 on
// success, <0 on open errors, >0 = number of wanted frames not decodable.
//
// Byte-exact with cv2's ffmpeg backend (same libavcodec decode). For
// intra-only codecs (MJPEG — the MSVD .avi codec) unwanted packets are
// discarded without decoding, which with the skipped stream analysis makes
// a cold sampled fetch ~5x faster than cv2's grab()/read() loop.
int video_decode_sampled(const char* path, const int* indices, int n_idx,
                         unsigned char* out, int oh, int ow) {
  if (n_idx <= 0) return -7;
  Reader r;
  if (r.open(path) != 0) return -1;

  SwsContext* sws = nullptr;
  std::vector<unsigned char> rgb;
  int rgb_w = 0, rgb_h = 0;
  int next = 0;  // next wanted slot in indices

  auto emit_frame = [&](AVFrame* f) {
    if (f->width != rgb_w || f->height != rgb_h || !sws) {
      if (sws) sws_freeContext(sws);
      sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format,
                           f->width, f->height, AV_PIX_FMT_RGB24,
                           SWS_BILINEAR, nullptr, nullptr, nullptr);
      rgb_w = f->width;
      rgb_h = f->height;
      rgb.resize((size_t)rgb_w * rgb_h * 3);
    }
    if (!sws) return false;
    unsigned char* dst[1] = {rgb.data()};
    int dst_stride[1] = {rgb_w * 3};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    resize_bilinear_u8(rgb.data(), rgb_h, rgb_w, 3,
                       out + (size_t)next * oh * ow * 3, oh, ow);
    ++next;
    return true;
  };

  r.sweep([&](AVFrame* f, int pos) {
    if (next >= n_idx) return false;
    if (pos != indices[next]) return true;
    if (!emit_frame(f)) return false;
    return next < n_idx;
  }, indices, n_idx);
  if (sws) sws_freeContext(sws);
  return n_idx - next;  // 0 when every wanted frame decoded
}

}  // extern "C"
