// pam_native: native audio I/O substrate for python_audio_mastering_tpu.
//
// The reference's performance-critical host substrate is native code it does
// not own: ffmpeg (decode/encode via pydub subprocess, reference
// Dockerfile:5, engine:43/98) and numpy's C loops for sample conversion
// (engine:117-126).  This library is the framework-owned equivalent for the
// PCM path: RIFF/WAVE parse + int<->float conversion + a multithreaded batch
// decoder that feeds album batches without the Python GIL in the loop.
//
// C ABI only (loaded via ctypes from io/native.py; no pybind11 dependency).
// All functions return 0 on success, negative error codes otherwise.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint16_t kFmtPcm = 0x0001;
constexpr uint16_t kFmtFloat = 0x0003;
constexpr uint16_t kFmtExtensible = 0xFFFE;

struct WavInfo {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
};

uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

int parse_wav(const uint8_t* buf, size_t len, WavInfo* info) {
  if (len < 12 || std::memcmp(buf, "RIFF", 4) != 0 ||
      std::memcmp(buf + 8, "WAVE", 4) != 0)
    return -1;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= len) {
    const uint8_t* cid = buf + pos;
    uint32_t size = rd32(buf + pos + 4);
    if (pos + 8 + size > len) size = static_cast<uint32_t>(len - pos - 8);
    const uint8_t* body = buf + pos + 8;
    if (std::memcmp(cid, "fmt ", 4) == 0 && size >= 16) {
      info->format = rd16(body);
      info->channels = rd16(body + 2);
      info->rate = rd32(body + 4);
      info->bits = rd16(body + 14);
      if (info->format == kFmtExtensible && size >= 40)
        info->format = rd16(body + 24);
      have_fmt = true;
    } else if (std::memcmp(cid, "data", 4) == 0) {
      info->data = body;
      info->data_len = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  if (!have_fmt || !have_data || info->channels == 0) return -2;
  return 0;
}

long frame_count(const WavInfo& w) {
  size_t bytes_per_frame = static_cast<size_t>(w.channels) * (w.bits / 8);
  return bytes_per_frame ? static_cast<long>(w.data_len / bytes_per_frame) : 0;
}

int decode_samples(const WavInfo& w, float* out) {
  const long frames = frame_count(w);
  const size_t n = static_cast<size_t>(frames) * w.channels;
  const uint8_t* d = w.data;
  if (w.format == kFmtFloat && w.bits == 32) {
    std::memcpy(out, d, n * 4);
    return 0;
  }
  if (w.format == kFmtFloat && w.bits == 64) {
    for (size_t i = 0; i < n; ++i) {
      double v;
      std::memcpy(&v, d + i * 8, 8);
      out[i] = static_cast<float>(v);
    }
    return 0;
  }
  if (w.format != kFmtPcm) return -3;
  switch (w.bits) {
    case 8:  // unsigned
      for (size_t i = 0; i < n; ++i)
        out[i] = (static_cast<int>(d[i]) - 128) * (1.0f / 128.0f);
      return 0;
    case 16:
      for (size_t i = 0; i < n; ++i) {
        int16_t v;
        std::memcpy(&v, d + i * 2, 2);
        out[i] = v * (1.0f / 32768.0f);
      }
      return 0;
    case 24:
      for (size_t i = 0; i < n; ++i) {
        const uint8_t* p = d + i * 3;
        int32_t v = static_cast<int32_t>(p[0]) | (static_cast<int32_t>(p[1]) << 8) |
                    (static_cast<int32_t>(p[2]) << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        out[i] = v * (1.0f / 8388608.0f);
      }
      return 0;
    case 32:
      for (size_t i = 0; i < n; ++i) {
        int32_t v;
        std::memcpy(&v, d + i * 4, 4);
        out[i] = static_cast<float>(v * (1.0 / 2147483648.0));
      }
      return 0;
    default:
      return -4;
  }
}

template <typename Fn>
void parallel_for(long count, int threads, Fn fn) {
  if (threads <= 1 || count <= 1) {
    for (long i = 0; i < count; ++i) fn(i);
    return;
  }
  std::atomic<long> next(0);
  std::vector<std::thread> pool;
  int n = threads < count ? threads : static_cast<int>(count);
  pool.reserve(n);
  for (int t = 0; t < n; ++t)
    pool.emplace_back([&] {
      for (long i = next.fetch_add(1); i < count; i = next.fetch_add(1)) fn(i);
    });
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Probe a WAV buffer: fills channels/rate/frames/bits. 0 on success.
int pam_wav_probe(const uint8_t* buf, size_t len, int32_t* channels,
                  int32_t* rate, int64_t* frames, int32_t* bits) {
  WavInfo w;
  int rc = parse_wav(buf, len, &w);
  if (rc) return rc;
  *channels = w.channels;
  *rate = static_cast<int32_t>(w.rate);
  *frames = frame_count(w);
  *bits = w.bits;
  return 0;
}

// Decode a WAV buffer into float32 interleaved [-1,1]; out must hold
// frames*channels floats (use pam_wav_probe first).
int pam_wav_decode(const uint8_t* buf, size_t len, float* out) {
  WavInfo w;
  int rc = parse_wav(buf, len, &w);
  if (rc) return rc;
  return decode_samples(w, out);
}

// Encode float32 interleaved samples into PCM of the given width (bytes:
// 2, 3 or 4) with clipping, matching the reference's scaling contract
// (engine:123-126 — but honouring width instead of hardcoding int16).
int pam_pcm_encode(const float* in, int64_t count, int32_t width,
                   uint8_t* out, int32_t threads) {
  if (width != 2 && width != 3 && width != 4) return -1;
  const double scale = width == 2 ? 32768.0 : width == 3 ? 8388608.0
                                                         : 2147483648.0;
  const int64_t maxv = static_cast<int64_t>(scale) - 1;
  const int64_t minv = -static_cast<int64_t>(scale);
  const long chunk = 1 << 18;
  const long chunks = static_cast<long>((count + chunk - 1) / chunk);
  parallel_for(chunks, threads, [&](long c) {
    int64_t lo = static_cast<int64_t>(c) * chunk;
    int64_t hi = lo + chunk < count ? lo + chunk : count;
    for (int64_t i = lo; i < hi; ++i) {
      float x = in[i];
      if (x > 1.0f) x = 1.0f;
      if (x < -1.0f) x = -1.0f;
      int64_t v = static_cast<int64_t>(x * scale);
      if (v > maxv) v = maxv;
      if (v < minv) v = minv;
      uint8_t* p = out + i * width;
      p[0] = static_cast<uint8_t>(v & 0xFF);
      p[1] = static_cast<uint8_t>((v >> 8) & 0xFF);
      if (width >= 3) p[2] = static_cast<uint8_t>((v >> 16) & 0xFF);
      if (width == 4) p[3] = static_cast<uint8_t>((v >> 24) & 0xFF);
    }
  });
  return 0;
}

// Decode a batch of WAV buffers concurrently into a padded float32 tensor
// (batch, max_frames, channels); short tracks are zero-padded.  All tracks
// must share `channels`.  frames_out[i] receives each track's true length.
// This is the album-loader fast path feeding parallel.batch.pad_tracks.
int pam_batch_decode(const uint8_t* const* bufs, const size_t* lens,
                     int32_t batch, int32_t channels, int64_t max_frames,
                     float* out, int64_t* frames_out, int32_t threads) {
  std::atomic<int> err(0);
  parallel_for(batch, threads, [&](long i) {
    WavInfo w;
    if (parse_wav(bufs[i], lens[i], &w) != 0 || w.channels != channels) {
      err.store(-1);
      return;
    }
    long frames = frame_count(w);
    if (frames > max_frames) frames = max_frames;
    float* dst = out + static_cast<int64_t>(i) * max_frames * channels;
    std::memset(dst, 0, sizeof(float) * max_frames * channels);
    WavInfo clipped = w;
    clipped.data_len = static_cast<size_t>(frames) * channels * (w.bits / 8);
    if (decode_samples(clipped, dst) != 0) err.store(-2);
    frames_out[i] = frames;
  });
  return err.load();
}

}  // extern "C"
