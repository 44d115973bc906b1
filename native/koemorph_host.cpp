// koemorph_host: native host-side data-loader kernels.
//
// Role parity: the reference leans on libsndfile (WAV decode, via the
// soundfile pip package, reference src/data/io.py:71) and on Python json for
// the per-frame blendshape JSONL (reference src/data/io.py:98-155). Both are
// host-side hot paths when streaming a training corpus. This library
// provides the same two operations as tight C++ loops, exposed through a
// plain C ABI consumed from Python via ctypes
// (koemorph_tpu/data/native.py). The pure-Python implementations remain the
// correctness reference and fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
//
// ABI conventions: int64 sizes, caller-allocated output buffers, two-call
// (probe then fill) protocols, return codes <0 on error.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <cmath>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

struct KmWavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits_per_sample;
  int32_t audio_format;   // 1 = PCM, 3 = IEEE float
  int64_t n_frames;       // samples per channel
  int64_t data_offset;    // byte offset of PCM payload
  int64_t data_size;      // bytes of PCM payload
};

static const uint16_t KM_PCM = 1;
static const uint16_t KM_IEEE = 3;
static const uint16_t KM_EXTENSIBLE = 0xFFFE;

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

// Parse RIFF headers. Returns 0 on success, <0 on malformed input.
int64_t km_wav_info(const uint8_t* buf, int64_t len, KmWavInfo* info) {
  if (len < 12 || std::memcmp(buf, "RIFF", 4) != 0 ||
      std::memcmp(buf + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  bool have_fmt = false, have_data = false;
  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  int64_t data_off = 0, data_size = 0;
  while (pos + 8 <= len) {
    const uint8_t* id = buf + pos;
    uint32_t size = rd_u32(buf + pos + 4);
    int64_t body = pos + 8;
    if (body + (int64_t)size > len) size = (uint32_t)(len - body);
    if (std::memcmp(id, "fmt ", 4) == 0 && size >= 16) {
      fmt_code = rd_u16(buf + body);
      channels = rd_u16(buf + body + 2);
      rate = rd_u32(buf + body + 4);
      bits = rd_u16(buf + body + 14);
      if (fmt_code == KM_EXTENSIBLE && size >= 26)
        fmt_code = rd_u16(buf + body + 24);  // wValidFormat GUID prefix
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      data_off = body;
      data_size = size;
      have_data = true;
    }
    pos = body + size + (size & 1);
  }
  if (!have_fmt || !have_data || channels == 0 || bits == 0) return -2;
  if (fmt_code != KM_PCM && fmt_code != KM_IEEE) return -3;
  int bytes = bits / 8;
  if (bytes == 0) return -4;
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)channels;
  info->bits_per_sample = (int32_t)bits;
  info->audio_format = (int32_t)fmt_code;
  info->n_frames = data_size / (bytes * channels);
  info->data_offset = data_off;
  info->data_size = data_size;
  return 0;
}

// Decode PCM payload to float32 in [-1, 1].
// out must hold n_frames * channels floats (interleaved) — or n_frames
// floats when mono_mix != 0 (channel average).
int64_t km_wav_decode(const uint8_t* buf, int64_t len, const KmWavInfo* info,
                      float* out, int32_t mono_mix) {
  const uint8_t* p = buf + info->data_offset;
  if (info->data_offset + info->data_size > len) return -1;
  const int64_t frames = info->n_frames;
  const int ch = info->channels;
  const int bits = info->bits_per_sample;
  const int fmt = info->audio_format;

  auto sample_at = [&](int64_t i) -> float {
    switch (bits) {
      case 16: {
        int16_t v;
        std::memcpy(&v, p + i * 2, 2);
        return (float)v / 32768.0f;
      }
      case 24: {
        const uint8_t* q = p + i * 3;
        int32_t v = (int32_t)((uint32_t)q[0] << 8 | (uint32_t)q[1] << 16 |
                              (uint32_t)q[2] << 24) >> 8;
        return (float)v / 8388608.0f;
      }
      case 32: {
        if (fmt == KM_IEEE) {
          float v;
          std::memcpy(&v, p + i * 4, 4);
          return v;
        }
        int32_t v;
        std::memcpy(&v, p + i * 4, 4);
        return (float)((double)v / 2147483648.0);
      }
      case 64: {
        double v;
        std::memcpy(&v, p + i * 8, 8);
        return (float)v;
      }
      default:
        return 0.0f;
    }
  };

  if ((bits != 16 && bits != 24 && bits != 32 && bits != 64) ||
      (bits == 64 && fmt != KM_IEEE))
    return -2;

  if (mono_mix && ch > 1) {
    const float inv = 1.0f / (float)ch;
    for (int64_t f = 0; f < frames; ++f) {
      float acc = 0.0f;
      for (int c = 0; c < ch; ++c) acc += sample_at(f * ch + c);
      out[f] = acc * inv;
    }
  } else {
    const int64_t total = frames * ch;
    for (int64_t i = 0; i < total; ++i) out[i] = sample_at(i);
  }
  return frames;
}

// ---------------------------------------------------------------------------
// Blendshape JSONL parse
// ---------------------------------------------------------------------------
//
// Fast path for lines of the exact shape the capture pipeline writes:
//   {"timestamp": <num>, "blendshapes": [<num> x n_coeffs]}
// (key order free, other keys tolerated and skipped). Any line that doesn't
// parse cleanly aborts with a negative line number so the caller falls back
// to the strict Python loader, which owns error semantics
// (reference src/data/io.py:98-155).

static const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Parse one JSON number at p; advances *pp. Returns NAN on failure.
static double parse_num(const char** pp, const char* end) {
  char* q = nullptr;
  double v = std::strtod(*pp, &q);
  if (q == *pp || q > end) return NAN;
  *pp = q;
  return v;
}

// Skip a JSON value (number, string, bool, null, array, object) — shallow
// bracket matcher, enough for telemetry keys we don't consume.
static const char* skip_value(const char* p, const char* end) {
  p = skip_ws(p, end);
  if (p >= end) return nullptr;
  if (*p == '"') {
    ++p;
    while (p < end && *p != '"') p += (*p == '\\') ? 2 : 1;
    return p < end ? p + 1 : nullptr;
  }
  if (*p == '[' || *p == '{') {
    char open = *p, close = (open == '[') ? ']' : '}';
    int depth = 0;
    while (p < end) {
      if (*p == '"') {
        ++p;
        while (p < end && *p != '"') p += (*p == '\\') ? 2 : 1;
        if (p >= end) return nullptr;
      } else if (*p == open) {
        ++depth;
      } else if (*p == close) {
        if (--depth == 0) return p + 1;
      }
      ++p;
    }
    return nullptr;
  }
  while (p < end && *p != ',' && *p != '}' && *p != ']' && *p != '\n') ++p;
  return p;
}

// Parse JSONL buffer. Outputs:
//   ts_out   [max_frames]            timestamps
//   bs_out   [max_frames * n_coeffs] blendshape rows
// Returns number of frames parsed, or -(line_number) on first bad line.
int64_t km_parse_blendshape_jsonl(const char* buf, int64_t len,
                                  double* ts_out, float* bs_out,
                                  int64_t max_frames, int32_t n_coeffs) {
  const char* p = buf;
  const char* end = buf + len;
  int64_t frame = 0, line_no = 0;
  while (p < end && frame < max_frames) {
    ++line_no;
    const char* line_end = (const char*)std::memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q == line_end) {  // blank line
      p = line_end + 1;
      continue;
    }
    if (*q != '{') return -line_no;
    ++q;
    bool have_ts = false, have_bs = false;
    while (true) {
      q = skip_ws(q, line_end);
      if (q < line_end && *q == '}') break;
      if (q >= line_end || *q != '"') return -line_no;
      const char* key = q + 1;
      const char* key_end = (const char*)std::memchr(key, '"',
                                                     line_end - key);
      if (!key_end) return -line_no;
      size_t klen = (size_t)(key_end - key);
      q = skip_ws(key_end + 1, line_end);
      if (q >= line_end || *q != ':') return -line_no;
      q = skip_ws(q + 1, line_end);

      if (klen == 9 && std::memcmp(key, "timestamp", 9) == 0) {
        double v = parse_num(&q, line_end);
        if (std::isnan(v) && !(q < line_end)) return -line_no;
        ts_out[frame] = v;
        have_ts = true;
      } else if (klen == 11 && std::memcmp(key, "blendshapes", 11) == 0) {
        if (q >= line_end || *q != '[') return -line_no;
        ++q;
        float* row = bs_out + frame * n_coeffs;
        int32_t i = 0;
        while (true) {
          q = skip_ws(q, line_end);
          if (q < line_end && *q == ']') {
            ++q;
            break;
          }
          if (i >= n_coeffs) return -line_no;  // too many coeffs
          double v = parse_num(&q, line_end);
          if (std::isnan(v)) return -line_no;
          row[i++] = (float)v;
          q = skip_ws(q, line_end);
          if (q < line_end && *q == ',') ++q;
        }
        if (i != n_coeffs) return -line_no;    // wrong count
        have_bs = true;
      } else {
        q = skip_value(q, line_end);
        if (!q) return -line_no;
      }
      q = skip_ws(q, line_end);
      if (q < line_end && *q == ',') {
        ++q;
        continue;
      }
      if (q < line_end && *q == '}') break;
      return -line_no;
    }
    if (!have_ts || !have_bs) return -line_no;
    ++frame;
    p = line_end + 1;
  }
  return frame;
}

// ---------------------------------------------------------------------------
// Serving emit hot path
// ---------------------------------------------------------------------------
//
// The multi-session server (scripts/serve.py, role parity with the
// reference's single-session UDP sender scripts/rt.py:143-176) emits one
// JSON datagram per session per frame. Python-side json.dumps measures
// ~130 us/session — 67 ms/tick at 512 sessions, twice the 33 ms frame
// budget and far above the device step itself. These loops format and send
// the whole (S, 52) frame batch in one call. %.9g round-trips float32
// exactly, so consumers parse values bit-equal to the Python path.

// Fast fixed-point float32 -> decimal: 9 fractional digits, trailing zeros
// trimmed. snprintf("%.9g") measures ~0.4 us/float (glibc) — 21 of the 27
// us/session emit cost; this path is ~20x faster. Absolute error <= 5e-10
// (bit-exact float32 round-trip for |v| >= 2^-6 — blendshape outputs are
// sigmoid/softmax values in [0, 1]). Non-finite / huge values take the
// snprintf fallback. Writes at most 32 chars; returns the new cursor.
static inline char* km_fmt_f32(char* p, float v) {
  if (!(v == v) || v > 4.0e9f || v < -4.0e9f)
    return p + snprintf(p, 32, "%.9g", (double)v);
  if (v < 0) { *p++ = '-'; v = -v; }
  double d = (double)v;
  uint64_t ip = (uint64_t)d;
  uint64_t frac = (uint64_t)llround((d - (double)ip) * 1e9);
  if (frac >= 1000000000ULL) { frac -= 1000000000ULL; ++ip; }
  char tmp[20];
  int ti = 0;
  do { tmp[ti++] = (char)('0' + ip % 10); ip /= 10; } while (ip);
  while (ti) *p++ = tmp[--ti];
  if (frac) {
    *p++ = '.';
    char fb[9];
    for (int k = 8; k >= 0; --k) { fb[k] = (char)('0' + frac % 10); frac /= 10; }
    int last = 8;
    while (fb[last] == '0') --last;
    for (int k = 0; k <= last; ++k) *p++ = fb[k];
  }
  return p;
}

// One frame row -> {"timestamp": t, "session": i, "blendshapes": [...]}.
// Returns bytes written (excluding NUL), or -1 if cap is too small.
static int km_fmt_row(char* out, int cap, double timestamp, int64_t session,
                      const float* row, int64_t n) {
  if ((int64_t)cap < 80 + 34 * n) return -1;  // worst case, checked once
  int off = snprintf(out, cap,
                     "{\"timestamp\": %.6f, \"session\": %lld, "
                     "\"blendshapes\": [",
                     timestamp, (long long)session);
  if (off < 0 || off >= cap) return -1;
  char* p = out + off;
  for (int64_t j = 0; j < n; ++j) {
    if (j) { *p++ = ','; *p++ = ' '; }
    p = km_fmt_f32(p, row[j]);
  }
  *p++ = ']';
  *p++ = '}';
  return (int)(p - out);
}

// Send one JSON datagram per session row over an existing UDP socket fd
// (unconnected; dest given as a dotted-quad + port, resolved by the Python
// caller). Returns datagrams actually sent, or <0 on setup error. Send
// failures (e.g. transient buffer exhaustion) skip the row, matching the
// fire-and-forget semantics of the Python sendto loop.
int64_t km_emit_frames_udp(const float* frames, int64_t n_sessions,
                           int64_t n_coeffs, double timestamp,
                           int32_t sockfd, const char* ip, int32_t port) {
  struct sockaddr_in dest;
  std::memset(&dest, 0, sizeof(dest));
  dest.sin_family = AF_INET;
  dest.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, ip, &dest.sin_addr) != 1) return -1;
  // sendmmsg batches the per-datagram syscalls away (the syscall, not the
  // formatting, dominates the plain sendto loop: measured 27 vs ~7
  // us/session). One batch = KM_MMSG_BATCH rows formatted back to back.
  enum { KM_MMSG_BATCH = 64, KM_ROW_CAP = 2048 };
  static thread_local char bufs[KM_MMSG_BATCH][KM_ROW_CAP];
  struct mmsghdr msgs[KM_MMSG_BATCH];
  struct iovec iovs[KM_MMSG_BATCH];
  int64_t sent = 0;
  for (int64_t base = 0; base < n_sessions; base += KM_MMSG_BATCH) {
    int nb = (int)((n_sessions - base < (int64_t)KM_MMSG_BATCH)
                       ? n_sessions - base : (int64_t)KM_MMSG_BATCH);
    for (int k = 0; k < nb; ++k) {
      int64_t i = base + k;
      int len = km_fmt_row(bufs[k], KM_ROW_CAP, timestamp, i,
                           frames + i * n_coeffs, n_coeffs);
      if (len < 0) return -2;
      iovs[k].iov_base = bufs[k];
      iovs[k].iov_len = (size_t)len;
      std::memset(&msgs[k], 0, sizeof(msgs[k]));
      msgs[k].msg_hdr.msg_name = &dest;
      msgs[k].msg_hdr.msg_namelen = sizeof(dest);
      msgs[k].msg_hdr.msg_iov = &iovs[k];
      msgs[k].msg_hdr.msg_iovlen = 1;
    }
    int got = sendmmsg(sockfd, msgs, (unsigned)nb, 0);
    if (got > 0) sent += got;
    // partial/failed batches are dropped rows, matching the
    // fire-and-forget semantics of the Python sendto loop
  }
  return sent;
}

// Format the whole frame batch as JSONL into a caller-allocated buffer
// (file-output mode). Returns bytes written, or -2 if cap is too small.
int64_t km_format_frames_jsonl(const float* frames, int64_t n_sessions,
                               int64_t n_coeffs, double timestamp,
                               char* out, int64_t cap) {
  int64_t off = 0;
  for (int64_t i = 0; i < n_sessions; ++i) {
    int len = km_fmt_row(out + off, (int)(cap - off), timestamp, i,
                         frames + i * n_coeffs, n_coeffs);
    if (len < 0) return -2;
    off += len;
    if (off >= cap) return -2;
    out[off++] = '\n';
  }
  return off;
}

// Count non-blank lines (probe for allocation).
int64_t km_count_lines(const char* buf, int64_t len) {
  const char* p = buf;
  const char* end = buf + len;
  int64_t n = 0;
  while (p < end) {
    const char* line_end = (const char*)std::memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    if (skip_ws(p, line_end) != line_end) ++n;
    p = line_end + 1;
  }
  return n;
}

}  // extern "C"
