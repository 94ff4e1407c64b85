// Native host data plane: WAV decode + polyphase resampling.
//
// The TPU compute path is JAX/XLA/Pallas; this library owns the hot host-side
// work of the extraction pipeline (audio decode feeding the device input
// queue). Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC wealy_host.cpp -o libwealy_host.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------
// Parses a RIFF/WAVE buffer: PCM 8/16/24/32-bit int and 32/64-bit IEEE float,
// any channel count (downmixed to mono by averaging).
//
// Returns 0 on success. Caller provides the output buffer via wav_info first:
//   wav_info(data, len, &n_samples_mono, &sample_rate) -> 0/err
//   wav_decode(data, len, out /* n_samples_mono floats */) -> 0/err
//
// Error codes: 1=bad header, 2=missing fmt, 3=missing data, 4=unsupported fmt.

static int parse_wav(const uint8_t* data, uint64_t len, uint16_t* format,
                     uint16_t* channels, uint32_t* rate, uint16_t* bits,
                     const uint8_t** payload, uint64_t* payload_len) {
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return 1;
  uint64_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= len) {
    const uint8_t* hdr = data + pos;
    uint32_t chunk_len;
    memcpy(&chunk_len, hdr + 4, 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > len) chunk_len = (uint32_t)(len - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      memcpy(format, body + 0, 2);
      memcpy(channels, body + 2, 2);
      memcpy(rate, body + 4, 4);
      memcpy(bits, body + 14, 2);
      if (*format == 0xFFFE && chunk_len >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: real format in the GUID's first 2 bytes
        memcpy(format, body + 24, 2);
      }
      have_fmt = true;
    } else if (memcmp(hdr, "data", 4) == 0) {
      *payload = body;
      *payload_len = chunk_len;
      have_data = true;
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are 2-byte aligned
    if (have_fmt && have_data) break;
  }
  if (!have_fmt) return 2;
  if (!have_data) return 3;
  return 0;
}

int wav_info(const uint8_t* data, uint64_t len, uint64_t* n_samples_mono,
             uint32_t* sample_rate) {
  uint16_t format, channels, bits;
  uint32_t rate;
  const uint8_t* payload;
  uint64_t payload_len;
  int rc = parse_wav(data, len, &format, &channels, &rate, &bits, &payload, &payload_len);
  if (rc) return rc;
  if (channels == 0 || bits == 0) return 4;
  uint64_t bytes_per_frame = (uint64_t)channels * (bits / 8);
  if (bytes_per_frame == 0) return 4;
  *n_samples_mono = payload_len / bytes_per_frame;
  *sample_rate = rate;
  return 0;
}

int wav_decode(const uint8_t* data, uint64_t len, float* out) {
  uint16_t format, channels, bits;
  uint32_t rate;
  const uint8_t* payload;
  uint64_t payload_len;
  int rc = parse_wav(data, len, &format, &channels, &rate, &bits, &payload, &payload_len);
  if (rc) return rc;
  uint64_t bytes_per_sample = bits / 8;
  uint64_t bytes_per_frame = (uint64_t)channels * bytes_per_sample;
  if (bytes_per_frame == 0) return 4;
  uint64_t frames = payload_len / bytes_per_frame;
  const float inv_ch = 1.0f / (float)channels;

  for (uint64_t i = 0; i < frames; ++i) {
    float acc = 0.0f;
    const uint8_t* f = payload + i * bytes_per_frame;
    for (uint16_t c = 0; c < channels; ++c) {
      const uint8_t* s = f + c * bytes_per_sample;
      float v = 0.0f;
      if (format == 1) {  // integer PCM
        switch (bits) {
          case 8: v = ((float)(*s) - 128.0f) / 128.0f; break;
          case 16: { int16_t x; memcpy(&x, s, 2); v = (float)x / 32768.0f; } break;
          case 24: {
            int32_t x = (int32_t)((uint32_t)s[0] | ((uint32_t)s[1] << 8) |
                                  ((uint32_t)s[2] << 16));
            if (x & 0x800000) x |= (int32_t)0xFF000000;
            v = (float)x / 8388608.0f;
          } break;
          case 32: { int32_t x; memcpy(&x, s, 4); v = (float)x / 2147483648.0f; } break;
          default: return 4;
        }
      } else if (format == 3) {  // IEEE float
        if (bits == 32) { float x; memcpy(&x, s, 4); v = x; }
        else if (bits == 64) { double x; memcpy(&x, s, 8); v = (float)x; }
        else return 4;
      } else {
        return 4;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Polyphase resampling
// ---------------------------------------------------------------------------
// y[j] = sum_k taps[k] * x[(j*M + k - half) / L]  where (j*M + k - half) % L == 0
// (cross-correlation with an L-dilated input — matches the framework's
// lax.conv_general_dilated formulation in wealy_tpu/audio/resample.py so the
// native and XLA paths agree bit-closely).

int resample_poly(const float* x, uint64_t n, int L, int M, const float* taps,
                  int ktaps, float* out, uint64_t out_len) {
  if (L <= 0 || M <= 0 || ktaps <= 0) return 1;
  const int64_t half = (ktaps - 1) / 2;
  for (uint64_t j = 0; j < out_len; ++j) {
    const int64_t t0 = (int64_t)j * M - half;  // upsampled-grid index of tap 0
    // find first k with (t0 + k) % L == 0
    int64_t rem = ((t0 % L) + L) % L;
    int64_t k = (rem == 0) ? 0 : (L - rem);
    float acc = 0.0f;
    for (; k < ktaps; k += L) {
      const int64_t xi = (t0 + k) / L;
      if (xi >= 0 && xi < (int64_t)n) acc += taps[k] * x[xi];
    }
    out[j] = acc;
  }
  return 0;
}

// Zero-padded 30 s chunk packing: audio (n,) -> out (n_chunks, chunk) floats.
int pack_chunks(const float* x, uint64_t n, uint64_t chunk, float* out,
                uint64_t n_chunks) {
  for (uint64_t c = 0; c < n_chunks; ++c) {
    const uint64_t start = c * chunk;
    const uint64_t take = start < n ? std::min(chunk, n - start) : 0;
    if (take) memcpy(out + c * chunk, x + start, take * sizeof(float));
    if (take < chunk) memset(out + c * chunk + take, 0, (chunk - take) * sizeof(float));
  }
  return 0;
}

}  // extern "C"
