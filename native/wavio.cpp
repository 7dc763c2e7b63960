// Native WAV decode + resample for the data pipeline.
//
// The reference decodes/resamples audio through sox / libsndfile
// (SURVEY.md section 2.2 #N5). First-party equivalent: a RIFF/WAVE parser for
// PCM16/PCM32/IEEE-float payloads, downmix to mono, and polyphase-free linear
// resampling to the target rate. Host-side, feeds the padded-batch loader.
//
// C ABI, loaded via ctypes (metaasr_tpu/data/audio_io.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono, [-1, 1]
  int32_t sample_rate = 0;
};

bool parse_wav(const uint8_t* buf, int64_t n, Wav* out) {
  if (n < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  int64_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  int32_t rate = 0;
  const uint8_t* data = nullptr;
  int64_t data_len = 0;
  while (pos + 8 <= n) {
    uint32_t chunk_len;
    memcpy(&chunk_len, buf + pos + 4, 4);
    if (memcmp(buf + pos, "fmt ", 4) == 0 && chunk_len >= 16) {
      memcpy(&fmt, buf + pos + 8, 2);
      memcpy(&channels, buf + pos + 10, 2);
      memcpy(&rate, buf + pos + 12, 4);
      memcpy(&bits, buf + pos + 22, 2);
    } else if (memcmp(buf + pos, "data", 4) == 0) {
      data = buf + pos + 8;
      data_len = std::min<int64_t>(chunk_len, n - pos - 8);
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!data || channels == 0 || rate <= 0) return false;

  int64_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  int64_t frames = data_len / (bytes_per * channels);
  out->samples.resize(frames);
  out->sample_rate = rate;
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float f;
        memcpy(&f, p, 4);
        v = f;
      } else if (bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.0;
      } else if (bits == 8) {
        v = (p[0] - 128) / 128.0;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = static_cast<float>(acc / channels);
  }
  return true;
}

void resample_linear(const std::vector<float>& in, int32_t in_rate,
                     int32_t out_rate, std::vector<float>* out) {
  if (in_rate == out_rate || in.empty()) {
    *out = in;
    return;
  }
  int64_t out_n =
      static_cast<int64_t>(in.size()) * out_rate / in_rate;
  out->resize(out_n);
  double step = static_cast<double>(in_rate) / out_rate;
  for (int64_t i = 0; i < out_n; ++i) {
    double t = i * step;
    int64_t j = static_cast<int64_t>(t);
    double frac = t - j;
    float a = in[std::min<int64_t>(j, in.size() - 1)];
    float b = in[std::min<int64_t>(j + 1, in.size() - 1)];
    (*out)[i] = static_cast<float>(a + (b - a) * frac);
  }
}

}  // namespace

extern "C" {

// Returns the number of mono samples after decode+resample, or -1 on error.
// Call once with out=nullptr to size the buffer, then again to fill it.
int64_t metaasr_load_wav(const char* path, int32_t target_rate, float* out,
                         int64_t out_capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  int64_t n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != static_cast<size_t>(n)) {
    fclose(f);
    return -1;
  }
  fclose(f);

  Wav wav;
  if (!parse_wav(buf.data(), n, &wav)) return -1;
  std::vector<float> res;
  resample_linear(wav.samples, wav.sample_rate,
                  target_rate > 0 ? target_rate : wav.sample_rate, &res);
  if (out) {
    int64_t m = std::min<int64_t>(res.size(), out_capacity);
    memcpy(out, res.data(), m * sizeof(float));
  }
  return static_cast<int64_t>(res.size());
}

// Writes float mono samples as PCM16 WAV. Returns 0 on success.
int32_t metaasr_write_wav(const char* path, const float* samples, int64_t n,
                          int32_t rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_len = static_cast<uint32_t>(n * 2);
  uint32_t riff_len = 36 + data_len;
  uint16_t fmt = 1, channels = 1, bits = 16;
  uint32_t byte_rate = rate * 2;
  uint16_t block_align = 2;
  uint32_t fmt_len = 16;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_len, 4, 1, f);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  fwrite(&fmt_len, 4, 1, f);
  fwrite(&fmt, 2, 1, f);
  fwrite(&channels, 2, 1, f);
  fwrite(&rate, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block_align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_len, 4, 1, f);
  for (int64_t i = 0; i < n; ++i) {
    float v = samples[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    int16_t s = static_cast<int16_t>(v * 32767.0f);
    fwrite(&s, 2, 1, f);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
