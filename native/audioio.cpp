// Native audio IO for the host data pipeline.
//
// The reference delegates wav decode + resample to torchaudio's C++ kernels
// inside DataLoader worker processes (SURVEY.md §2.3); this is the
// genvc_tpu-native equivalent: a small self-contained library doing RIFF/WAVE
// decode (PCM16/24/32 + float32, mono mixdown) and kaiser/hann polyphase
// resampling with kernels supplied by the Python side
// (genvc_tpu/dsp/filters.py stays the single source of truth for the filter
// design). Exposed via ctypes (genvc_tpu/data/native_audio.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Decode a wav file to mono float32. Returns 0 on success.
// *out is malloc'd; caller frees with audioio_free.
int audioio_load_wav(const char* path, float** out, int64_t* n_samples,
                     int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  auto fail = [&]() { fclose(f); return -2; };

  char tag[4];
  uint32_t riff_size;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4)) return fail();
  if (fread(&riff_size, 4, 1, f) != 1) return fail();
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4)) return fail();

  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  std::vector<uint8_t> data;

  while (fread(tag, 1, 4, f) == 4) {
    uint32_t chunk_size;
    if (fread(&chunk_size, 4, 1, f) != 1) break;
    if (!memcmp(tag, "fmt ", 4)) {
      uint8_t buf[40];
      uint32_t n = chunk_size < sizeof(buf) ? chunk_size : sizeof(buf);
      if (fread(buf, 1, n, f) != n) return fail();
      if (chunk_size > n) fseek(f, chunk_size - n, SEEK_CUR);
      audio_format = *(uint16_t*)(buf + 0);
      channels = *(uint16_t*)(buf + 2);
      sr = *(uint32_t*)(buf + 4);
      bits = *(uint16_t*)(buf + 14);
      if (audio_format == 0xFFFE && chunk_size >= 40)  // WAVE_FORMAT_EXTENSIBLE
        audio_format = *(uint16_t*)(buf + 24);
    } else if (!memcmp(tag, "data", 4)) {
      data.resize(chunk_size);
      size_t got = fread(data.data(), 1, chunk_size, f);
      data.resize(got);
      break;
    } else {
      fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (!channels || data.empty()) return -3;

  int64_t frames;
  const int bytes = bits / 8;
  frames = (int64_t)data.size() / (bytes * channels);
  float* mono = (float*)malloc(sizeof(float) * frames);
  if (!mono) return -4;

  const double inv_ch = 1.0 / channels;
  for (int64_t i = 0; i < frames; i++) {
    double acc = 0.0;
    for (int c = 0; c < channels; c++) {
      const uint8_t* p = data.data() + (i * channels + c) * bytes;
      double v = 0.0;
      if (audio_format == 3 && bits == 32) {           // IEEE float
        float fv; memcpy(&fv, p, 4); v = fv;
      } else if (bits == 16) {
        int16_t s; memcpy(&s, p, 2); v = s / 32768.0;
      } else if (bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
        v = (s >> 8) / 8388608.0;
      } else if (bits == 32) {
        int32_t s; memcpy(&s, p, 4); v = s / 2147483648.0;
      }
      acc += v;
    }
    mono[i] = (float)(acc * inv_ch);
  }
  *out = mono;
  *n_samples = frames;
  *sample_rate = (int32_t)sr;
  return 0;
}

void audioio_free(float* p) { free(p); }

// Polyphase resample matching genvc_tpu.dsp.resample.resample_np:
// pad input (width, width + orig_r), out[b*new_r + p] = kernels[p] . x[b*orig_r .. +klen]
// out must hold out_len floats (ceil(n * new_r / orig_r)).
int audioio_resample(const float* in, int64_t n, const float* kernels,
                     int32_t n_phases, int32_t klen, int32_t orig_r,
                     int32_t width, float* out, int64_t out_len) {
  const int64_t padded = n + 2 * width + orig_r;
  std::vector<float> x((size_t)padded, 0.0f);
  memcpy(x.data() + width, in, sizeof(float) * n);

  const int64_t n_blocks = n / orig_r + 1;
  int64_t oi = 0;
  for (int64_t b = 0; b < n_blocks && oi < out_len; b++) {
    const float* base = x.data() + b * orig_r;
    for (int32_t p = 0; p < n_phases && oi < out_len; p++, oi++) {
      const float* kr = kernels + (int64_t)p * klen;
      double acc = 0.0;
      for (int32_t k = 0; k < klen; k++) acc += (double)kr[k] * base[k];
      out[oi] = (float)acc;
    }
  }
  return 0;
}

}  // extern "C"
