// Native audio runtime: WAV I/O, PCM (re)quantization and signal framing.
//
// The reference does its host-side audio plumbing in Python
// (soundfile/pydub file round trips in uformerWM/audio_attack.py:87-96,
// eager python-loop dataset chunking in uformerWM/audio_test.py:439-502).
// This library is the framework's native data-path equivalent: zero-copy
// C implementations the Python layer calls through ctypes
// (image_in_speech_watermarking_tpu/data/native.py), with a pure-numpy
// fallback when the .so is absent.
//
// Build: g++ -O3 -shared -fPIC -o libaudioio.so audioio.cpp  (see Makefile)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV (RIFF/PCM) reading and writing. Supports PCM_U8, PCM_16, FLOAT_32.
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits;       // 8 (unsigned), 16 (signed), 32 (float)
  int64_t frames;
};

static bool read_header(FILE* f, WavInfo* info, long* data_offset,
                        int64_t* data_bytes) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4)) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4)) return false;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t buf[40];
      if (sz > sizeof(buf) || fread(buf, 1, sz, f) != sz) return false;
      fmt = *(uint16_t*)(buf + 0);
      channels = *(uint16_t*)(buf + 2);
      rate = *(uint32_t*)(buf + 4);
      bits = *(uint16_t*)(buf + 14);
    } else if (!memcmp(id, "data", 4)) {
      *data_offset = ftell(f);
      *data_bytes = sz;
      info->sample_rate = (int32_t)rate;
      info->channels = (int32_t)channels;
      info->bits = (int32_t)bits;
      info->frames = (int64_t)sz / (channels * (bits / 8));
      return (fmt == 1 && (bits == 8 || bits == 16)) ||
             (fmt == 3 && bits == 32);
    } else {
      fseek(f, (long)((sz + 1) & ~1u), SEEK_CUR);
    }
  }
  return false;
}

// Probe a wav file; returns 0 on success.
int wav_info(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long off; int64_t bytes;
  bool ok = read_header(f, info, &off, &bytes);
  fclose(f);
  return ok ? 0 : -2;
}

// Read and convert to float32 in [-1, 1), mono-mixing if channels > 1.
// out must hold info.frames floats. Returns frames read, < 0 on error.
int64_t wav_read(const char* path, float* out, int64_t max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  long off; int64_t bytes;
  if (!read_header(f, &info, &off, &bytes)) { fclose(f); return -2; }
  fseek(f, off, SEEK_SET);
  int64_t n = info.frames < max_frames ? info.frames : max_frames;
  int ch = info.channels;
  std::vector<uint8_t> raw((size_t)(n * ch * (info.bits / 8)));
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -3;
  }
  fclose(f);
  for (int64_t i = 0; i < n; i++) {
    double acc = 0.0;
    for (int c = 0; c < ch; c++) {
      if (info.bits == 8) {
        acc += ((int)raw[i * ch + c] - 128) / 128.0;
      } else if (info.bits == 16) {
        acc += ((int16_t*)raw.data())[i * ch + c] / 32768.0;
      } else {
        acc += ((float*)raw.data())[i * ch + c];
      }
    }
    out[i] = (float)(acc / ch);
  }
  return n;
}

// Write mono float32 samples as PCM (bits = 8 -> PCM_U8, matching
// soundfile's subtype='PCM_U8' used by the requantization attack;
// 16 -> PCM_16; 32 -> IEEE float). Returns 0 on success.
int wav_write(const char* path, const float* x, int64_t n,
              int32_t sample_rate, int32_t bits) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint16_t fmt = bits == 32 ? 3 : 1;
  uint32_t byte_rate = (uint32_t)(sample_rate * bits / 8);
  uint32_t data_bytes = (uint32_t)(n * bits / 8);
  uint32_t riff = 36 + data_bytes;
  uint16_t block = (uint16_t)(bits / 8);
  fwrite("RIFF", 1, 4, f); fwrite(&riff, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  uint32_t fmt_size = 16;
  uint16_t channels = 1;
  fwrite(&fmt_size, 4, 1, f); fwrite(&fmt, 2, 1, f);
  fwrite(&channels, 2, 1, f);
  fwrite(&sample_rate, 4, 1, f); fwrite(&byte_rate, 4, 1, f);
  fwrite(&block, 2, 1, f); fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_bytes, 4, 1, f);
  for (int64_t i = 0; i < n; i++) {
    float v = x[i] < -1.f ? -1.f : (x[i] > 1.f ? 1.f : x[i]);
    if (bits == 8) {
      int q = (int)lrintf(v * 128.0f) + 128;
      uint8_t b = (uint8_t)(q < 0 ? 0 : (q > 255 ? 255 : q));
      fwrite(&b, 1, 1, f);
    } else if (bits == 16) {
      long q = lrintf(v * 32768.0f);
      int16_t s = (int16_t)(q < -32768 ? -32768 : (q > 32767 ? 32767 : q));
      fwrite(&s, 2, 1, f);
    } else {
      fwrite(&v, 4, 1, f);
    }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// PCM requantization in memory (the attack's file round trip without the
// file: clip to [-1, 127/128], round to 1/2^(bits-1) steps).
// ---------------------------------------------------------------------------
void pcm_requantize(const float* x, float* out, int64_t n, int32_t bits) {
  const float scale = (float)(1 << (bits - 1));
  const float hi = (scale - 1.0f) / scale;
  for (int64_t i = 0; i < n; i++) {
    float v = x[i] < -1.f ? -1.f : (x[i] > hi ? hi : x[i]);
    out[i] = (float)lrintf(v * scale) / scale;
  }
}

// ---------------------------------------------------------------------------
// Signal framing: x (n) -> frames (num_frames, frame_len) with hop,
// optional reflect center padding of pad samples on each side — the
// host-side mirror of dsp.frame_signal for native data loaders.
// ---------------------------------------------------------------------------
int64_t frame_signal(const float* x, int64_t n, float* out,
                     int64_t frame_len, int64_t hop, int64_t pad) {
  int64_t total = n + 2 * pad;
  int64_t num = total < frame_len ? 0 : 1 + (total - frame_len) / hop;
  for (int64_t fi = 0; fi < num; fi++) {
    for (int64_t j = 0; j < frame_len; j++) {
      int64_t t = fi * hop + j - pad;          // index into x with reflect
      if (t < 0) t = -t;
      if (t >= n) t = 2 * (n - 1) - t;
      if (t < 0) t = 0;                         // degenerate tiny n
      out[fi * frame_len + j] = x[t];
    }
  }
  return num;
}

}  // extern "C"
