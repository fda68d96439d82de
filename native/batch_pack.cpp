// Threaded host-side batch packing — the native piece of the input pipeline
// (SURVEY.md §2.2 N8). The reference gets its host-side parallel copy from
// torch DataLoader worker processes + pin_memory (datamodule.py:198-220);
// here variable-length utterances are packed into the static padded batch
// buffers the TPU feed expects, with one std::thread per stripe of rows.
//
// Exposed through a C ABI consumed by ctypes (rnntransducer_tpu/data/collate.py).
// Build: make -C native  (produces libbatch_pack.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void PackRows(const float* const* srcs, const int32_t* rows, int b_begin,
              int b_end, int max_rows, int cols, float* out) {
  const size_t row_bytes = static_cast<size_t>(cols) * sizeof(float);
  for (int b = b_begin; b < b_end; ++b) {
    float* dst = out + static_cast<size_t>(b) * max_rows * cols;
    const int n = std::min(rows[b], max_rows);
    if (n > 0) std::memcpy(dst, srcs[b], static_cast<size_t>(n) * row_bytes);
    // caller pre-zeroes or we clear the tail here; clearing here keeps the
    // contract self-contained
    std::memset(dst + static_cast<size_t>(n) * cols, 0,
                static_cast<size_t>(max_rows - n) * row_bytes);
  }
}

void QuantizeRows(const float* const* srcs, const int32_t* rows, int b_begin,
                  int b_end, int max_rows, int16_t* out, float* scales) {
  for (int b = b_begin; b < b_end; ++b) {
    int16_t* dst = out + static_cast<size_t>(b) * max_rows;
    const int n = std::min(rows[b], max_rows);
    const float* src = srcs[b];
    float peak = 0.0f;
    for (int i = 0; i < n; ++i) peak = std::max(peak, std::fabs(src[i]));
    // scale maps [-peak, peak] onto the int16 range; a silent row keeps
    // scale 0 and decodes to exact zeros (0 * 0 = 0)
    const float scale = peak > 0.0f ? peak / 32767.0f : 0.0f;
    const float inv = scale > 0.0f ? 1.0f / scale : 0.0f;
    for (int i = 0; i < n; ++i) {
      const float q = src[i] * inv;
      dst[i] = static_cast<int16_t>(q >= 0.0f ? q + 0.5f : q - 0.5f);
    }
    if (n < max_rows)
      std::memset(dst + n, 0, static_cast<size_t>(max_rows - n) * sizeof(int16_t));
    scales[b] = scale;
  }
}

}  // namespace

extern "C" {

// srcs: B pointers to contiguous (rows[b], cols) float32 arrays.
// out: preallocated (B, max_rows, cols) float32 buffer, fully overwritten.
void pack_batch_f32(const float* const* srcs, const int32_t* rows, int batch,
                    int max_rows, int cols, float* out, int n_threads) {
  n_threads = std::max(1, std::min(n_threads, batch));
  if (n_threads == 1) {
    PackRows(srcs, rows, 0, batch, max_rows, cols, out);
    return;
  }
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  const int stripe = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int b0 = t * stripe;
    const int b1 = std::min(batch, b0 + stripe);
    if (b0 >= b1) break;
    workers.emplace_back(PackRows, srcs, rows, b0, b1, max_rows, cols, out);
  }
  for (auto& w : workers) w.join();
}

// Fused per-row peak-scale int16 quantization + packing for raw-PCM batches:
// srcs are B pointers to (rows[b],) float32 waveforms; out is a preallocated
// (B, max_rows) int16 buffer (fully overwritten) and scales a (B,) float32
// buffer such that float(out[b]) * scales[b] reconstructs the waveform to
// 16-bit precision. Halves host->device transfer bytes for the raw-PCM
// training path in one pass over the data.
void pack_quantize_wav_i16(const float* const* srcs, const int32_t* rows,
                           int batch, int max_rows, int16_t* out,
                           float* scales, int n_threads) {
  n_threads = std::max(1, std::min(n_threads, batch));
  if (n_threads == 1) {
    QuantizeRows(srcs, rows, 0, batch, max_rows, out, scales);
    return;
  }
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  const int stripe = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int b0 = t * stripe;
    const int b1 = std::min(batch, b0 + stripe);
    if (b0 >= b1) break;
    workers.emplace_back(QuantizeRows, srcs, rows, b0, b1, max_rows, out,
                         scales);
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
