// Triphone-HMM Viterbi decoder over the compiled decoding image.
//
// Image byte format and decoding semantics are the contract
// reverse-specified from the reference recognizer
// (recog_src/source/phone_recog.cpp:84-254); the implementation here is
// our own host-side counterpart of the TPU decoder in
// nnacousticmodeling_tpu/decoder/viterbi.py, used for the drop-in
// `phonerecog` CLI and as a ctypes-loadable library.
#pragma once

#include <atomic>
#include <cstdint>
#include <string>
#include <vector>

#include "matrix_io.h"

namespace nnam {

struct Image {
  int32_t num_phones = 0;
  int32_t num_biphones = 0;
  int32_t num_triphones = 0;
  int32_t num_states = 0;
  std::vector<int32_t> start_idxs;    // per phone: entry biphone
  std::vector<int32_t> end_idxs;      // per phone: final biphone
  std::vector<int32_t> biphone_in;    // per triphone
  std::vector<int32_t> biphone_out;   // per triphone
  std::vector<int32_t> state_idxs;    // 3 pdf ids per triphone
  std::vector<float> tp_selfloop;     // 3 per triphone (log)
  std::vector<float> tp_transition;   // 3 per triphone (log)
  std::vector<int32_t> out_offsets;   // CSR over biphones
  std::vector<int32_t> out_values;    // triphones feeding each biphone
  std::vector<float> lm;              // per biphone (LMW applied at load)
  std::vector<std::string> phone_names;  // per triphone

  bool Load(const std::string& path, float lmw);
};

struct Segment {
  int32_t begin = 0;  // frame index
  int32_t end = 0;    // frame index (exclusive, +1 like the reference)
  int32_t triphone = 0;
};

class Decoder {
 public:
  // pip is passed as the CLI does (negative penalty); it is added on
  // every phone entry.
  Decoder(const Image& image, float pip) : img_(image), pip_(pip) {}

  // Beam pruning: after each frame's biphone export (+LM), biphone
  // scores below (frame max - beam) are clamped to -inf, and triphones
  // whose entry AND all three states are dead skip their update
  // entirely (the actual host-side speedup). Scores of dead states are
  // exactly -1e20 by float absorption, so a wide beam reproduces the
  // exact un-pruned segments and any beam matches the TPU decoder's
  // identical rule bit-for-bit. beam <= 0 disables (default).
  void set_beam(float beam) { beam_ = beam; }

  // log_probs: (num_frames, num_states) row-major. Returns segments in
  // temporal order; empty on state-count mismatch.
  std::vector<Segment> Decode(const float* log_probs, int32_t num_frames,
                              int32_t num_states) const;

  const Image& image() const { return img_; }

  // triphone updates skipped by beam pruning across all Decode calls
  // (atomic: Decode runs on a thread pool)
  int64_t skipped_updates() const {
    return skipped_.load(std::memory_order_relaxed);
  }

 private:
  const Image& img_;
  float pip_;
  float beam_ = 0.0f;
  mutable std::atomic<int64_t> skipped_{0};
};

}  // namespace nnam
