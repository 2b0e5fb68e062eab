// C API for ctypes: in-process host-side decoding from Python without
// the reference's .lab-file + subprocess boundary.

#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

#include "decoder.h"

extern "C" {

struct NnamDecoder {
  nnam::Image image;
  std::unique_ptr<nnam::Decoder> decoder;
};

// Returns nullptr on failure.
NnamDecoder* nnam_decoder_create(const char* image_path, float pip,
                                 float lmw) {
  auto* h = new NnamDecoder;
  if (!h->image.Load(image_path, lmw)) {
    delete h;
    return nullptr;
  }
  h->decoder = std::make_unique<nnam::Decoder>(
      h->image, -(pip < 0 ? -pip : pip));
  return h;
}

void nnam_decoder_destroy(NnamDecoder* h) { delete h; }

// Beam pruning (see Decoder::set_beam); beam <= 0 disables.
void nnam_decoder_set_beam(NnamDecoder* h, float beam) {
  h->decoder->set_beam(beam);
}

// Triphone updates skipped by beam pruning so far (for tests/stats).
int64_t nnam_decoder_skipped_updates(const NnamDecoder* h) {
  return h->decoder->skipped_updates();
}

int nnam_decoder_num_states(const NnamDecoder* h) {
  return h->image.num_states;
}

// Decodes (num_frames, num_states) log-probs. Fills up to max_segments
// rows of (begin, end, triphone) into out_segments (3 int32 per row).
// Returns the segment count, or -1 on error.
int nnam_decoder_decode(const NnamDecoder* h, const float* log_probs,
                        int num_frames, int num_states,
                        int32_t* out_segments, int max_segments) {
  auto segs = h->decoder->Decode(log_probs, num_frames, num_states);
  if (segs.empty() && num_frames > 0 && num_states != h->image.num_states) {
    return -1;
  }
  const int n = int(segs.size()) < max_segments ? int(segs.size())
                                                : max_segments;
  for (int i = 0; i < n; ++i) {
    out_segments[3 * i] = segs[i].begin;
    out_segments[3 * i + 1] = segs[i].end;
    out_segments[3 * i + 2] = segs[i].triphone;
  }
  return int(segs.size());
}

// Copies the phone name of a triphone into buf; returns name length.
int nnam_decoder_phone_name(const NnamDecoder* h, int triphone, char* buf,
                            int buf_len) {
  if (triphone < 0 || triphone >= h->image.num_triphones) return -1;
  const auto& name = h->image.phone_names[triphone];
  const int n = int(name.size()) < buf_len - 1 ? int(name.size())
                                               : buf_len - 1;
  std::memcpy(buf, name.data(), n);
  buf[n] = '\0';
  return int(name.size());
}

}  // extern "C"
