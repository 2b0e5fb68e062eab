#include "decoder.h"

#include <cmath>
#include <cstdio>
#include <cstring>

namespace nnam {

namespace {
constexpr float kNegInf = -1.0e20f;

bool ReadI32(FILE* f, int32_t* v, size_t n) {
  return std::fread(v, sizeof(int32_t), n, f) == n;
}
bool ReadF32(FILE* f, float* v, size_t n) {
  return std::fread(v, sizeof(float), n, f) == n;
}
}  // namespace

bool Image::Load(const std::string& path, float lmw) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  int32_t hdr[4];
  if (!ReadI32(f, hdr, 4)) {
    std::fclose(f);
    return false;
  }
  // sanity bounds before any allocation (1e8 is far above any real image)
  for (int i = 0; i < 4; ++i) {
    if (hdr[i] <= 0 || hdr[i] > 100000000) {
      std::fclose(f);
      return false;
    }
  }
  bool ok = true;
  num_phones = hdr[0];
  num_biphones = hdr[1];
  num_triphones = hdr[2];
  num_states = hdr[3];

  start_idxs.resize(num_phones);
  end_idxs.resize(num_phones);
  biphone_in.resize(num_triphones);
  biphone_out.resize(num_triphones);
  state_idxs.resize(size_t(3) * num_triphones);
  tp_selfloop.resize(size_t(3) * num_triphones);
  tp_transition.resize(size_t(3) * num_triphones);
  out_offsets.resize(num_biphones + 1);

  ok = ok && ReadI32(f, start_idxs.data(), start_idxs.size());
  ok = ok && ReadI32(f, end_idxs.data(), end_idxs.size());
  ok = ok && ReadI32(f, biphone_in.data(), biphone_in.size());
  ok = ok && ReadI32(f, biphone_out.data(), biphone_out.size());
  ok = ok && ReadI32(f, state_idxs.data(), state_idxs.size());
  ok = ok && ReadF32(f, tp_selfloop.data(), tp_selfloop.size());
  ok = ok && ReadF32(f, tp_transition.data(), tp_transition.size());
  ok = ok && ReadI32(f, out_offsets.data(), out_offsets.size());
  if (ok) {
    out_values.resize(out_offsets[num_biphones]);
    ok = ReadI32(f, out_values.data(), out_values.size());
  }
  lm.resize(num_biphones);
  ok = ok && ReadF32(f, lm.data(), lm.size());
  for (auto& v : lm) v *= lmw;

  int32_t num_chars = 0;
  ok = ok && ReadI32(f, &num_chars, 1);
  if (ok) {
    std::string table(num_chars, '\0');
    ok = std::fread(table.data(), 1, num_chars, f) == size_t(num_chars);
    if (ok) {
      phone_names.clear();
      size_t beg = 0;
      for (size_t i = 0; i <= table.size(); ++i) {
        if (i == table.size() || table[i] == ' ') {
          phone_names.emplace_back(table.substr(beg, i - beg));
          beg = i + 1;
        }
      }
    }
  }
  std::fclose(f);
  return ok && int32_t(phone_names.size()) == num_triphones;
}

std::vector<Segment> Decoder::Decode(const float* lp, int32_t num_frames,
                                     int32_t num_states) const {
  std::vector<Segment> result;
  if (num_states != img_.num_states || num_frames <= 0) return result;

  const int32_t nb = img_.num_biphones;
  const int32_t nt = img_.num_triphones;

  // per-biphone exported score; init: mass on each phone's start biphone
  std::vector<float> p(nb, kNegInf);
  for (int32_t ph = 0; ph < img_.num_phones; ++ph) {
    const int32_t b = img_.start_idxs[ph];
    p[b] = img_.lm[b] - std::log(float(img_.num_phones));
  }

  // per-triphone 3-state scores + entry times (state-major layout so the
  // s-loop is a contiguous sweep)
  std::vector<float> score(size_t(3) * nt, kNegInf);
  std::vector<int32_t> entry(size_t(3) * nt, 0);

  // backpointers per (frame, biphone): winning triphone + its entry time
  std::vector<int32_t> bp_tri(size_t(num_frames) * nb);
  std::vector<int32_t> bp_time(size_t(num_frames) * nb);

  // beam pruning: dead scores are EXACTLY kNegInf (float absorption:
  // -1e20 + obs == -1e20), so skipping an all-dead triphone's update
  // is bit-identical to computing it — the TPU decoder computes them
  // and both agree on every live value
  const bool beam_on = beam_ > 0.0f;
  const float dead = kNegInf * 0.5f;
  int64_t skipped = 0;

  for (int32_t k = 0; k < num_frames; ++k) {
    const float* obs = lp + size_t(k) * num_states;
    float* s0 = score.data();
    float* s1 = score.data() + nt;
    float* s2 = score.data() + 2 * size_t(nt);
    int32_t* e0 = entry.data();
    int32_t* e1 = entry.data() + nt;
    int32_t* e2 = entry.data() + 2 * size_t(nt);

    for (int32_t n = 0; n < nt; ++n) {
      const float in_score = p[img_.biphone_in[n]] + pip_;
      if (beam_on && in_score <= dead && s0[n] <= dead && s1[n] <= dead &&
          s2[n] <= dead) {
        ++skipped;
        continue;
      }
      const int32_t* pdf = &img_.state_idxs[size_t(3) * n];
      const float* self_lp = &img_.tp_selfloop[size_t(3) * n];
      const float* fwd_lp = &img_.tp_transition[size_t(3) * n];

      // snapshot-based update (all reads are pre-update values)
      const float stay0 = s0[n] + self_lp[0];
      const float stay1 = s1[n] + self_lp[1];
      const float stay2 = s2[n] + self_lp[2];
      const float go1 = s0[n] + fwd_lp[0];
      const float go2 = s1[n] + fwd_lp[1];
      const int32_t et0 = e0[n], et1 = e1[n], et2 = e2[n];

      if (go2 > stay2) {
        s2[n] = go2 + obs[pdf[2]];
        e2[n] = et1;
      } else {
        s2[n] = stay2 + obs[pdf[2]];
        e2[n] = et2;
      }
      if (go1 > stay1) {
        s1[n] = go1 + obs[pdf[1]];
        e1[n] = et0;
      } else {
        s1[n] = stay1 + obs[pdf[1]];
        e1[n] = et1;
      }
      if (in_score > stay0) {
        s0[n] = in_score + obs[pdf[0]];
        e0[n] = k - 1;
      } else {
        s0[n] = stay0 + obs[pdf[0]];
        e0[n] = et0;
      }
    }

    // export: first-max over each biphone's feeding triphones
    int32_t* bt = &bp_tri[size_t(k) * nb];
    int32_t* bm = &bp_time[size_t(k) * nb];
    for (int32_t b = 0; b < nb; ++b) {
      float best = kNegInf;
      int32_t best_tri = 0;
      for (int32_t i = img_.out_offsets[b]; i < img_.out_offsets[b + 1]; ++i) {
        const int32_t tri = img_.out_values[i];
        const float out = s2[tri] + img_.tp_transition[size_t(3) * tri + 2];
        if (out > best) {
          best = out;
          best_tri = tri;
        }
      }
      p[b] = best + img_.lm[b];
      bt[b] = best_tri;
      bm[b] = e2[best_tri];
    }

    if (beam_on) {
      float pmax = kNegInf;
      for (int32_t b = 0; b < nb; ++b) pmax = p[b] > pmax ? p[b] : pmax;
      const float thr = pmax - beam_;
      for (int32_t b = 0; b < nb; ++b) {
        if (p[b] < thr) p[b] = kNegInf;
      }
    }
  }
  if (skipped) skipped_.fetch_add(skipped, std::memory_order_relaxed);

  // final biphone: first max over phone end biphones
  float best = kNegInf;
  int32_t cur = 0;
  for (int32_t ph = 0; ph < img_.num_phones; ++ph) {
    const int32_t b = img_.end_idxs[ph];
    if (p[b] > best) {
      best = p[b];
      cur = b;
    }
  }

  // backtrace (with a guard against the degenerate no-complete-path
  // case where the reference loops forever)
  int32_t t = num_frames - 1;
  while (t >= 0) {
    const int32_t tri = bp_tri[size_t(t) * nb + cur];
    Segment seg;
    seg.end = t + 1;
    const int32_t t_prev = t;
    t = bp_time[size_t(t) * nb + cur];
    seg.begin = t + 1;
    seg.triphone = tri;
    cur = img_.biphone_in[tri];
    result.push_back(seg);
    if (t >= t_prev) break;
  }
  // segments were collected back-to-front
  for (size_t i = 0, j = result.size(); i + 1 < j; ++i, --j) {
    std::swap(result[i], result[j - 1]);
  }
  return result;
}

}  // namespace nnam
