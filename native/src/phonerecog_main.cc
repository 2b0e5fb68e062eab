// Drop-in replacement for the reference recognizer CLI:
//
//   phonerecog test.scp image.img output.mlf PIP LMW
//
// test.scp lists one binary float32 log-likelihood matrix (.lab) per
// line; output is an HTK MLF with per-segment frame times scaled to
// 100 ns units. Utterances decode in parallel (OpenMP when available).
//
// The reference's own recognizer source does not compile as shipped
// (recog_src/source/main.cpp includes a my_stopwatch.h absent from the
// tree); this is a from-spec reimplementation sharing the image and
// matrix formats.

#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "decoder.h"
#include "matrix_io.h"

namespace {

std::string BaseName(const std::string& path) {
  size_t b = 0, e = path.size();
  for (size_t i = 0; i < path.size(); ++i) {
    if (path[i] == '/' || path[i] == '\\') b = i + 1;
    if (path[i] == '.') e = i;
  }
  return path.substr(b, e > b ? e - b : std::string::npos);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 6 && argc != 7) {
    std::fprintf(stderr,
                 "Use: phonerecog test.scp image.img output.mlf PIP LMW "
                 "[beam]\n"
                 "  test.scp - one binary float32 log-likelihood matrix "
                 "(.lab) per line\n"
                 "  beam - optional beam width (prune biphones below "
                 "frame-max - beam; 0/absent = exact)\n");
    return 1;
  }
  const char* scp_path = argv[1];
  const char* img_path = argv[2];
  const char* out_path = argv[3];
  const float pip = -std::fabs(std::strtof(argv[4], nullptr));
  const float lmw = std::strtof(argv[5], nullptr);

  nnam::Image image;
  if (!image.Load(img_path, lmw)) {
    std::fprintf(stderr, "Cannot load image %s\n", img_path);
    return 1;
  }

  std::vector<std::string> files;
  {
    FILE* f = std::fopen(scp_path, "r");
    if (!f) {
      std::fprintf(stderr, "Cannot open scp %s\n", scp_path);
      return 1;
    }
    char line[4096];
    while (std::fgets(line, sizeof(line), f)) {
      std::string s(line);
      while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
      if (!s.empty()) files.push_back(s);
    }
    std::fclose(f);
  }

  nnam::Decoder decoder(image, pip);
  if (argc == 7) decoder.set_beam(std::strtof(argv[6], nullptr));
  std::vector<std::vector<nnam::Segment>> results(files.size());
  // vector<char>, not vector<bool>: the bitfield specialization
  // would make parallel writes to adjacent indices race
  std::vector<char> ok(files.size(), 0);

  // dynamic work queue over utterances (TSan-clean std::thread pool;
  // replaces the reference's OpenMP parallel-for, main.cpp:51-64)
  std::atomic<size_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const size_t i = next.fetch_add(1);
      if (i >= files.size()) return;
      nnam::Matrix m;
      if (LoadMatrix(files[i], &m)) {
        results[i] = decoder.Decode(m.data.data(), m.rows, m.cols);
        ok[i] = 1;
      }
    }
  };
  const unsigned n_threads =
      std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> pool;
  for (unsigned t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();

  FILE* out = std::fopen(out_path, "w");
  if (!out) {
    std::fprintf(stderr, "Cannot open output %s\n", out_path);
    return 1;
  }
  std::fprintf(out, "#!MLF!#\n");
  int failures = 0;
  for (size_t i = 0; i < files.size(); ++i) {
    if (!ok[i]) {
      std::fprintf(stderr, "Failed: %s\n", files[i].c_str());
      ++failures;
      continue;
    }
    std::fprintf(out, "\"*/%s.rec\"\n", BaseName(files[i]).c_str());
    for (const auto& seg : results[i]) {
      std::fprintf(out, "%d00000 %d00000 %s\n", seg.begin, seg.end,
                   image.phone_names[seg.triphone].c_str());
    }
    std::fprintf(out, ".\n");
  }
  std::fclose(out);
  return failures ? 2 : 0;
}
