// Binary matrix (.lab) I/O: 2 x uint32 dims header + row-major float32
// payload. Format contract shared with the Python side
// (nnacousticmodeling_tpu/io/binio.py) and the reference tools
// (scripts/util/kw_utils.py:4-22, recog_src/source/data.cpp:23-64).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace nnam {

struct Matrix {
  int32_t rows = 0;
  int32_t cols = 0;
  std::vector<float> data;  // rows * cols, row-major

  const float* row(int32_t r) const { return data.data() + size_t(r) * cols; }
};

// Returns false on open/parse failure.
bool LoadMatrix(const std::string& path, Matrix* out);
bool SaveMatrix(const std::string& path, const Matrix& m);

}  // namespace nnam
