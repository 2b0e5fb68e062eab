#include "matrix_io.h"

#include <cstdio>

namespace nnam {

bool LoadMatrix(const std::string& path, Matrix* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  uint32_t dims[2];
  if (std::fread(dims, sizeof(uint32_t), 2, f) != 2) {
    std::fclose(f);
    return false;
  }
  out->rows = static_cast<int32_t>(dims[0]);
  out->cols = static_cast<int32_t>(dims[1]);
  const size_t n = size_t(out->rows) * out->cols;
  out->data.resize(n);
  const bool ok = std::fread(out->data.data(), sizeof(float), n, f) == n;
  std::fclose(f);
  return ok;
}

bool SaveMatrix(const std::string& path, const Matrix& m) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  uint32_t dims[2] = {static_cast<uint32_t>(m.rows),
                      static_cast<uint32_t>(m.cols)};
  bool ok = std::fwrite(dims, sizeof(uint32_t), 2, f) == 2;
  const size_t n = size_t(m.rows) * m.cols;
  ok = ok && std::fwrite(m.data.data(), sizeof(float), n, f) == n;
  std::fclose(f);
  return ok;
}

}  // namespace nnam
