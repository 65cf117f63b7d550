// Native text-similarity kernels for the dedup hot path.
//
// The reference leans on the python-Levenshtein C wheel for its dedup loop
// (reference backend/main.py:798). This is our own implementation: the
// normalized indel similarity (substitution cost 2), computed with a
// banded two-row DP over uint32 code points.
//
// Build: see vse_tpu/native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// Indel edit distance (insertions + deletions only; a substitution counts 2).
static size_t indel_distance(const uint32_t* a, size_t la, const uint32_t* b,
                             size_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  // strip common prefix/suffix — typical dedup inputs are near-identical
  while (la > 0 && lb > 0 && a[0] == b[0]) { ++a; ++b; --la; --lb; }
  while (la > 0 && lb > 0 && a[la - 1] == b[lb - 1]) { --la; --lb; }
  if (la == 0) return lb;
  if (lb == 0) return la;

  std::vector<size_t> prev(lb + 1), cur(lb + 1);
  for (size_t j = 0; j <= lb; ++j) prev[j] = j;
  for (size_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (size_t j = 1; j <= lb; ++j) {
      if (ca == b[j - 1]) {
        cur[j] = prev[j - 1];
      } else {
        cur[j] = 1 + std::min(prev[j], cur[j - 1]);
      }
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

double vse_indel_ratio_u32(const uint32_t* a, size_t la, const uint32_t* b,
                           size_t lb) {
  const size_t lensum = la + lb;
  if (lensum == 0) return 1.0;
  const size_t d = indel_distance(a, la, b, lb);
  return static_cast<double>(lensum - d) / static_cast<double>(lensum);
}

}  // extern "C"
