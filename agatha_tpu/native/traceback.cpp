// Native banded affine-gap traceback (CIGAR).
//
// Mirrors agatha_tpu/ops/traceback.py exactly (same recurrence as the
// TPU kernel / reference CORE_COMPUTE, agatha_kernel.h:20-31: both gap
// states re-open from the diagonal candidate `temp`).  The Python
// implementation is the semantic reference; tests cross-check this
// against it on random pairs.  C++ because host-side CIGAR for ~10kb
// reads costs ~0.8s/pair in NumPy — far too slow to keep many chips fed.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

const int32_t kMinusInf2 = -16384;       // MINUS_INF2 (gasal_kernels.h:39)
const int64_t kNeg = -1000000000LL;      // path -inf
const int32_t kNValue = 14;
const int32_t kNPenalty = 1;

inline int64_t sub_score(uint8_t qb, uint8_t tb, int32_t match,
                         int32_t mism) {
  if (qb == kNValue || tb == kNValue) return -kNPenalty;
  return qb == tb ? match : -mism;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills cigar_out (run-length encoded, NUL
// terminated) and score_out.  Returns -1 if cigar_cap is too small.
// bw gates the boundary inits (the scoring band); bw_region widens the
// walk-back region so end positions the kernel reports from
// band-exempt chunk-interior cells stay inside the stored flags.
int agatha_traceback(const uint8_t* qcodes, const uint8_t* tcodes,
                     int32_t q_end, int32_t t_end, int32_t match,
                     int32_t mism, int32_t goe, int32_t ge, int32_t bw,
                     int32_t bw_region, char* cigar_out,
                     int64_t cigar_cap, int64_t* score_out) {
  const int64_t nq = q_end + 1;
  const int64_t nt = t_end + 1;
  const int64_t bwr = bw_region;
  const int64_t width =
      (2LL * bwr + 1 < nq) ? (2LL * bwr + 1) : nq;

  auto lo = [&](int64_t r) { return r - bwr > 0 ? r - bwr : 0; };
  auto hi = [&](int64_t r) {
    return r + bwr < nq - 1 ? r + bwr : nq - 1;
  };

  // flags: bits 0-1 H source (0 diag, 1 E, 2 F); bit 2 E opened from
  // temp; bit 3 F opened from temp.
  std::vector<uint8_t> flags(static_cast<size_t>(nt) * width, 0);
  std::vector<int64_t> prev_h(width), prev_e(width), prev_temp(width);
  std::vector<int64_t> h_row(width), e_val(width), temp(width);
  std::vector<int64_t> f_val(width);

  // virtual row -1: top boundary (agatha_kernel.h:126-148)
  int64_t prev_lo = lo(0);
  {
    int64_t h0 = hi(0);
    for (int64_t j = 0; j + lo(0) <= h0; ++j) {
      int64_t col = lo(0) + j;
      if (col <= bw) {
        prev_h[j] = -(goe + (int64_t)ge * col);
        prev_e[j] = prev_h[j] - goe;
      } else {
        prev_h[j] = kMinusInf2;
        prev_e[j] = kMinusInf2;
      }
      prev_temp[j] = kNeg;
    }
  }

  int64_t prev_m = hi(0) - lo(0) + 1;

  for (int64_t r = 0; r < nt; ++r) {
    const int64_t l = lo(r), h_ = hi(r);
    const int64_t m = h_ - l + 1;
    const uint8_t tb = tcodes[r];
    uint8_t* frow = flags.data() + r * width;

    // windowed fetch helpers: prev arrays are indexed from prev_lo
    auto wget = [&](const std::vector<int64_t>& prev, int64_t j0,
                    int64_t i, int64_t fill) -> int64_t {
      int64_t j = j0 + i;
      return (j >= 0 && j < prev_m) ? prev[j] : fill;
    };

    const int64_t j0_diag = (l - 1) - prev_lo;
    const int64_t j0_up = l - prev_lo;

    int64_t f_state;
    if (l == 0) {
      f_state = (r <= bw) ? (-(goe + (int64_t)ge * r) - goe)
                          : (int64_t)kMinusInf2;
    } else {
      f_state = kNeg;
    }
    int64_t temp_left = kNeg;

    for (int64_t i = 0; i < m; ++i) {
      const int64_t col = l + i;
      // diagonal H(r-1, q-1)
      int64_t htl = wget(prev_h, j0_diag, i, kMinusInf2);
      if (col == 0) {
        if (r == 0) {
          htl = 0;  // origin corner
        } else {
          htl = (r - 1 <= bw) ? -(goe + (int64_t)ge * (r - 1))
                              : (int64_t)kMinusInf2;
        }
      }
      const int64_t tmp = htl + sub_score(qcodes[col], tb, match, mism);
      temp[i] = tmp;

      // E arriving from row r-1
      int64_t ev;
      bool e_open_flag = false;
      if (r == 0) {
        ev = wget(prev_e, j0_up, i, kNeg);  // top-boundary E directly
      } else {
        const int64_t e_in = wget(prev_e, j0_up, i, kNeg);
        const int64_t t_up = wget(prev_temp, j0_up, i, kNeg);
        const int64_t e_open = t_up - goe;
        const int64_t e_ext = e_in - ge;
        ev = e_open >= e_ext ? e_open : e_ext;
        e_open_flag = e_open >= e_ext;
      }
      e_val[i] = ev;

      // F along the row
      int64_t fv;
      bool f_open_flag = false;
      if (i == 0 && l == 0) {
        fv = f_state;  // left-boundary F directly at column 0
      } else {
        const int64_t fo = temp_left - goe;
        const int64_t fe = f_state - ge;
        fv = fo >= fe ? fo : fe;
        f_open_flag = fo >= fe;
      }
      f_val[i] = fv;

      int64_t hv = tmp;
      uint8_t src = 0;
      if (ev > hv) {
        hv = ev;
        src = 1;
      }
      if (fv > hv) {
        hv = fv;
        src = 2;
      }
      h_row[i] = hv;
      frow[i] = static_cast<uint8_t>(
          src | (e_open_flag ? 4 : 0) | (f_open_flag ? 8 : 0));

      temp_left = tmp;
      f_state = fv;
    }

    prev_h.swap(h_row);
    prev_e.swap(e_val);
    prev_temp.swap(temp);
    prev_lo = l;
    prev_m = m;
  }

  *score_out = prev_h[q_end - lo(t_end)];

  // --- walk back ---
  std::vector<char> ops;
  ops.reserve(nq + nt);
  int64_t r = t_end, q = q_end;
  char state = 'H';
  while (r >= 0 && q >= 0) {
    if (q < lo(r) || q > hi(r)) return -2;  // escaped the band
    const uint8_t fl = flags[r * width + (q - lo(r))];
    if (state == 'H') {
      const uint8_t src = fl & 3;
      if (src == 0) {
        ops.push_back('M');
        --r;
        --q;
      } else if (src == 1) {
        state = 'E';
      } else {
        state = 'F';
      }
    } else if (state == 'E') {
      ops.push_back('D');
      const bool opened = fl & 4;
      --r;
      if (opened) {
        ops.push_back('M');
        --r;
        --q;
        state = 'H';
      }
    } else {  // F
      ops.push_back('I');
      const bool opened = fl & 8;
      --q;
      if (opened) {
        ops.push_back('M');
        --r;
        --q;
        state = 'H';
      }
    }
  }
  while (q >= 0) {
    ops.push_back('I');
    --q;
  }
  while (r >= 0) {
    ops.push_back('D');
    --r;
  }

  // reverse + run-length encode
  int64_t pos = 0;
  for (int64_t i = static_cast<int64_t>(ops.size()) - 1; i >= 0;) {
    const char op = ops[i];
    int64_t j = i;
    while (j >= 0 && ops[j] == op) --j;
    const int64_t run = i - j;
    char buf[24];
    const int wrote = snprintf(buf, sizeof buf, "%lld%c",
                               static_cast<long long>(run), op);
    if (pos + wrote + 1 > cigar_cap) return -1;
    memcpy(cigar_out + pos, buf, wrote);
    pos += wrote;
    i = j;
  }
  cigar_out[pos] = '\0';
  return 0;
}

}  // extern "C"
