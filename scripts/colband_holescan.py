"""Exhaustive-ish scan for colband's single-interval proof obligation.

The banded column-sweep kernel's plain-weight E form (ops/colband.py)
is exact iff every column's computed row set is ONE contiguous
interval.  The length-derived clips can never break a column (ss's
``i - pql + 1`` term and se's ``prl - 1`` / ``i + sw - 1`` terms are
vacuous for real columns: i <= pr + pj and pj <= pql - 1 make them
pass identically — see the analysis in colband_eligible's docstring),
so a hole can only come from the band-term STAIRCASES of the slice
clip interacting with the chunk-interior band exemption, which is a
function of (band_width, slice_width) geometry and the block indices —
NOT of the scoring parameters.  This scan therefore sweeps (bw, sw)
over the supported envelope and, for each, scans every column of a
set of (qlen, rlen) shapes chosen to place band edges at every block
phase.

Usage: python scripts/colband_holescan.py [quick|full]
  quick: the config classes the tests use + canonical (seconds)
  full:  bw in {3..991 sampled}, sw in {1..6} (minutes)

Exits non-zero and prints the first counterexample if any column's
computed set has a hole.
"""

import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import sys

import numpy as np


from agatha_tpu.ops.colband import slice_bounds_np  # noqa: E402

_I64 = np.int64


def scan_shape(qlen: int, rlen: int, sw: int, bw: int):
    """Return the first (j, rows) hole in any column, else None.

    Vectorized over all columns at once in row-block space: for column
    j the per-block mask is insl & in_chunk & (interior | band-full) —
    a block is 'band-full' per column iff EVERY row of the block
    passes |j - r| <= bw; blocks where the band test partially clips
    rows stay inside the interval iff they are the edge blocks, which
    the per-row check below verifies for flagged columns only.
    """
    pql = -(-qlen // 8)
    prl = -(-rlen // 8)
    R8 = prl * 8
    r_idx = np.arange(R8, dtype=_I64)
    pr = r_idx >> 3
    cs = np.maximum(0, 8 * pr - bw) // 8
    ce = np.minimum(pql - 1, (8 * pr + 7 + bw) // 8)

    holes = []
    # chunk columns in j to bound memory (masks are (chunk, R8) bool)
    CH = max(1, min(qlen, (1 << 24) // max(R8, 1)))
    for j0 in range(0, qlen, CH):
        j = np.arange(j0, min(qlen, j0 + CH), dtype=_I64)[:, None]
        pj = j >> 3
        i = ((pr[None, :] + pj) // sw) * sw
        ss, se = slice_bounds_np(i, pql, prl, sw, bw)
        insl = (pr >= ss) & (pr <= se)
        in_chunk = (pj >= cs) & (pj <= ce)
        interior = (pj > cs) & (pj < ce)
        in_band = np.abs(j - r_idx[None, :]) <= bw
        C = insl & in_chunk & (interior | in_band)
        any_c = C.any(axis=1)
        first = C.argmax(axis=1)
        last = R8 - 1 - C[:, ::-1].argmax(axis=1)
        n = C.sum(axis=1)
        bad = any_c & (last - first + 1 != n)
        if bad.any():
            k = int(np.flatnonzero(bad)[0])
            holes.append((int(j[k, 0]), np.flatnonzero(C[k])))
            return holes[0]
    return None


def shapes_for(bw: int):
    """Shapes placing band edges at every block phase: lengths around
    multiples of the band, +-0..15 offsets, extreme aspect ratios."""
    base = [bw + d for d in range(-2, 18)] + [
        2 * bw + d for d in range(-2, 18)
    ] + [3 * bw + 7, 4 * bw + 3, 8, 16, 64, 200]
    base = sorted({max(1, v) for v in base})
    out = []
    for ql in base:
        for rl in (8, bw + 5, 2 * bw + 11, 3 * bw + 2, ql, ql + 13):
            out.append((ql, max(1, rl)))
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "full":
        bws = sorted({3, 5, 15, 16, 17, 31, 32, 55, 63, 64, 101, 127,
                      128, 255, 256, 257, 511, 751, 752, 767, 991})
        sws = [1, 2, 3, 4, 5, 6]
    else:
        bws = [15, 31, 55, 63, 101, 127, 751]
        sws = [1, 2, 3, 4, 5]
    total = 0
    for sw in sws:
        for bw in bws:
            for ql, rl in shapes_for(bw):
                if ql * rl > 40_000_000:
                    continue
                hole = scan_shape(ql, rl, sw, bw)
                total += 1
                if hole:
                    j, rows = hole
                    print(f"HOLE: sw={sw} bw={bw} qlen={ql} rlen={rl} "
                          f"col={j} rows={rows.tolist()[:20]}")
                    return 1
    print(f"no holes in {total} (sw, bw, qlen, rlen) scans "
          f"(sw in {sws}, bw in {bws})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
