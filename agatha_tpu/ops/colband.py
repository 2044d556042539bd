"""Banded column-sweep formulation for the long-read regime.

The round-3 column-sweep kernel (ops/colsweep.py) is restricted to
buckets where the band covers the whole DP rectangle.  This module
extends the same inter-sequence mapping — **pairs on the 128 lanes,
target rows on sublanes, one query column per step** — to the banded
regime that the headline long-read workload lives in, where the
antidiagonal kernel (ops/kernel.py) previously was the only path.

Why it wins there (measured, scripts/colband_probe.py): a column
crosses the band in 2*bw+1 consecutive rows, so a sliding row window
of ~2*bw rows is ~96% live (the antidiagonal kernel's W-lane frame is
bw/W = 73% live), every shift amortizes over 128 pairs instead of 8,
and there is no serial per-diagonal roll chain.  Probe structure at
bw=751: ~4.4 us/column = ~44 GCUPS-equiv vs the antidiagonal kernel's
measured 30.8 and its 39.4 faithful-semantics roofline.

Semantics reproduced (reference agatha_kernel.h:20-47 CORE_COMPUTE,
183-186/224-253 slice/chunk/band clipping, 206-216 fake-row reloads,
291-356 Z-drop schedule + wrap-up; oracle: ops/sweep.py):

* per-cell computed predicate C(r, j): within a COLUMN j the query
  word pq = j >> 3 is constant, so the expensive slice/chunk algebra
  (cs/ce chunk bounds, slice index i = ((pr+pq)//sw)*sw, ss/se slice
  clips) is constant per 8-column group and only the per-cell band
  test |j - r| <= bw varies per column;
* value freezing at not-computed cells: H and F are row-state carries
  committed only where C (identical to the oracle's strip-mediated
  staleness); E is column-local and rooted at top_init_e(j), passing
  FROZEN (no gap-extend decay) through not-computed rows — made
  vectorizable by the computed-count weighting below;
* chunk-start resets (column j % 8 == 0 only — every cell of a column
  shares qq & 7 == j & 7): fake rows reload MINUS_INF2 into the
  F / diagonal-H inputs; int16 strip truncations are identities in
  the int16-safe regime this path requires (same gate as colsweep);
* per-diagonal maxima + the exact best/Z-drop replay, including the
  empty-slice termination (agatha_kernel.h:189) which the vacuous
  colsweep regime could never reach.

E under freezing, exactly: let S(r) = #{k < r : C(k, j)} (computed
count above r).  Then

    e_in(r) = max(root, max_{k<r, C(k)} temp(k) - goe + ge*(S(k)+1))
              - ge * S(r)          with  root = top_init_e(j)

because E decays by gap_extend once per COMPUTED cell it passes and
freezes through the rest (ops/sweep.py: e_next_src = where(C, ...)).
When C(., j) is a single interval (every config tested — the
hole-detector in tests/test_colband.py scans for counterexamples),
S(r) - S(k) - 1 == r - k - 1 inside the interval and the kernel can
use plain ge*r weights with the root injected at the interval's
rising edge; this module's NumPy contract uses the S-weighted exact
form so the equivalence is testable.

This NumPy contract (`align_one_colband_np`) is deliberately
structured like the kernel (column loop + diagonal-ring replay) and
must match ops/sweep.py bit-for-bit on every int16-safe input.
"""

from __future__ import annotations

import numpy as np

from agatha_tpu.config import AlignConfig
from agatha_tpu.constants import INT32_MIN, MINUS_INF2, N_PENALTY, N_VALUE

_I64 = np.int64
_NEG = -(1 << 40)  # prefix fill; far below any live int32 DP value


def _trunc16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _i32(x):
    return ((x + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def _ctrunc16(a):
    a = np.asarray(a, dtype=_I64)
    return np.where(a >= 0, a // 16, -((-a) // 16))


def slice_bounds_np(i, pql, prl, sw, bw):
    """(ss, se) of slice i — agatha_kernel.h:183-186 / sweep.py."""
    ss = np.maximum(np.maximum(0, i - pql + 1), _ctrunc16(8 * i + 8 - bw))
    se = np.minimum(
        np.minimum(prl - 1, i + sw - 1),
        _ctrunc16(8 * (i + sw - 1) + 7 + bw),
    )
    return ss, se


def first_empty_slice(qlen: int, rlen: int, cfg: AlignConfig):
    """Index of the first slice with ss > se, or None.

    The reference terminates the whole job at the top of a slice whose
    row range is empty (agatha_kernel.h:189); diagonals of that slice
    and beyond are never swept.
    """
    sw, bw = cfg.slice_width, cfg.band_width
    pql = -(-qlen // 8)
    prl = -(-rlen // 8)
    tad = prl + pql - 1
    i_end = -(-tad // sw) * sw
    for islice in range(0, i_end, sw):
        ss, se = slice_bounds_np(islice, pql, prl, sw, bw)
        if int(ss) > int(se):
            return islice
    return None


def computed_col(j: int, r_idx, pr, cs, ce, pql, prl, sw, bw, qlen):
    """The oracle's computed_mask restricted to column j (all rows).

    sweep.py computed_mask with qq = j constant: valid is a per-column
    scalar, in_chunk/interior depend on (pr, pj) only, in_slice on
    (pr + pj), and the band test is the only per-cell-within-group
    term.
    """
    if not (0 <= j < qlen):
        return np.zeros(r_idx.shape, bool)
    pj = j >> 3
    i = ((pr + pj) // sw) * sw
    ss, se = slice_bounds_np(i, pql, prl, sw, bw)
    in_slice = (pr >= ss) & (pr <= se)
    in_chunk = (pj >= cs) & (pj <= ce)
    interior = (pj > cs) & (pj < ce)
    in_band = np.abs(j - r_idx) <= bw
    return in_slice & in_chunk & (interior | in_band)


def cstart_col(j: int, pr, cs, sw):
    """Chunk-start mask for column j (sweep.py chunk_start_mask).

    Every cell of column j has query-word offset qq & 7 == j & 7, so
    chunk-start cells exist only at word-aligned columns.
    """
    if j % 8 != 0:
        return np.zeros(pr.shape, bool)
    pj = j >> 3
    i = ((pr + pj) // sw) * sw
    return pj == np.maximum(cs, i - pr)


def _top_init(col, cfg):
    goe, ge, bw = cfg.gap_oe, cfg.gap_extend, cfg.band_width
    k = _trunc16(-(goe + ge * col))
    h = 0 if col < 0 else (int(k) if col <= bw else MINUS_INF2)
    e = int(_trunc16(k - goe)) if col <= bw else MINUS_INF2
    return h, e


def align_one_colband_np(q_codes, t_codes, qlen, rlen, cfg: AlignConfig,
                         collect_holes: list | None = None):
    """NumPy banded column sweep of one pair; must match
    align_one_sweep on every int16-safe input.

    The semantic contract for the Pallas kernel: column loop with
    freezing, S-weighted E prefix, diagonal ring, then the exact
    per-diagonal chain replay with the empty-slice cap.  If
    `collect_holes` is a list, every column whose computed set is NOT
    one contiguous row interval appends (j, mask) to it — the
    kernel's plain-weight E form is exact iff this never fires.
    """
    sw, bw, z = cfg.slice_width, cfg.band_width, cfg.z_threshold
    goe, ge = cfg.gap_oe, cfg.gap_extend
    pql = -(-qlen // 8)
    prl = -(-rlen // 8)
    R8 = prl * 8
    tad = prl + pql - 1
    i_end = -(-tad // sw) * sw
    n_diags = qlen + rlen - 1

    t = np.asarray(t_codes[:R8], _I64)
    q = np.asarray(q_codes[: pql * 8], _I64)
    r_idx = np.arange(R8, dtype=_I64)
    pr = r_idx >> 3
    cs = np.maximum(0, 8 * pr - bw) // 8
    ce = np.minimum(pql - 1, (8 * pr + 7 + bw) // 8)
    fake = r_idx >= rlen
    prev_fake = np.zeros(R8, bool)
    prev_fake[1:] = fake[:-1]

    def hd_init(l):
        k = _trunc16(-(goe + ge * l))
        h = np.where(l <= bw, k, MINUS_INF2)
        f = np.where(l <= bw, _trunc16(k - goe), MINUS_INF2)
        return h, f

    h_st, f_st = hd_init(r_idx)
    h_st = h_st.astype(_I64)
    f_st = f_st.astype(_I64)

    n_ring = 8 * i_end + 8
    diag_max = np.full(n_ring, INT32_MIN, dtype=_I64)

    for j in range(qlen):
        C = computed_col(j, r_idx, pr, cs, ce, pql, prl, sw, bw, qlen)
        cst = cstart_col(j, pr, cs, sw)

        if collect_holes is not None and C.any():
            nz = np.flatnonzero(C)
            if nz[-1] - nz[0] + 1 != nz.size:
                collect_holes.append((j, C.copy()))

        top_h = _top_init(j - 1, cfg)[0]
        top_e = _top_init(j, cfg)[1]

        # diagonal-H input (strip truncations are identities: this
        # path requires the int16-safe regime, like colsweep)
        htl = np.empty(R8, _I64)
        htl[1:] = h_st[:-1]
        htl[0] = top_h
        htl = np.where(cst & prev_fake, MINUS_INF2, htl)

        qb = q[j]
        s = np.where(qb == t, cfg.match, -cfg.mismatch)
        s = np.where((qb == N_VALUE) | (t == N_VALUE), -N_PENALTY, s)
        temp = htl + s

        f_in = np.where(cst & fake, MINUS_INF2, f_st)

        # E: S-weighted prefix-max (exact under freezing, see module
        # docstring); S(r) = computed count above r
        S = np.zeros(R8, _I64)
        S[1:] = np.cumsum(C[:-1])
        gv = np.where(C, temp - goe + ge * (S + 1), _NEG)
        P = np.full(R8, _NEG, _I64)
        P[1:] = np.maximum.accumulate(gv[:-1])
        e_in = np.maximum(P, top_e) - ge * S

        h_new = np.maximum(np.maximum(temp, f_in), e_in)
        f_st = np.where(C, np.maximum(temp - goe, f_in - ge), f_in)
        h_st = np.where(C, h_new, h_st)

        packed = _i32((h_new << 16) + r_idx)
        packed = np.where(C, packed, INT32_MIN)
        d = r_idx + j
        np.maximum.at(diag_max, d, packed)

    islice0 = first_empty_slice(qlen, rlen, cfg)
    return diag_chain_banded_np(
        diag_max, i_end, n_diags, islice0, sw, z, ge
    )


def diag_chain_banded_np(diag_max, i_end, n_diags, islice0, sw, z, ge):
    """Per-diagonal best/Z-drop replay with the empty-slice cap.

    Matches sweep.py's slice loop + wrap-up: diagonals of the first
    empty slice (and beyond) are never swept — the job terminates at
    that slice's top without counting them — and the 8 wrap-up
    diagonals run unguarded only when no slice terminated early.
    Returns (score, q_end, t_end, diags_swept).
    """
    ms, mr, mq = 0, 0, 0
    diags = 0
    i_end8 = 8 * i_end
    cap = i_end8 + 8 if islice0 is None else 8 * islice0
    for d in range(min(i_end8 + 8, cap)):
        diags += 1
        gate = (d < i_end8 and d < n_diags) or (d >= i_end8)
        if not gate:
            continue
        dmax = int(diag_max[d])
        th = dmax >> 16
        tr = dmax & 0xFFFF
        if th > ms:
            ms, mr, mq = th, tr, d - tr
        elif tr >= mr and (d - tr) >= mq:
            gap = abs((tr - mr) - ((d - tr) - mq))
            if z >= 0 and ms - th > z + gap * ge:
                break
    return ms, mq, mr, diags
