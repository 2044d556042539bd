"""Column-sweep (inter-sequence) formulation for short-read buckets.

The production antidiagonal kernel (ops/kernel.py) maps target rows to
the 128 lanes and 8 pairs to sublanes; at short-read widths it is
bound by the serial per-substep roll chain amortized over only 8 pairs
(PERF_NOTES round 3: ~167 k reads/s at 150 bp, flat in every tuning
axis).  This module maps the SAME semantics the other way around —
**pairs on the 128 lanes, target rows on sublanes** — and sweeps one
query column at a time, which amortizes every shift over 128 pairs
instead of 8 and removes the per-diagonal serial chain entirely:

* the vertical gap state E within a column is a weighted prefix-max
  over rows (E(r) = max_{k<r} temp(k) - gap_oe - (r-1-k)*gap_extend,
  folded with the top-boundary term), computable in log2(R) shifted
  maxes — no serial down-column dependency;
* the horizontal gap state F and the frozen-H diagonal input are
  elementwise column-to-column carries;
* per-antidiagonal maxima are NOT tracked during the sweep: the packed
  (H<<16)|r cell values are emitted per column, and a separate pass
  recovers diagonal maxima (diagonal d = row r + column j) and runs
  the reference's exact per-diagonal best/Z-drop chain over them in
  diagonal order.  Z-drop termination only truncates *work* after the
  decision point (the masked-continuation argument of the main
  kernel), so sweeping all columns and replaying the decision chain
  afterwards is bit-exact — including terminations triggered by
  fake-row pollution on wrap-up diagonals.

Eligibility (bucket-level, `colsweep_eligible`): the reformulation
drops the slice/chunk/band clipping and the int16 strip round-trips,
which is exact iff they are vacuous for every pair of the bucket:

* `int16_safe` (ops/kernel.py) — every strip16 is an identity;
* band_width >= 8*tad + 8 for the largest pair (tad = packed-diagonal
  count prl+pql-1): then every `ctrunc16(8i+8-bw)` slice bound is
  <= 0, chunk bounds cover [0, pql), and |q-r| <= bw for every cell —
  `computed_mask(d)` collapses to `0 <= d-r < qlen`
  (see ops/sweep.py).  At the canonical band 751 this admits pairs up
  to ~370 bp combined-length ~744 — the reference's 150 bp regime.

What is NOT dropped: the chunk-reload resets of fake rows (rows in
[rlen, 8*ceil(rlen/8))) — their F / diagonal-H inputs reload
MINUS_INF2 at chunk-start cells (sweep.py `cstart & fake`), and their
computed values pollute per-diagonal maxima exactly as in the
reference (agatha_kernel.h:206-216).

Reference cites: semantics agatha_kernel.h:20-47 (CORE_COMPUTE),
126-148 (strip inits), 291-356 (Z-drop schedule + wrap-up); this
module reproduces ops/sweep.py (the vectorized oracle) restricted to
the eligible regime, reordered column-major.
"""

from __future__ import annotations

import numpy as np

from agatha_tpu.config import AlignConfig
from agatha_tpu.constants import INT32_MIN, MINUS_INF2, N_PENALTY, N_VALUE

_I64 = np.int64


def _trunc16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _i32(x):
    return ((x + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def colsweep_eligible(meta: np.ndarray, cfg: AlignConfig,
                      safe16: bool) -> bool:
    """True when the column-sweep reformulation is exact for a bucket.

    meta is the (GB, 2) [qlen, rlen] array (padding rows qlen=rlen=1
    are harmless).  See the module docstring for the derivation.
    """
    if not safe16:
        return False
    qlen = np.asarray(meta[:, 0], _I64)
    rlen = np.asarray(meta[:, 1], _I64)
    tad = -(-qlen // 8) + -(-rlen // 8) - 1
    return bool((8 * tad.max() + 8 <= cfg.band_width).all())


def _top_init(col, cfg):
    """(H, E) top-boundary values for column `col` (col may be < 0)."""
    goe, ge, bw = cfg.gap_oe, cfg.gap_extend, cfg.band_width
    k = _trunc16(-(goe + ge * col))
    h = 0 if col < 0 else (int(k) if col <= bw else MINUS_INF2)
    e = int(_trunc16(k - goe)) if col <= bw else MINUS_INF2
    return h, e


def _cstart_col(j: int, pr: np.ndarray, sw: int) -> np.ndarray:
    """Chunk-start mask for column j over row-blocks pr (cs == 0)."""
    if j % 8 != 0:
        return np.zeros(pr.shape, bool)
    pj = j // 8
    i = ((pr + pj) // sw) * sw
    return pj == np.maximum(0, i - pr)


def align_one_colsweep_np(q_codes, t_codes, qlen, rlen,
                          cfg: AlignConfig):
    """NumPy column-sweep of one pair; must match align_one_sweep on
    eligible inputs.  This is the semantic contract for the Pallas
    kernel; it is deliberately structured like the kernel (column
    loop + diagonal-chain replay), not like the oracle."""
    sw, bw, z = cfg.slice_width, cfg.band_width, cfg.z_threshold
    goe, ge = cfg.gap_oe, cfg.gap_extend
    pql = -(-qlen // 8)
    prl = -(-rlen // 8)
    R8 = prl * 8
    tad = prl + pql - 1
    i_end = -(-tad // sw) * sw
    n_diags = qlen + rlen - 1
    assert 8 * tad + 8 <= bw, "pair not colsweep-eligible"

    t = np.asarray(t_codes[:R8], _I64)
    q = np.asarray(q_codes[: pql * 8], _I64)
    r_idx = np.arange(R8, dtype=_I64)
    pr = r_idx >> 3
    fake = r_idx >= rlen
    prev_fake = np.zeros(R8, bool)
    prev_fake[1:] = fake[:-1]

    def hd_init(l):
        k = _trunc16(-(goe + ge * l))
        h = np.where(l <= bw, k, MINUS_INF2)
        f = np.where(l <= bw, _trunc16(k - goe), MINUS_INF2)
        return h, f

    h_prev, f_st = hd_init(r_idx)        # left-strip inits
    h_prev = h_prev.astype(_I64)
    f_st = f_st.astype(_I64)

    # packed per-diagonal maxima, diagonals 0 .. 8*i_end+7
    n_ring = 8 * i_end + 8
    diag_max = np.full(n_ring, INT32_MIN, dtype=_I64)

    for j in range(qlen):
        top_h, top_e = _top_init(j - 1, cfg)[0], _top_init(j, cfg)[1]
        cst = _cstart_col(j, pr, sw)

        htl = np.empty(R8, _I64)
        htl[1:] = h_prev[:-1]
        htl[0] = top_h
        htl = np.where(cst & prev_fake, MINUS_INF2, htl)

        qb = q[j]
        s = np.where(qb == t, cfg.match, -cfg.mismatch)
        s = np.where((qb == N_VALUE) | (t == N_VALUE), -N_PENALTY, s)
        temp = htl + s

        f_in = np.where(cst & fake, MINUS_INF2, f_st)

        # E prefix down the column: e_in(r) = max(top_e - r*ge,
        # max_{k<r} temp(k) - goe - (r-1-k)*ge)
        e_in = np.empty(R8, _I64)
        e_in[0] = top_e
        for r in range(1, R8):  # NumPy reference: serial; kernel scans
            e_in[r] = max(temp[r - 1] - goe, e_in[r - 1] - ge)

        h_new = np.maximum(np.maximum(temp, f_in), e_in)
        f_st = np.maximum(temp - goe, f_in - ge)
        h_prev = h_new

        packed = _i32((h_new << 16) + r_idx)
        d = r_idx + j
        np.maximum.at(diag_max, d, packed)

    # --- exact per-diagonal best / Z-drop chain replay -----------------
    return _diag_chain_np(diag_max, i_end, n_diags, sw, z, ge)


def _diag_chain_np(diag_max, i_end, n_diags, sw, z, ge):
    """Replay the reference's per-diagonal schedule over diagonal
    maxima (sweep.py check_diag + the slice / wrap-up schedule).
    Returns (score, q_end, t_end, diags_swept)."""
    ms, mr, mq = 0, 0, 0
    diags = 0
    term = False
    i_end8 = 8 * i_end
    for d in range(i_end8 + 8):
        if term:
            break
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
                term = True
    return ms, mq, mr, diags
