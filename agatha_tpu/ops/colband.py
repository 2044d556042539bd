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


def colband_eligible(meta: np.ndarray, cfg: AlignConfig,
                     safe16: bool) -> bool:
    """True when the banded column-sweep kernel may serve a bucket.

    Unlike colsweep there is no band-coverage requirement — the
    slice/chunk/band clipping is implemented.  Requirements:

    * the int16-safe regime (``int16_safe``): the strip truncations the
      kernel omits are identities;
    * the sliding window fits the kernel's VMEM budget: scratch is
      ~4 planes of (RW, 128) int32 plus the unrolled group body's
      temporaries (measured ~12 MB at RW = 1536 under the 96 MB
      scoped-vmem limit) — RW <= 4096 keeps the total under ~45 MB
      and admits every BASELINE config including the ONT wide band
      (bw = 2001 -> RW = 4048).

    The plain-weight E form additionally needs every column's computed
    row set to be one contiguous interval; the length-derived clips
    can never break a column (ss's ``i - pql + 1`` term and se's
    ``prl - 1`` / ``i + sw - 1`` terms are vacuous for real columns —
    see tests/test_colband.py), so the property is a function of
    (band_width, slice_width) geometry alone and is verified by the
    hole-detector scans in tests/test_colband.py across the stress
    config classes.
    """
    if not safe16:
        return False
    bw = cfg.band_width
    LEAD = -(-(bw + 16) // 8) * 8
    RW = -(-(LEAD + bw + 16) // 8) * 8
    return RW <= 4096


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


# --- device implementation (Pallas sliding-window sweep, fused chain) ---

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from agatha_tpu.ops.colsweep import _shift_down  # noqa: E402

_I32j = jnp.int32
LN = 128
_NEG_BIG = -(1 << 28)


def _shift_up(x, s, fill, interpret):
    """rows[:-s] = x[s:], rows[-s:] = fill."""
    n = x.shape[0]
    if interpret:
        y = jnp.roll(x, n - s, axis=0)
    else:
        y = pltpu.roll(x, shift=n - s, axis=0)
    ri = jax.lax.broadcasted_iota(_I32j, x.shape, 0)
    return jnp.where(ri >= n - s, fill, y)


def _ctr16(t):
    return jnp.where(t >= 0, t >> 4, -((-t) >> 4))


def _w0_of(g, LEAD, WMAX):
    """Window origin for group g (traced or static)."""
    return jnp.clip(8 * g - LEAD, 0, WMAX)


def _vchain(seg, d0, scal, carry, z, ge, interpret):
    """Vectorized per-diagonal best/Z-drop chain over a (S, LN) ring
    segment holding diagonals [d0, d0+S).

    Exact replay of diag_chain_banded_np, vectorized across the 128
    pairs AND the S diagonals: the running (ms, mr, mq) state is a
    strictly-improving running argmax, so an inclusive first-wins
    prefix-argmax over the gated candidates (log2(S) shifted selects)
    yields every row's pre-state; term predicates are then elementwise
    and the first terminating row is selected by a prefix-or.  The
    carry folds in as a virtual element before row 0 (earliest, so it
    wins ties).  No serial scalar chain: ~70 ops on 2-tile planes per
    16 diagonals (measured ~free vs the column work,
    scripts/colband_probe.py).
    """
    S = seg.shape[0]
    i_end8, n_diags, end_p = scal
    ms0, mr0, mq0, term0, diags0 = carry

    ri = jax.lax.broadcasted_iota(_I32j, seg.shape, 0)
    d = ri + d0
    th = seg >> 16
    tr = seg & 0xFFFF
    dq = d - tr
    # the oracle's per-diagonal gate + the end cap (empty-slice /
    # wrap-up); d may be negative for the never-written lead-in rows
    # of the first consumed segment (harmless: tr=0, dq=d<0<=mq)
    gate = (((d < i_end8) & (d < n_diags)) | (d >= i_end8)) & (d < end_p)

    # inclusive first-wins prefix-argmax of (th | tr | dq) over gated rows
    bth = jnp.where(gate, th, _NEG_BIG)
    btr = tr
    bdq = dq
    s = 1
    while s < S:
        pth = _shift_down(bth, s, _NEG_BIG, interpret)
        ptr = _shift_down(btr, s, 0, interpret)
        pdq = _shift_down(bdq, s, 0, interpret)
        win = pth >= bth  # earlier wins ties
        bth = jnp.where(win, pth, bth)
        btr = jnp.where(win, ptr, btr)
        bdq = jnp.where(win, pdq, bdq)
        s *= 2
    win0 = ms0 >= bth  # carry is earliest of all
    bth = jnp.where(win0, ms0, bth)
    btr = jnp.where(win0, mr0, btr)
    bdq = jnp.where(win0, mq0, bdq)

    # exclusive pre-state per row
    pre_ms = _shift_down(bth, 1, 0, interpret)
    pre_mr = _shift_down(btr, 1, 0, interpret)
    pre_mq = _shift_down(bdq, 1, 0, interpret)
    r0 = ri == 0
    pre_ms = jnp.where(r0, ms0, pre_ms)
    pre_mr = jnp.where(r0, mr0, pre_mr)
    pre_mq = jnp.where(r0, mq0, pre_mq)

    # term candidates against the pre-state
    zel = gate & ~(th > pre_ms) & (tr >= pre_mr) & (dq >= pre_mq)
    gap = jnp.abs((tr - pre_mr) - (dq - pre_mq))
    tcand = (zel & (pre_ms - th > z + gap * ge)).astype(_I32j)
    tpre_inc = tcand
    s = 1
    while s < S:
        tpre_inc = jnp.maximum(
            tpre_inc, _shift_down(tpre_inc, s, 0, interpret)
        )
        s *= 2
    pre_term = _shift_down(tpre_inc, 1, 0, interpret)
    pre_term = jnp.where(r0, 0, pre_term) | term0  # term0 freezes all
    ft = (tcand > 0) & (pre_term == 0)  # first-term one-hot

    live = (pre_term == 0) & (d < end_p) & (d >= 0) & \
        ((tcand == 0) | ft)  # rows strictly before the first term + it
    # diags counts every live diagonal INCLUDING the terminating one
    diags = diags0 + jnp.sum(live.astype(_I32j), axis=0, keepdims=True)

    any_t = jnp.max(tpre_inc, axis=0, keepdims=True) | term0
    # state at the first term = its pre-state; if term0, the carry
    sel_ms = jnp.max(jnp.where(ft, pre_ms, _NEG_BIG), axis=0,
                     keepdims=True)
    sel_mr = jnp.max(jnp.where(ft, pre_mr, _NEG_BIG), axis=0,
                     keepdims=True)
    sel_mq = jnp.max(jnp.where(ft, pre_mq, _NEG_BIG), axis=0,
                     keepdims=True)
    has_ft = jnp.max(ft.astype(_I32j), axis=0, keepdims=True) > 0
    sel_ms = jnp.where(has_ft, sel_ms, ms0)
    sel_mr = jnp.where(has_ft, sel_mr, mr0)
    sel_mq = jnp.where(has_ft, sel_mq, mq0)

    last = S - 1
    ms = jnp.where(any_t > 0, sel_ms, bth[last:last + 1, :])
    mr = jnp.where(any_t > 0, sel_mr, btr[last:last + 1, :])
    mq = jnp.where(any_t > 0, sel_mq, bdq[last:last + 1, :])
    return ms, mr, mq, any_t, diags


def colband_shapes(meta, cfg: AlignConfig):
    """Static kernel extents + phase schedule for a bucket.

    Returns (RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX).
    Extents round to 256-row/col grid steps so bucket length jitter
    does not mint fresh compiles (rounded-out columns are colm-masked;
    rounded-out rows never pass the in_slice clip).

    Window margins (see the live-interval bounds in the module
    docstring tests): per column j of group g, computed rows satisfy
    8g - bw - 14 <= r <= 8g + bw + 14, so LEAD = round8(bw+16) keeps
    the window top above every live row and RW = round8(LEAD+bw+16)
    keeps the bottom below.  A Python simulation of the group loop
    asserts the ring/consumption invariants for the compiled shape.
    """
    bw, sw = cfg.band_width, cfg.slice_width
    meta = np.asarray(meta)
    qmax = int(meta[:, 0].max())
    rmax = int(meta[:, 1].max())
    Qpad = -(-max(qmax, 8) // 256) * 256
    R8pad = -(-max(rmax, 8) // 256) * 256
    LEAD = -(-(bw + 16) // 8) * 8
    RW = min(-(-(LEAD + bw + 16) // 8) * 8, R8pad)
    WMAX = R8pad - RW
    G = Qpad // 8
    # first rolling group / first bottom-pinned group
    gA = min(LEAD // 8 + 1, G)
    gB = min((WMAX + LEAD) // 8 + 1, G) if WMAX > 0 else gA
    gB = max(gB, gA)
    # bucket-max total diagonals incl. wrap-up (i_end8 + 8)
    pql = -(-qmax // 8)
    prl = -(-rmax // 8)
    i_end8_max = 8 * (-(-(pql + prl - 1) // sw) * sw)
    d0_last = int(np.clip(8 * (G - 1) - LEAD, 0, WMAX)) + 8 * (G - 1) - 8
    tail_steps = max(0, -(-(i_end8_max + 8 - d0_last) // 16))

    # invariant simulation of the kernel's consumption schedule:
    # group g consumes c(g) = 16 in the rolling phase else 8, from
    # d0(g-1) = w0(g-1) + 8(g-1) - 8 (g=0 consumes 8 never-written
    # lead-in rows with d < 0 — harmless by the chain's d>=0 guards);
    # writes land at ring rows rw + k + 8 and must stay inside RW+16.
    ring = RW + 16
    d0_prev = -16
    for g in range(G):
        w0 = min(max(8 * g - LEAD, 0), WMAX)
        d0 = w0 + 8 * g - 8
        c = 16 if gA <= g < gB else 8
        assert d0 - d0_prev == c, (g, d0 - d0_prev, c)
        # writes this group: ring rows [8, hi_w]
        hi_w = (RW - 1) + 7 + (w0 + 8 * g) - d0
        assert 8 <= hi_w < ring, (g, hi_w)
        d0_prev = d0
    assert d0_prev == d0_last
    assert d0_last + 16 * tail_steps >= i_end8_max + 8
    return RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX


def _make_colband_kernel(cfg: AlignConfig, RW, R8pad, Qpad, G, gA, gB,
                         tail_steps, LEAD, WMAX, interpret):
    """Banded column-sweep kernel: one 128-pair block per program.

    Structure (probed at ~44 GCUPS-equiv, scripts/colband_probe.py): a
    sliding RW-row window of H/F carries advances 8 rows per 8-column
    group through three statically-bounded phases (top-pinned /
    rolling / bottom-pinned); per column the 13-op DP core + an E
    prefix-max over the window rows; packed (H<<16)|r cell values skew
    into a VMEM diagonal ring whose finalized head feeds the fused
    vectorized Z-drop chain (_vchain) — no HBM intermediates at all.
    Target/query codes stream from HBM in 8-row strips prefetched one
    group ahead (~4 KB DMAs under ~20 us of column work).  Semantics:
    align_one_colband_np (bit-exact vs ops/sweep.py).
    """
    sw, bw, z = cfg.slice_width, cfg.band_width, cfg.z_threshold
    goe, ge = cfg.gap_oe, cfg.gap_extend
    match, mism = cfg.match, cfg.mismatch
    RING = RW + 16
    d0_last = min(max(8 * (G - 1) - LEAD, 0), WMAX) + 8 * (G - 1) - 8

    def kernel(smeta_ref, tmat_ref, qmat_ref, out_ref):
        gid = pl.program_id(0)
        qlen = smeta_ref[0:1, :]
        rlen = smeta_ref[1:2, :]
        scal = (smeta_ref[2:3, :], smeta_ref[3:4, :], smeta_ref[4:5, :])
        pql = (qlen + 7) >> 3
        prl = (rlen + 7) >> 3

        rw_i = jax.lax.broadcasted_iota(_I32j, (RW, LN), 0)
        ge_rw = ge * rw_i
        lane0 = gid * LN

        def run(hprev, fst, tmw, ring, tbuf, qbuf, sems):
            def dma_t(row):
                return pltpu.make_async_copy(
                    tmat_ref.at[pl.ds(pl.multiple_of(row, 8), 8),
                                pl.ds(pl.multiple_of(lane0, LN), LN)],
                    tbuf, sems.at[0],
                )

            def dma_q(row):
                return pltpu.make_async_copy(
                    qmat_ref.at[pl.ds(pl.multiple_of(row, 8), 8),
                                pl.ds(pl.multiple_of(lane0, LN), LN)],
                    qbuf, sems.at[1],
                )

            # initial fills: left-strip inits for the top window
            k0 = -(goe + ge_rw)
            hprev[:, :] = jnp.where(rw_i <= bw, k0, MINUS_INF2)
            fst[:, :] = jnp.where(rw_i <= bw, k0 - goe, MINUS_INF2)
            ring[:, :] = jnp.full((RING, LN), INT32_MIN, _I32j)
            cp0 = pltpu.make_async_copy(
                tmat_ref.at[pl.ds(pl.multiple_of(0, 8), RW),
                            pl.ds(pl.multiple_of(lane0, LN), LN)],
                tmw, sems.at[2],
            )
            cp0.start()
            dma_q(0).start()
            cp0.wait()
            # prime the rolling-phase target strip (group gA needs
            # rows [w0(gA)+RW-8, w0(gA)+RW) = [8*gA-LEAD+RW-8, ...))
            t_first = min(max(8 * gA - LEAD + RW - 8, 0), R8pad - 8)
            dma_t(jnp.int32(t_first)).start()

            def consume(carry, c, d0):
                seg = ring[0:c, :]
                carry = _vchain(seg, d0, scal, carry, z, ge, interpret)
                ring[:, :] = _shift_up(ring[:, :], c, INT32_MIN,
                                       interpret)
                return carry

            def group(g, carry, rolling):
                w0 = _w0_of(g, LEAD, WMAX)
                d0_prev = _w0_of(g - 1, LEAD, WMAX) + 8 * (g - 1) - 8
                carry = consume(carry, 16 if rolling else 8, d0_prev)

                if rolling:
                    hprev[:, :] = _shift_up(hprev[:, :], 8, MINUS_INF2,
                                            interpret)
                    fst[:, :] = _shift_up(fst[:, :], 8, MINUS_INF2,
                                          interpret)
                    dma_t(jnp.int32(0)).wait()
                    strip = tbuf[:, :]
                    tmw[:, :] = _shift_up(tmw[:, :], 8, 0, interpret)
                    tmw[pl.ds(RW - 8, 8), :] = strip
                    nxt = jnp.clip(w0 + 8 + RW - 8, 0, R8pad - 8)
                    dma_t(nxt).start()

                # query strip for this group (prefetched at g-1)
                dma_q(jnp.int32(0)).wait()
                qblk = qbuf[:, :]
                dma_q(jnp.clip(8 * g + 8, 0, Qpad - 8)).start()

                # --- per-group hoisted mask algebra (pj == g) -------
                r_abs = rw_i + w0
                pr = r_abs >> 3
                cs = jnp.maximum(0, (pr << 3) - bw) >> 3
                ce = jnp.minimum(pql - 1, ((pr << 3) + 7 + bw) >> 3)
                # (pr+g) // sw via multiply-shift: exact for
                # 0 <= x < 2^15 (values here < (R8pad+Qpad)/8);
                # Mosaic's signed `//` lowering measured ~8% of
                # the whole column wall (round-4 colband_ablate
                # `fastdiv` variant, since removed from the script)
                i_sl = (((pr + g) * ((1 << 16) // sw + 1))
                        >> 16) * sw
                ss = jnp.maximum(
                    jnp.maximum(0, i_sl - pql + 1),
                    _ctr16((i_sl << 3) + (8 - bw)),
                )
                se = jnp.minimum(
                    jnp.minimum(prl - 1, i_sl + (sw - 1)),
                    _ctr16((i_sl << 3) + (8 * (sw - 1) + 7 + bw)),
                )
                insl = (pr >= ss) & (pr <= se)
                xg = insl & (g >= cs) & (g <= ce)
                yg = insl & (g > cs) & (g < ce)
                cst = g == jnp.maximum(cs, i_sl - pr)
                cst_f = cst & (r_abs >= rlen)
                cst_pf = cst & (r_abs >= rlen + 1)
                tmat = tmw[:, :]
                t_is_n = tmat == N_VALUE
                sub_m = jnp.where(t_is_n, -N_PENALTY, match)
                sub_x = jnp.where(t_is_n, -N_PENALTY, -mism)

                hp = hprev[:, :]
                fi = fst[:, :]
                gacc = jnp.full((RW + 8, LN), INT32_MIN, _I32j)
                for k in range(8):
                    j = 8 * g + k
                    colm = qlen > j
                    band = (r_abs >= j - bw) & (r_abs <= j + bw)
                    C = (yg | (xg & band)) & colm

                    qb = qblk[k:k + 1, :]
                    s = jnp.where(qb == tmat, sub_m, sub_x)
                    s = jnp.where(qb == N_VALUE, -N_PENALTY, s)

                    # top-boundary scalars (branches only live when
                    # col <= bw: no int16 wrap in a selected value)
                    top_h = jnp.where(
                        j == 0, 0,
                        jnp.where(j - 1 <= bw, -(goe + ge * (j - 1)),
                                  MINUS_INF2),
                    )
                    top_e = jnp.where(j <= bw, -(goe + ge * j) - goe,
                                      MINUS_INF2)

                    # raw roll: the wrapped bottom row lands at
                    # rw 0, which the top-boundary where overwrites
                    htl = (jnp.roll(hp, 1, axis=0) if interpret
                           else pltpu.roll(hp, shift=1, axis=0))
                    htl = jnp.where(rw_i == 0, top_h, htl)
                    if k == 0:  # chunk starts live at j % 8 == 0 only
                        htl = jnp.where(cst_pf, MINUS_INF2, htl)
                    temp = htl + s

                    f_in = fi
                    if k == 0:
                        f_in = jnp.where(cst_f, MINUS_INF2, f_in)

                    # E: plain-weight prefix-max + root injected at the
                    # interval's rising edge (exact: computed column
                    # sets are single intervals — contract
                    # hole-detector + the 251k-column scan)
                    # gv at non-computed rows carries the root:
                    # max_k (root + ge*k) - ge*(r-1) over k < r is
                    # attained at the last not-computed row above the
                    # live interval = root decayed once per computed
                    # row passed — exactly the frozen-passthrough
                    # semantics, with no rising-edge locator ops
                    # (the redge block measured 18% of the column
                    # wall — round-4 colband_ablate `no_redge`
                    # variant, since removed from the script)
                    gv = ge_rw + jnp.where(C, temp - goe, top_e)
                    p = _shift_down(gv, 1, top_e - ge, interpret)
                    sft = 1
                    while sft < RW:
                        p = jnp.maximum(
                            p, _shift_down(p, sft, _NEG_BIG, interpret)
                        )
                        sft *= 2
                    e_in = p - (ge_rw - ge)

                    h_new = jnp.maximum(jnp.maximum(temp, f_in), e_in)
                    # gv - ge_rw == temp - goe at computed rows, and
                    # f_new is only committed where C
                    f_new = jnp.maximum(gv - ge_rw, f_in - ge)
                    fi = jnp.where(C, f_new, f_in)
                    hp = jnp.where(C, h_new, hp)

                    packed = (h_new << 16) + r_abs
                    packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
                    pe = jnp.concatenate(
                        [packed, jnp.full((8, LN), INT32_MIN, _I32j)],
                        axis=0,
                    )
                    if k:
                        # raw roll: the 8-row INT32_MIN pad absorbs
                        # the wrap for k <= 7 (no fill op needed)
                        pe = (jnp.roll(pe, k, axis=0) if interpret
                              else pltpu.roll(pe, shift=k, axis=0))
                    gacc = jnp.maximum(gacc, pe)
                hprev[:, :] = hp
                fst[:, :] = fi
                seg = pl.ds(pl.multiple_of(8, 8), RW + 8)
                ring[seg, :] = jnp.maximum(ring[seg, :], gacc)
                return carry

            z0 = jnp.zeros((1, LN), _I32j)
            carry = (z0, z0, z0, z0, z0)
            if gA > 0:
                carry = jax.lax.fori_loop(
                    0, gA, lambda g, c: group(g, c, False), carry
                )
            if gB > gA:
                carry = jax.lax.fori_loop(
                    gA, gB, lambda g, c: group(g, c, True), carry
                )
            if G > gB:
                carry = jax.lax.fori_loop(
                    gB, G, lambda g, c: group(g, c, False), carry
                )

            def tail(t, carry):
                return consume(carry, 16, d0_last + 16 * t)

            carry = jax.lax.fori_loop(0, tail_steps, tail, carry)
            ms, mr, mq, _term, diags = carry
            out_ref[0:1, :] = ms
            out_ref[1:2, :] = mq
            out_ref[2:3, :] = mr
            out_ref[3:4, :] = diags
            # retire the in-flight prefetches
            dma_t(jnp.int32(0)).wait()
            dma_q(jnp.int32(0)).wait()

        pl.run_scoped(
            run,
            hprev=pltpu.VMEM((RW, LN), _I32j),
            fst=pltpu.VMEM((RW, LN), _I32j),
            tmw=pltpu.VMEM((RW, LN), _I32j),
            ring=pltpu.VMEM((RING, LN), _I32j),
            tbuf=pltpu.VMEM((8, LN), _I32j),
            qbuf=pltpu.VMEM((8, LN), _I32j),
            sems=pltpu.SemaphoreType.DMA((3,)),
        )

    return kernel


def chain_scalars(meta: np.ndarray, cfg: AlignConfig) -> np.ndarray:
    """(8, GB) per-pair chain gates: qlen, rlen, i_end8, n_diags,
    end_p (= i_end8+8 capped at the first empty slice x 8).

    The empty-slice scan vectorizes across pairs: slice i is empty for
    a pair iff ss(i) > se(i) (slice_bounds_np), and the cap is the
    first such i (agatha_kernel.h:189).
    """
    sw, bw = cfg.slice_width, cfg.band_width
    meta = np.asarray(meta, _I64)
    qlen = meta[:, 0]
    rlen = meta[:, 1]
    pql = -(-qlen // 8)
    prl = -(-rlen // 8)
    tad = pql + prl - 1
    i_end = -(-tad // sw) * sw
    i_end8 = 8 * i_end
    n_diags = qlen + rlen - 1
    end_p = i_end8 + 8
    gb = meta.shape[0]
    i_max = int(i_end.max()) if gb else 0
    if i_max:
        # vectorized first-empty-slice scan: (S, GB) slice grid in one
        # pass (the per-slice Python loop measured 24-65 ms of host
        # time PER BUCKET at 15 kb — it serialized every colband
        # dispatch, round-5 plumbing decomposition)
        isl = np.arange(0, i_max, sw, dtype=_I64)[:, None]
        ss, se = slice_bounds_np(isl, pql[None, :], prl[None, :],
                                 sw, bw)
        empty = (isl < i_end[None, :]) & (ss > se)
        any_e = empty.any(axis=0)
        first = empty.argmax(axis=0)
        end_p = np.where(any_e, 8 * isl[first, 0], end_p)
    out = np.zeros((8, gb), np.int32)
    out[0] = qlen
    out[1] = rlen
    out[2] = i_end8
    out[3] = n_diags
    out[4] = end_p
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "shapes", "interpret"),
)
def _colband_jit(smeta, tcodes, qfwd, *, cfg, shapes, interpret):
    """Jitted banded column sweep for one bucket chunk.

    smeta (8, GB) int32 (GB a multiple of 128); tcodes/qfwd in the
    bucket wire format ((GB, X/2) uint8 nibbles or (GB, X) int8).
    Returns (GB, 4) int32 [score, q_end, t_end, diags] — the
    align_bucket result contract.
    """
    from agatha_tpu.ops.kernel import _unpack_nibbles

    RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX = shapes
    GB = smeta.shape[1]
    t = (_unpack_nibbles(tcodes) if tcodes.dtype == jnp.uint8
         else tcodes.astype(_I32j))
    q = (_unpack_nibbles(qfwd) if qfwd.dtype == jnp.uint8
         else qfwd.astype(_I32j))

    def padt(x, n):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1]))) \
            if x.shape[1] < n else x[:, :n]

    tmat = padt(t, R8pad).T
    qmat = padt(q, Qpad).T

    out = pl.pallas_call(
        _make_colband_kernel(cfg, RW, R8pad, Qpad, G, gA, gB,
                             tail_steps, LEAD, WMAX, interpret),
        grid=(GB // LN,),
        in_specs=[
            pl.BlockSpec((8, LN), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((4, LN), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, GB), _I32j),
        # the 8-column unrolled group body holds ~12 MB of (RW, 128)
        # temporaries beyond the 3.2 MB of scratch; the default 16 MB
        # scoped-vmem budget is too tight (v5e has 128 MB of VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(smeta, tmat, qmat)
    return out.T


def align_bucket_colband(meta, tcodes, qfwd, cfg: AlignConfig,
                         interpret: bool = False, device=None):
    """Banded column-sweep bucket alignment (align_bucket contract).

    Caller must have checked the int16-safe gate (`colband_ok`); the
    band geometry itself needs no eligibility — the slice/chunk/band
    clipping is implemented, not assumed vacuous.  Pads the bucket to
    a 128-lane multiple; ``device`` pins the dispatch to one local
    chip (the engine round-robins whole buckets, as for colsweep).
    """
    meta = np.asarray(meta)
    gb = meta.shape[0]
    shapes = colband_shapes(meta, cfg)

    sm = chain_scalars(meta, cfg)
    tc, qc = tcodes, qfwd
    pad = (-gb) % LN
    if pad:
        sm = np.concatenate(
            [sm, np.tile(sm[:, :1] * 0 + 1, (1, pad))], axis=1)
        # padding pairs: qlen=rlen=1 (row 0/1); keep their chain gates
        # consistent (i_end8, n_diags, end_p for a 1x1 pair)
        one = chain_scalars(np.ones((1, 2), np.int32), cfg)
        sm[:, gb:] = one
        tc = np.concatenate(
            [tc, np.zeros((pad, tc.shape[1]), tc.dtype)], axis=0)
        qc = np.concatenate(
            [qc, np.zeros((pad, qc.shape[1]), qc.dtype)], axis=0)
    if device is not None:
        import jax as _jax

        def put(a):
            return _jax.device_put(a, device)
    else:
        put = jnp.asarray
    out = _colband_jit(
        put(np.ascontiguousarray(sm)), put(np.asarray(tc)),
        put(np.asarray(qc)), cfg=cfg, shapes=shapes,
        interpret=interpret,
    )
    return out[:gb] if pad else out
