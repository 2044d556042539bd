"""Pallas TPU kernel: batched AGAThA guided-alignment wavefront.

TPU-native execution scheme (replaces the reference's CUDA subwarp /
shared-memory design, AGAThA/src/kernels/agatha_kernel.h:49-431):

* One program instance aligns ``B_PAIRS`` pairs at once: pairs sit in the
  sublane dimension, reference rows in the lane dimension, so every VPU
  op advances B_PAIRS * W DP cells of state.
* The DP is swept along *base* antidiagonals — the only axis on which
  all in-flight cells are independent (the reference's intra-block
  column/row chains serialize E/H instead).  One ``while_loop``
  iteration processes a full packed antidiagonal (8 base diagonals,
  statically unrolled) so slice/chunk clipping bounds, chunk masks and
  the query feed are hoisted and computed once per 8 steps.
* All O(band) state (H at d-1, H at d-2, E, F, query window) lives in
  (B_PAIRS, W) int32 VMEM scratch; the reference keeps its strips in
  GPU global memory (ctors.cpp:89).  Sequences stay in HBM and windows
  are staged by double-buffered DMA, so VMEM use is independent of
  read length.
* Z-drop / empty-slice termination is tracked per pair as a mask; the
  loop exits when every pair in the program has terminated or finished
  (replaces CUDA subwarp rejoining, agatha_kernel.h:365-408, with
  host-side length bucketing + early loop exit).
* Scoring params are compile-time constants (the reference uploads them
  to __constant__ memory, gasal_align.cu:295-309).
* ``safe16`` fast path: when config+shape bounds prove every live DP
  value stays inside int16 (see `int16_safe`), the int16 strip
  truncations are identities and are compiled out.

Bit-exactness contract: this kernel reproduces `ops.sweep.align_one_sweep`
(itself cross-validated against `ops.reference_sim`) exactly, including
int16 strip truncation, chunk/slice clipping, the packed (H<<16)|r
tie-break and the per-diagonal Z-drop schedule.  See sweep.py's module
docstring for the equivalence argument against the CUDA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agatha_tpu.config import AlignConfig
from agatha_tpu.constants import INT32_MIN, MINUS_INF2, N_PENALTY, N_VALUE

# Pairs per program instance == int32 sublane tile height (default;
# narrow buckets use more — see b_pairs_for_width).
B_PAIRS = 8
# Lane tile width; W must be a multiple of this.
LANE = 128


def _bp_for(w: int, windowed: bool, gb: int) -> int:
    """Largest program height that divides gb (gb must be 8-aligned).

    Callers may pass any GB that is a multiple of 8 (the documented
    align_bucket contract) or a sharded slice of a bucket; the width-
    preferred height from b_pairs_for_width is lowered in steps of 8
    until it divides, so the contract never tightens.
    """
    assert gb % 8 == 0, gb
    if gb == 0:
        # empty bucket: any positive height gives the empty grid (0,)
        return b_pairs_for_width(w, windowed)
    bp = min(b_pairs_for_width(w, windowed), gb)
    while gb % bp:
        bp -= 8
    return bp


def b_pairs_for_width(w: int, windowed: bool = False) -> int:
    """Pairs per program for a bucket of lane width w.

    At large W the kernel is vector-throughput-bound and per-pair cost
    is flat in B (measured: B=16/32 at W=1152 gain nothing), but at
    short-read widths (128-512 lanes) the per-substep FIXED costs
    (rolls, cross-lane max, scalar bookkeeping) dominate — measured
    ~660 ns/substep at W=128 vs ~215 at W=1024 — so packing more pairs
    into the sublane dimension amortizes them.  Cap the program's lane
    area at 64 tiles (B*w <= 8192 lanes) PER WAVE: the
    n_waves_for_width default (<= 4 at the widths where this cap
    binds) keeps total program scratch at <= 4x this budget — ~1.7 MB
    worst case, well inside VMEM; callers forcing larger explicit
    n_waves own the VMEM math.
    """
    if windowed:
        return B_PAIRS
    return max(8, min(64, (8192 // w // 8) * 8))

_I32 = jnp.int32


def _trunc16(x):
    """int16 wraparound of int32 lanes (short2 strip storage, gasal.h:147)."""
    return (x << 16) >> 16


def _ctrunc16(t):
    """C-style truncation of t/16 (slice clipping, agatha_kernel.h:184)."""
    return jnp.where(t >= 0, t >> 4, -((-t) >> 4))


def _roll1(x, *, interpret: bool):
    """out[:, l] = x[:, l-1] (circular); lane 0 is overwritten by callers."""
    if interpret:
        return jnp.roll(x, 1, axis=1)
    return pltpu.roll(x, shift=1, axis=1)


def int16_safe(cfg: AlignConfig, max_len: int) -> bool:
    """True when no live DP value can leave int16 range.

    Then the reference's int16 strip round-trips are identities and the
    kernel may skip them.  Bounds (conservative):
      * positive: best score <= match * max_len, plus the (H<<16)|r
        packing already requires H < 2^15;
      * negative: live cells sit within z + band*ge of the running best
        (Z-drop fires at the next slice check otherwise), plus boundary
        strip inits (-(goe+ge*band) floored at MINUS_INF2) and at most
        one slice of further decay before the check runs.
    Requires Z-drop enabled; with z < 0 scores decay without bound and
    the reference's int16 wraparound is observable.
    """
    if cfg.z_threshold < 0:
        return False
    if cfg.match * max_len >= 32000:
        return False
    decay = (
        16384
        + cfg.z_threshold
        + (2 * cfg.band_width + 64) * cfg.gap_extend
        + 8 * cfg.slice_width * (cfg.mismatch + cfg.gap_oe + cfg.gap_extend)
        + 1024
    )
    return decay < 32768


# The window advances by SHIFT_Q rows per shift; a shift opportunity
# occurs every INNER_ITERS packed diagonals (demand rate is 4 rows per
# packed diagonal, so opportunities outpace demand 4x).
SHIFT_Q = LANE
INNER_ITERS = 8
# Rows outside the plain band that can still host computed cells
# (chunk-interior band exemption + slice-clip slop, agatha_kernel.h:
# 183-186, 224-225: up to ~(8*(sw-1)+7+bw)/16*8-edge effects, < 24
# rows for sw <= 3) and the shift-policy guard (>= SLOP so a shift
# never overruns the lowest needed row).
SLOP = 24
GUARD = 32


def window_width(cfg: AlignConfig) -> int:
    """Lane width of the sliding-window kernel for this config.

    Margin budget on top of the band width bw, per half (INNER_ITERS
    packed diagonals chosen against one window):
      * worst vbase at half start: the shift policy keeps
        vbase > (d8-bw)/2 - GUARD - SHIFT_Q (else it would have
        shifted), and never above (d8-bw)/2 - GUARD;
      * top row needed by half end (d8 grown by 8*INNER_ITERS):
        (d8 + 8*INNER_ITERS + 7 + bw)/2 + SLOP;
      * so W >= bw + 4*INNER_ITERS + 4 + SLOP + GUARD + SHIFT_Q
        = bw + 220 for the current constants;
      * post-shift qwin healing: the shl leaves SHIFT_Q stale lanes
        at the top of qwin that shift up one lane per substep; no
        computed cell may read one before it falls off.  Worst case
        (vbase_post >= (d8-bw)/2 - GUARD - 32, elapsed e = 0):
        stale-start row vbase_post + W - SHIFT_Q must exceed the
        computed top (d8+7+bw)/2 + SLOP, i.e.
        W > bw + SLOP + GUARD + SHIFT_Q + 36, i.e. STRICTLY more than
        bw + 220 — hence the need+1 below: when bw + 220 is an exact
        multiple of 128 (bw = 804, 932, ...) plain rounding would add
        zero slack and a computed cell could read a stale post-shift
        qwin lane.
    Rounded up to the lane tile: 1024 lanes for the canonical bw=751
    (was 1152 with the round-1 margins — an 11% cut in per-substep
    vector work at identical cell output).
    """
    need = cfg.band_width + 4 * INNER_ITERS + 4 + SLOP + GUARD + SHIFT_Q
    return -(-(need + 1) // LANE) * LANE


def _make_kernel(cfg: AlignConfig, W: int, safe16: bool, interpret: bool,
                 windowed: bool = False, wt: int | None = None,
                 b_pairs: int = B_PAIRS, noband: bool = False,
                 emit_flags: bool = False, n_waves: int = 1):
    # W: lane width of the state window; wt: full tcodes width (== W
    # unless windowed).
    #
    # n_waves > 1 runs that many INDEPENDENT pair-blocks ("waves")
    # inside one program, their substeps interleaved in program order:
    # narrow-width programs are bound by the ~60-70 ns exposed latency
    # of the chained per-substep rolls (PERF_NOTES round 3), and wave
    # w's substep k has no data dependence on wave w-1's substep k, so
    # the issue slots stalled behind one wave's rolls fill with the
    # other waves' ALU work.  Each wave is the identical single-wave
    # kernel instantiated over disjoint VMEM scratch and its own B
    # metadata rows — a pure program-order transform; results are
    # bit-identical to n_waves independent programs.  The windowed
    # variant is wave-capable too (the shift DECISION is pure in d8 so
    # it is shared; only the state shifts replicate), as is emit_flags
    # (each wave stages and DMAs its own flag planes to its own bitmap
    # row range, so the walk kernel sees an identical bitmap).
    wt = W if wt is None else wt
    sw, bw, z = cfg.slice_width, cfg.band_width, cfg.z_threshold
    goe, ge = cfg.gap_oe, cfg.gap_extend
    match, mism = cfg.match, cfg.mismatch
    B = b_pairs
    NW = n_waves
    NB = NW * B
    P8 = 8 * sw

    if safe16:
        def strip16(x):
            return x
    else:
        strip16 = _trunc16

    def top_h(col: int | jax.Array):
        # top-boundary H for column `col` (agatha_kernel.h:126-148);
        # col == -1 is the origin corner (topleft[0] == 0).
        k = _trunc16(-(goe + ge * col))
        v = jnp.where(col <= bw, k, MINUS_INF2)
        return jnp.where(col < 0, 0, v)

    def top_e(col):
        k = _trunc16(-(goe + ge * col))
        return jnp.where(col <= bw, _trunc16(k - goe), MINUS_INF2)

    def kernel(meta_ref, tcodes_ref, qfwd_ref, out_ref, *maybe_flags):
        # emit_flags variant: maybe_flags = (flags_ref,), an HBM
        # (GB, D8, W) int32 bitmap of per-cell traceback nibbles — 8
        # substeps (one packed diagonal) share one int32 plane, 4 bits
        # per substep, so packing needs no cross-lane work.  The nibble
        # convention is source-side (see ops/walk.py): bits 0-1 H source
        # (0 diag / 1 E / 2 F) at THIS cell, bit 2 "E(r+1,c) opened from
        # temp(r,c)", bit 3 "F(r,c+1) opened from temp(r,c)".
        flags_ref = maybe_flags[0] if emit_flags else None
        # per-wave [staging VMEM refs, DMA sems] (set in run): each
        # wave stages its own 8 planes and DMAs them to its own row
        # range of the bitmap, so waves never share a staging buffer
        acc_ref = [[None] * NW, [None] * NW]
        # tcodes_ref/qfwd_ref are FULL (GB, ...) refs left in HBM/ANY:
        # slicing big VMEM refs costs proportionally to their total
        # width on this hardware, so sequence windows are DMA'd into
        # fixed-size VMEM scratch instead (also makes VMEM use
        # independent of sequence length).
        # Per-wave pair metadata: wave i owns block rows [i*B, (i+1)*B).
        rowb = [
            pl.multiple_of(pl.program_id(0) * NB + i * B, B)
            for i in range(NW)
        ]
        if NW == 1:
            qlen = [meta_ref[:, 0:1]]
            rlen = [meta_ref[:, 1:2]]
        else:
            qlen = [meta_ref[i * B:(i + 1) * B, 0:1] for i in range(NW)]
            rlen = [meta_ref[i * B:(i + 1) * B, 1:2] for i in range(NW)]
        pql = [(q + 7) >> 3 for q in qlen]
        prl = [(t + 7) >> 3 for t in rlen]
        n_diags = [q + t - 1 for q, t in zip(qlen, rlen)]
        tad = [p + q - 1 for p, q in zip(prl, pql)]
        i_end = [((t + (sw - 1)) // sw) * sw for t in tad]
        i_end8 = [ie << 3 for ie in i_end]
        end_p = [ie8 + 8 for ie8 in i_end8]

        def slice_bounds(i, pql_w, prl_w):
            # banded slice clipping (agatha_kernel.h:183-186)
            ss = jnp.maximum(
                jnp.maximum(0, i - pql_w + 1),
                _ctrunc16((i << 3) + (8 - bw)),
            )
            se = jnp.minimum(
                jnp.minimum(prl_w - 1, i + (sw - 1)),
                _ctrunc16((i << 3) + (8 * (sw - 1) + 7 + bw)),
            )
            return ss, se

        # --- per-lane invariants ---
        lane = jax.lax.broadcasted_iota(_I32, (B, W), 1)
        lane0 = lane == 0

        # (Historical Mosaic gotcha, kept for future editors: (B, W)
        # while-loop carries whose init is sublane-replicated hit an
        # invalid-relayout error; state now lives in scratch refs, which
        # sidesteps carry layout unification entirely.)
        def boundary_init(r):
            """Left-strip inits for rows r (agatha_kernel.h:126-148)."""
            kb = _trunc16(-(goe + ge * r))
            in_b0 = r <= bw
            h0 = jnp.where(in_b0, kb, jnp.int32(MINUS_INF2))
            f0 = jnp.where(in_b0, _trunc16(kb - goe), jnp.int32(MINUS_INF2))
            return h0, f0

        zeros = jnp.zeros((B, 1), _I32)
        minus_inf2 = jnp.int32(MINUS_INF2)
        qf_len = qfwd_ref.shape[1]
        assert qf_len >= 3 * LANE, "qfwd must be padded to >= 384 lanes"

        def cond(carry):
            d8 = carry[0]
            bks = carry[4]
            # term is an int32 0/1 mask: Mosaic cannot carry i1 vectors
            # through scf.while.
            alive = jnp.any((bks[0][3] == 0) & (d8 < end_p[0]))
            for i in range(1, NW):
                alive |= jnp.any((bks[i][3] == 0) & (d8 < end_p[i]))
            return alive

        # State lives in VMEM scratch refs, not loop carries.  Each
        # outer half runs INNER_ITERS packed diagonals against one set
        # of double-buffered sequence windows while the OTHER set is
        # DMA'd for the next half (the shift decision is pure in
        # (d8, vbase), so the next window is known ahead of time); a
        # while-loop iteration runs two halves so buffer roles stay
        # static.  The at-most-one window shift per half is a branchless
        # masked blend (~25 vector ops amortized over 128 substeps).
        # hfa/hfb hold H(d-1)/H(d-2) in alternating roles per substep
        # (even substep counts keep the assignment static).
        def next_window(d8, vbase):
            """(vbase', blk0') for the half starting at diagonal d8."""
            if windowed:
                want = ((((d8 - bw) >> 1) - GUARD) - vbase
                        >= SHIFT_Q) & (vbase + SHIFT_Q <= wt - W)
                vbase = vbase + jnp.where(want, SHIFT_Q, 0)
            qoff0 = d8 - vbase
            blk0 = jnp.clip(qoff0 - (qoff0 & 127), 0, qf_len - 3 * LANE)
            return vbase, blk0

        def flag_dma(d8, i=0):
            # wave i's 8 staged planes -> HBM plane rows [d8/8, d8/8+8)
            # of that wave's pair rows
            if not emit_flags:
                return None
            return pltpu.make_async_copy(
                acc_ref[0][i],
                flags_ref.at[
                    pl.ds(rowb[i], B),
                    pl.ds(pl.multiple_of((d8 >> 3) * W, LANE),
                          INNER_ITERS * W),
                ],
                acc_ref[1][i].at[0],
            )

        def make_dmas(vbase, blk0, tbw, qfw, sems, rowb_w):
            tb_base = vbase if windowed else 0
            cp_t = pltpu.make_async_copy(
                tcodes_ref.at[
                    pl.ds(rowb_w, B),
                    pl.ds(pl.multiple_of(tb_base, LANE), W),
                ],
                tbw,
                sems.at[0],
            )
            cp_q = pltpu.make_async_copy(
                qfwd_ref.at[
                    pl.ds(rowb_w, B),
                    pl.ds(pl.multiple_of(blk0, LANE), 3 * LANE),
                ],
                qfw,
                sems.at[1],
            )
            return cp_t, cp_q

        def half(carry, refs, use_bufs, pre_bufs):
            d8, vbase_prev, i1, kph, bks = carry
            waves_refs, acc_w, sem_f = refs

            # this half's window (recomputes the prefetch decision)
            vbase, blk0 = next_window(d8, vbase_prev)
            cps = [
                make_dmas(vbase, blk0, *use_bufs[i], rowb[i])
                for i in range(NW)
            ]
            for cp_t, cp_q in cps:
                cp_t.wait()
                cp_q.wait()
            if emit_flags:
                # previous half's flag-plane DMAs (or the primers) must
                # complete before this half overwrites the staging bufs
                for i in range(NW):
                    flag_dma(d8, i).wait()

            if windowed:
                # --- window shift: rows [vbase_prev, vbase) can never
                # compute again (cells at diag d need rows >=
                # (d-bw)/2 - SLOP and vbase trails by >= GUARD).  Incoming
                # rows are ahead of the wavefront: H/F take their
                # boundary inits (stationary until computed), the
                # flowing E is MINUS_INF2, and qwin heals lane-by-lane
                # long before those rows compute (window_width margin).
                # The window parks at the target end (vbase <= wt - W).
                want = vbase > vbase_prev
                wantv = jnp.zeros((B, 1), _I32) + want.astype(_I32)
                wmask = (wantv > 0) & (lane >= 0)

                def shl(x):
                    if interpret:
                        return jnp.roll(x, -SHIFT_Q, axis=1)
                    return pltpu.roll(x, shift=W - SHIFT_Q, axis=1)

                rn = vbase + lane
                inc = lane >= W - SHIFT_Q
                h0n, f0n = boundary_init(rn)
                for hfa, hfb, fst_r, est_r, qwin_r in waves_refs:
                    hfa[:, :] = jnp.where(
                        wmask, jnp.where(inc, h0n, shl(hfa[:, :])),
                        hfa[:, :],
                    )
                    hfb[:, :] = jnp.where(
                        wmask, jnp.where(inc, h0n, shl(hfb[:, :])),
                        hfb[:, :],
                    )
                    fst_r[:, :] = jnp.where(
                        wmask, jnp.where(inc, f0n, shl(fst_r[:, :])),
                        fst_r[:, :],
                    )
                    est_r[:, :] = jnp.where(
                        wmask,
                        jnp.where(inc, minus_inf2, shl(est_r[:, :])),
                        est_r[:, :],
                    )
                    qwin_r[:, :] = jnp.where(
                        wmask, shl(qwin_r[:, :]), qwin_r[:, :]
                    )
                r = vbase + lane
            else:
                r = lane

            # prefetch the NEXT half's windows into the other buffers
            nvbase, nblk0 = next_window(d8 + 8 * INNER_ITERS, vbase)
            for i in range(NW):
                ncp_t, ncp_q = make_dmas(nvbase, nblk0, *pre_bufs[i],
                                         rowb[i])
                ncp_t.start()
                ncp_q.start()

            # per-window invariants (constant across the inner loop);
            # sm/sx fold the target-side N case into the match/mismatch
            # selections so the substep needs one select fewer
            pr = r >> 3
            ro = r & 7
            two_r = r << 1
            blk_first = ro == 0
            # chunk-start bound: row-derived only, shared by all waves
            cs = jnp.maximum(0, (pr << 3) - bw) >> 3
            tb, sub_m, sub_x, ce, fake, prev_fake = (
                [], [], [], [], [], []
            )
            for i in range(NW):
                tb_i = use_bufs[i][0][:, :]
                t_is_n = tb_i == N_VALUE
                tb.append(tb_i)
                sub_m.append(jnp.where(t_is_n, -N_PENALTY, match))
                sub_x.append(jnp.where(t_is_n, -N_PENALTY, -mism))
                ce.append(
                    jnp.minimum(pql[i] - 1, ((pr << 3) + (7 + bw)) >> 3)
                )
                # rows beyond ref_len in the last word / shifted by one
                fake.append(r >= rlen[i])
                prev_fake.append(r > rlen[i])

            inner = functools.partial(
                _inner, r=r, pr=pr, ro=ro, two_r=two_r,
                blk_first=blk_first, cs=cs, ce=ce, fake=fake,
                prev_fake=prev_fake, tb=tb, sub_m=sub_m, sub_x=sub_x,
                vbase=vbase, blk0=blk0, waves_refs=waves_refs,
                qfw=[use_bufs[i][1] for i in range(NW)],
                acc_w=acc_w, sem_f=sem_f,
            )
            d8_0 = d8
            d8, i1, kph, bks = jax.lax.fori_loop(
                0, INNER_ITERS,
                lambda _i, c: inner(c),
                (d8, i1, kph, bks),
            )
            if emit_flags:
                for i in range(NW):
                    flag_dma(d8_0, i).start()
            return (d8, vbase, i1, kph, bks)

        def body(carry, refs, bufs_a, bufs_b):
            carry = half(carry, refs, bufs_a, bufs_b)
            carry = half(carry, refs, bufs_b, bufs_a)
            return carry

        def _inner(carry, *, r, pr, ro, two_r, blk_first, cs, ce, fake,
                   prev_fake, tb, sub_m, sub_x, vbase, blk0, waves_refs,
                   qfw, acc_w=None, sem_f=None):
            # i1 = sw*floor(D/sw) and kph = D - i1 are carried
            # incrementally: scalar div/rem by a non-power-of-two lowers
            # to an iterative loop whose cost grows with the operand
            # value (measured: O(total_steps^2) end-to-end).
            d8, i1, kph, bks = carry
            bks = [list(bk) for bk in bks]
            D = d8 >> 3

            # --- query feed: feed[:, k] = q[qoff + k] for k in [0, 8) ---
            # one aligned 128-block slice of the staged qfw window plus
            # a power-of-two lane rotate.  Out-of-range feeds are
            # garbage, but every cell that reads them has qq >= qlen and
            # is masked off by `valid`.
            qoff = d8 - vbase
            phase = qoff & 127
            off2 = jnp.clip(qoff - phase - blk0, 0, 2 * LANE)
            feed = []
            for i in range(NW):
                fd = qfw[i][:, pl.ds(pl.multiple_of(off2, LANE), LANE)]
                if interpret:
                    fd = jnp.roll(fd, -phase, axis=1)
                else:
                    fd = pltpu.roll(fd, shift=LANE - phase, axis=1)
                feed.append(fd)

            # --- hoisted per-packed-diagonal values (per wave) ---
            i2 = jnp.where(kph == 0, i1 - sw, i1)
            at_ss = kph == 0
            pq_a = D - pr
            pq_b = pq_a - 1
            base_qq = d8 - r
            base_band = d8 - two_r
            hoist = []
            for i in range(NW):
                ss1, se1 = slice_bounds(i1, pql[i], prl[i])
                ss2, se2 = slice_bounds(i2, pql[i], prl[i])
                insl_a = (pr >= ss1) & (pr <= se1)
                insl_b = (pr >= ss2) & (pr <= se2)
                # X: in slice+chunk; Y: also chunk-interior (band-exempt)
                x_a = insl_a & (pq_a >= cs) & (pq_a <= ce[i])
                x_b = insl_b & (pq_b >= cs) & (pq_b <= ce[i])
                if noband:
                    y_a = y_b = None
                else:
                    y_a = x_a & (pq_a > cs) & (pq_a < ce[i])
                    y_b = x_b & (pq_b > cs) & (pq_b < ce[i])
                cse_a = pq_a == jnp.maximum(cs, i1 - pr)
                hoist.append((x_a, x_b, y_a, y_b, cse_a))

                # --- empty-slice termination (agatha_kernel.h:189-191);
                # slices start at multiples of 8*sw which are multiples
                # of 8, so the check belongs to substep 0 of this
                # iteration.
                ss_sl, se_sl = slice_bounds(D, pql[i], prl[i])
                bks[i][3] = jnp.where(
                    (bks[i][3] == 0) & at_ss & (d8 < i_end8[i])
                    & (ss_sl > se_sl),
                    1, bks[i][3],
                )

            if emit_flags:
                acc = [jnp.zeros((B, W), _I32) for _ in range(NW)]

            for k in range(8):
                d = d8 + k
                # cells with ro > k sit on packed diagonal D-1 (class b),
                # the rest on D (class a); Mosaic has no bool-valued
                # select, so classes combine with logical ops.
                cls = ro > k
                ncls = ro <= k
                qq_ge0 = base_qq >= -k
                if not noband:
                    in_band = jnp.abs(base_band + k) <= bw

                # Lane-0 boundary values.  While vbase == 0, lane 0 is
                # row 0 and takes the top-boundary init; after the window
                # leaves row 0, lane 0's row is in the never-computes
                # margin: htl is dead, and the flowing E stream of every
                # column still below the window is MINUS_INF2 (such
                # columns have q > bw, whose top_e init is MINUS_INF2).
                if windowed:
                    at0 = vbase == 0
                    top_h_v = jnp.where(at0, top_h(d - 1), minus_inf2)
                    top_e_v = jnp.where(at0, top_e(d), minus_inf2)
                else:
                    top_h_v = top_h(d - 1)
                    top_e_v = top_e(d)

                for i in range(NW):
                    hfa, hfb, fst_r, est_r, qwin_r = waves_refs[i]
                    x_a, x_b, y_a, y_b, cse_a = hoist[i]
                    ms, mr, mq, term, diags = bks[i]
                    valid = qq_ge0 & (base_qq < qlen[i] - k)
                    if noband:
                        # bw >= max(W, QF) proves |q - r| <= bw for
                        # every cell, so the band test and the chunk-
                        # interior exemption are vacuous: z == x (short-
                        # read fast path; scores identical by
                        # construction)
                        z_a, z_b = x_a, x_b
                    else:
                        z_a = y_a | (x_a & in_band)
                        z_b = y_b | (x_b & in_band)
                    C = valid & ((cls & z_b) | (ncls & z_a))
                    # chunk-start lanes have ro == k, i.e. qo == 0, which
                    # is always class a (ro > k is false there)
                    cst = (ro == k) & qq_ge0 & cse_a

                    # alternating H-strip roles (see body docstring)
                    hf1_ref, hf2_ref = (
                        (hfa, hfb) if k % 2 == 0 else (hfb, hfa)
                    )

                    # query window: qwin[:, l] = q[d - vbase - l]
                    qwin = jnp.where(
                        lane0, feed[i][:, k:k + 1],
                        _roll1(qwin_r[:, :], interpret=interpret),
                    )
                    qwin_r[:, :] = qwin

                    # diagonal-H input with strip round-trip / fake-row
                    # reload
                    hf1 = hf1_ref[:, :]
                    htl = _roll1(hf2_ref[:, :], interpret=interpret)
                    htl = jnp.where(lane0, top_h_v, htl)
                    if not safe16:
                        htl = jnp.where(
                            blk_first | cst, _trunc16(htl), htl
                        )
                    htl = jnp.where(cst & prev_fake[i], minus_inf2, htl)
                    # E input (flows down rows; top strip is int16)
                    est = est_r[:, :]
                    e_in = jnp.where(blk_first, strip16(est), est)
                    e_in = jnp.where(lane0, top_e_v, e_in)
                    # F input (flows along rows; left strip is int16)
                    fst = fst_r[:, :]
                    f_in = jnp.where(cst, strip16(fst), fst)
                    f_in = jnp.where(cst & fake[i], minus_inf2, f_in)

                    # sub_m/sub_x carry the target-side N fold (a target
                    # N never equals a non-N query code, so the equal
                    # branch with t_is_n is unreachable anyway — both
                    # branches then yield -N_PENALTY, keeping exactness)
                    s = jnp.where(qwin == tb[i], sub_m[i], sub_x[i])
                    s = jnp.where(qwin == N_VALUE, -N_PENALTY, s)

                    temp = htl + s
                    if emit_flags:
                        max_te = jnp.maximum(temp, e_in)
                        h_new = jnp.maximum(max_te, f_in)
                    else:
                        h_new = jnp.maximum(
                            jnp.maximum(temp, f_in), e_in
                        )
                    tg = temp - goe
                    if emit_flags:
                        # Source-side traceback nibble (see kernel
                        # docstring above / ops/walk.py).  Ties: H
                        # prefers temp then E (strict > tests), gaps
                        # prefer open (>=) — matching the host engine's
                        # conventions (ops/traceback.py).  Open bits are
                        # gated on C: a non-computed cell passes its E/F
                        # stream through unchanged, which the walk
                        # treats as an extension.
                        e_gt = e_in > temp
                        f_gt = f_in > max_te
                        src = jnp.where(
                            f_gt, jnp.int32(2),
                            jnp.where(e_gt, jnp.int32(1), jnp.int32(0)),
                        )
                        e_open = C & (tg >= e_in - ge)
                        f_open = C & (tg >= f_in - ge)
                        nib = (
                            src
                            | jnp.where(e_open, jnp.int32(4),
                                        jnp.int32(0))
                            | jnp.where(f_open, jnp.int32(8),
                                        jnp.int32(0))
                        )
                        acc[i] = acc[i] | (nib << (4 * k))
                    fst_r[:, :] = jnp.where(
                        C, jnp.maximum(tg, f_in - ge), f_in
                    )
                    e_nx = jnp.where(C, jnp.maximum(tg, e_in - ge), e_in)
                    # new hf1 overwrites hf2's slot (its value was
                    # consumed as htl above); old hf1 becomes next
                    # substep's hf2 by the role swap.
                    hf2_ref[:, :] = jnp.where(C, h_new, hf1)
                    est_r[:, :] = _roll1(e_nx, interpret=interpret)

                    packed = (h_new << 16) + r
                    packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
                    dmax = jnp.max(packed, axis=1, keepdims=True)

                    # --- per-pair bookkeeping (agatha_kernel.h:291-313,
                    # 336-356) ---
                    live = (term == 0) & (d < end_p[i])
                    gate = live & (
                        ((d < i_end8[i]) & (d < n_diags[i]))
                        | (d >= i_end8[i])
                    )
                    th = dmax >> 16
                    tr = dmax & 0xFFFF
                    dq = d - tr
                    upd = gate & (th > ms)
                    if z >= 0:
                        zel = gate & ~(th > ms) & (tr >= mr) & (dq >= mq)
                        gap = jnp.abs((tr - mr) - (dq - mq))
                        term = jnp.where(
                            zel & (ms - th > z + gap * ge), 1, term
                        )
                    ms = jnp.where(upd, th, ms)
                    mr = jnp.where(upd, tr, mr)
                    mq = jnp.where(upd, dq, mq)
                    diags = diags + live.astype(_I32)
                    bks[i] = [ms, mr, mq, term, diags]

            if emit_flags:
                # Stage this packed diagonal's plane in each wave's
                # 8-plane buffer (slot = D mod 8; halves are 8 packed
                # diagonals, so slots never collide within a half).  The
                # DMA to HBM happens once per half — DMA ops inside this
                # loop cost ~3x kernel compile time (measured round 3).
                slot = D & 7
                for i in range(NW):
                    acc_w[i][:, pl.ds(pl.multiple_of(slot * W, LANE),
                                      W)] = acc[i]

            kph = kph + 1
            wrap = kph >= sw
            return (d8 + 8, jnp.where(wrap, i1 + sw, i1),
                    jnp.where(wrap, 0, kph),
                    tuple(tuple(bk) for bk in bks))

        def run(*scratch_refs):
            # flat layout: NW x (hfa, hfb, fst_r, est_r, qwin_r), then
            # NW x (tbw_a, qfw_a, sems_a), NW x (tbw_b, qfw_b, sems_b),
            # then NW x (acc_w, sem_f) when emit_flags.
            waves_refs = [
                scratch_refs[i * 5:(i + 1) * 5] for i in range(NW)
            ]
            off = NW * 5
            bufs_a = [
                scratch_refs[off + i * 3:off + (i + 1) * 3]
                for i in range(NW)
            ]
            off += NW * 3
            bufs_b = [
                scratch_refs[off + i * 3:off + (i + 1) * 3]
                for i in range(NW)
            ]
            off += NW * 3
            acc_w = sem_f = None
            if emit_flags:
                acc_w = list(scratch_refs[off:off + 2 * NW:2])
                sem_f = list(scratch_refs[off + 1:off + 2 * NW:2])

            left_h0, left_f0 = boundary_init(lane)
            for hfa, hfb, fst_r, est_r, qwin_r in waves_refs:
                hfa[:, :] = left_h0
                hfb[:, :] = left_h0
                fst_r[:, :] = left_f0
                est_r[:, :] = jnp.full((B, W), MINUS_INF2, _I32)
                qwin_r[:, :] = jnp.zeros((B, W), _I32)  # filled at d=0

            if emit_flags:
                # Primers so the first half's wait-before-write has a
                # completion to consume.  The (uninitialized) staging
                # buffers land in planes 0-7, which the first real half
                # DMAs overwrite strictly afterwards (each starts only
                # after its primer's completion is consumed).
                acc_ref[0] = acc_w
                acc_ref[1] = sem_f
                for i in range(NW):
                    flag_dma(jnp.int32(0), i).start()
            refs = (waves_refs, acc_w, sem_f)

            # prime the first half's windows
            v0, b0 = next_window(jnp.int32(0), jnp.int32(0))
            for i in range(NW):
                p_t, p_q = make_dmas(v0, b0, *bufs_a[i], rowb[i])
                p_t.start()
                p_q.start()

            init = (
                jnp.int32(0),
                jnp.int32(0),  # vbase
                jnp.int32(0),  # i1 = sw*floor(D/sw)
                jnp.int32(0),  # kph = D - i1
                tuple(
                    (zeros, zeros, zeros, zeros, zeros)
                    for _ in range(NW)
                ),
            )
            final = jax.lax.while_loop(
                cond,
                lambda c: body(c, refs, bufs_a, bufs_b),
                init,
            )
            d8_f, vb_f, _, _, bks = final
            # drain the dangling prefetch (last half prefetched bufs_a)
            nv, nb = next_window(d8_f, vb_f)
            for i in range(NW):
                w_t, w_q = make_dmas(nv, nb, *bufs_a[i], rowb[i])
                w_t.wait()
                w_q.wait()
            if emit_flags:
                # drain the last half's flag DMAs
                for i in range(NW):
                    flag_dma(jnp.int32(0), i).wait()
            for i in range(NW):
                ms, mr, mq, _term, diags = bks[i]
                sl = slice(None) if NW == 1 else slice(i * B, (i + 1) * B)
                out_ref[sl, 0:1] = ms
                out_ref[sl, 1:2] = mq
                out_ref[sl, 2:3] = mr
                out_ref[sl, 3:4] = diags

        scratch = []
        for _ in range(NW):
            scratch += [pltpu.VMEM((B, W), _I32) for _ in range(5)]
        for _ in range(2 * NW):  # bufs_a then bufs_b
            scratch += [
                pltpu.VMEM((B, W), _I32),
                pltpu.VMEM((B, 3 * LANE), _I32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        if emit_flags:
            for _ in range(NW):
                scratch += [
                    pltpu.VMEM((B, INNER_ITERS * W), _I32),
                    pltpu.SemaphoreType.DMA((1,)),
                ]
        pl.run_scoped(run, *scratch)

    return kernel


def _unpack_nibbles(p):
    """(GB, X/2) uint8, two 4-bit codes per byte -> (GB, X) int32.

    Wire analogue of the reference's packed layout (pack_rc_seqs.h:13-53);
    unpacking runs on device, halving host->device traffic again vs int8.
    """
    a = p.astype(_I32)
    lo = a & 0xF
    hi = (a >> 4) & 0xF
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)


def pack_nibbles(codes: np.ndarray) -> np.ndarray:
    """Host side of the nibble wire format; codes.shape[1] must be even."""
    c = codes.astype(np.uint8)
    return (c[:, 0::2] | (c[:, 1::2] << 4)).astype(np.uint8)


def _align_bucket_impl(meta, tcodes, qfwd, *, cfg, w, qf, safe16,
                       interpret, windowed=False, emit_flags=False,
                       d8_planes=0, n_waves=1):
    """Traceable bucket alignment (call under jit).

    With ``emit_flags`` the kernel additionally writes the per-cell
    traceback nibble bitmap (GB, d8_planes, W_state) int32 to HBM and
    the call returns ``(out, flags)``; ``d8_planes`` must cover the
    sweep (max packed diagonals + 16 slack planes for the 128-diagonal
    loop-body overshoot — see flag_planes_needed).

    ``n_waves`` > 1 interleaves that many independent pair-blocks per
    program (short-read latency hiding; see _make_kernel).  Lowered
    automatically until it divides the bucket.
    """
    gb = tcodes.shape[0]
    nw = max(1, n_waves)
    while nw > 1 and gb % (nw * 8):
        nw //= 2
    bp = _bp_for(w, windowed, gb // nw)
    grid = (gb // (nw * bp),)
    # every cell of every pair provably in-band: the band/interior
    # vector masks compile away (short-read fast path)
    noband = (not windowed) and cfg.band_width >= max(w, qf)
    if windowed:
        wk = window_width(cfg)
        assert w >= wk, (w, wk)
        kernel = _make_kernel(cfg, wk, safe16, interpret,
                              windowed=True, wt=w, b_pairs=bp,
                              emit_flags=emit_flags, n_waves=nw)
    else:
        wk = w
        kernel = _make_kernel(cfg, w, safe16, interpret, b_pairs=bp,
                              noband=noband, emit_flags=emit_flags,
                              n_waves=nw)
    # Narrow wire formats: widen on device (host->device bandwidth is
    # the dominant non-compute cost through the serving path).
    meta = meta.astype(_I32)
    tcodes = (
        _unpack_nibbles(tcodes)
        if tcodes.dtype == jnp.uint8
        else tcodes.astype(_I32)
    )
    qfwd = (
        _unpack_nibbles(qfwd)
        if qfwd.dtype == jnp.uint8
        else qfwd.astype(_I32)
    )
    out_shape = jax.ShapeDtypeStruct((gb, 4), _I32)
    out_specs = pl.BlockSpec((nw * bp, 4), lambda g: (g, 0),
                             memory_space=pltpu.VMEM)
    if emit_flags:
        assert d8_planes > 0
        # 2-D (gb, planes*W): plane p occupies the 128-aligned lane
        # range [p*W, (p+1)*W), so single-plane DMA slices are legal
        # (a 3-D (gb, planes, W) ref gets (8, 128)-tiled over its last
        # two dims and one-plane slices break the sublane tiling).
        # HBM explicitly (not ANY): small bitmaps would otherwise be
        # placed in VMEM; real bitmaps are GBs anyway.
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((gb, d8_planes * wk), _I32))
        flag_space = pltpu.HBM if not interpret else pl.ANY
        out_specs = (out_specs, pl.BlockSpec(memory_space=flag_space))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nw * bp, 2), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            # Sequences stay in HBM; the kernel DMAs fixed-size windows
            # into VMEM scratch (slicing big VMEM refs is pathologically
            # slow, and this keeps VMEM use length-independent).
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(meta, tcodes, qfwd)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "w", "qf", "safe16", "interpret", "windowed",
                     "emit_flags", "d8_planes", "n_waves"),
)
def _align_bucket_jit(meta, tcodes, qfwd, *, cfg, w, qf, safe16, interpret,
                      windowed=False, emit_flags=False, d8_planes=0,
                      n_waves=1):
    return _align_bucket_impl(
        meta, tcodes, qfwd, cfg=cfg, w=w, qf=qf, safe16=safe16,
        interpret=interpret, windowed=windowed, emit_flags=emit_flags,
        d8_planes=d8_planes, n_waves=n_waves,
    )


def n_waves_for_width(w: int, windowed: bool = False) -> int:
    """Independent interleaved pair-blocks per program for lane width w.

    Measured policy: ALWAYS 1.  The interleaving hypothesis (narrow
    widths are roll-latency-bound, so interleaving independent waves
    should fill the stalled issue slots) held on timing-faithful
    mini-kernels (scripts/wave_probe.py: wave2 -10.6%/substep at
    (32, 256)) but REGRESSES on the production kernel
    (scripts/shortread_rate.py wave sweep on v5e: 150 bp 166.7 k
    reads/s at waves=1 vs 146.5 k at 2 / 144.6 k at 4; 400 bp 40.8 k
    vs 36.2 k at 2) — the production per-wave replication (metadata
    decode, qfwd window staging, strip16, per-wave output/bookkeeping
    state) costs more than the latency win, and Mosaic evidently finds
    enough cross-substep overlap on its own.  See PERF_NOTES round 3.
    The mechanism stays (explicit ``n_waves`` is honored and tested
    bit-identical) for future stacks where the trade-off flips.
    """
    del w, windowed
    return 1


def flag_planes_needed(meta: np.ndarray, cfg: AlignConfig) -> int:
    """Plane count (packed diagonals + overshoot slack) for emit_flags.

    The while-loop body advances 128 base diagonals between termination
    checks, so the last written plane index can overshoot a pair's
    i_end by up to 15 planes; 16 slack planes absorb that.  Rounded up
    to a multiple of 256 so bucket length jitter does not mint a fresh
    (emit-flags kernel, walk kernel) compile pair per bucket — slack
    planes cost HBM only (1 MB per 8 pairs at W=1024) and a few inert
    walk iterations.
    """
    meta = np.asarray(meta)
    pql = -(-meta[:, 0] // 8)
    prl = -(-meta[:, 1] // 8)
    tad = pql + prl - 1
    sw = cfg.slice_width
    i_end = -(-tad // sw) * sw
    need = int(i_end.max()) + 1 + 16
    return -(-need // 256) * 256


def align_bucket(
    meta: np.ndarray | jax.Array,
    tcodes: np.ndarray | jax.Array,
    qfwd: np.ndarray | jax.Array,
    cfg: AlignConfig,
    *,
    interpret: bool = False,
    force_strips: bool = False,
    n_waves: int | None = None,
) -> jax.Array:
    """Align one shape-uniform bucket of pairs.

    Args:
      meta:   (GB, 2) int32 — [qlen, rlen] per pair, GB % 8 == 0.
              Padding pairs should use qlen = rlen = 1.
      tcodes: (GB, W) int32 — 4-bit target codes per row, W % 128 == 0,
              W >= padded target length of every pair.
      qfwd:   (GB, QF) int — query codes left-aligned, zero padded;
              QF % 128 == 0 and QF > padded query length of every pair
              (feed loads beyond QF clamp; the garbage lanes are masked).
      cfg:    alignment parameters (static; triggers recompilation).
      force_strips: keep the int16 strip round-trips even when the
              config is provably int16-safe (testing).
      interpret: run the Pallas interpreter instead of compiling
              (CI/debug path; bit-identical to the compiled kernel).
      n_waves: independent pair-blocks interleaved per program —
              a pure performance knob, results bit-identical.  None
              (default) applies the n_waves_for_width policy; explicit
              values are lowered until they divide the bucket.

    tcodes/qfwd may be int8 (codes fit in 4 bits): they are shipped to
    the device narrow and widened there, which matters because host->
    device bandwidth is the engine's main non-compute cost.

    Returns:
      (GB, 4) int32 — [score, query_end, target_end, diagonals_swept].
    """
    tcodes = np.asarray(tcodes) if isinstance(tcodes, np.ndarray) else tcodes
    w = int(tcodes.shape[1])
    qf = int(qfwd.shape[1])
    if tcodes.dtype == np.uint8 or tcodes.dtype == jnp.uint8:
        w *= 2
    if qfwd.dtype == np.uint8 or qfwd.dtype == jnp.uint8:
        qf *= 2
    assert w % LANE == 0 and qf % LANE == 0
    assert tcodes.shape[0] % 8 == 0
    # w + qf bounds the max pair length for the int16-safety bound.
    safe16 = (not force_strips) and int16_safe(cfg, max_len=w + qf)
    # Sliding-window state when the target is longer than the band
    # window: per-step cost becomes O(band), not O(target_len).
    windowed = w > window_width(cfg)
    if n_waves is None:
        # The interpreter emulates serially — waves cannot hide any
        # latency there, they only multiply trace size (CI wall time).
        # Explicit n_waves is always honored (tests/test_waves.py pins
        # interpret-mode bit-identity for every wave variant).
        n_waves = 1 if interpret else n_waves_for_width(w, windowed)
    return _align_bucket_jit(
        jnp.asarray(meta, _I32),
        jnp.asarray(tcodes),
        jnp.asarray(qfwd),
        cfg=cfg,
        w=w,
        qf=qf,
        safe16=safe16,
        interpret=interpret,
        windowed=windowed,
        n_waves=n_waves,
    )


def build_bucket_arrays(
    pairs: list[tuple[np.ndarray, np.ndarray, int, int]],
    cfg: AlignConfig,
    *,
    w: int | None = None,
    dmax: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack (q_codes, t_codes, qlen, rlen) tuples into bucket arrays.

    Pads the pair count to a multiple of B_PAIRS with dummy 1x1 pairs.
    """
    n = len(pairs)
    sw = cfg.slice_width

    def ceil8(x):
        return -(-x // 8)

    max_w = 0
    max_q = 0
    for _qc, _tc, ql, rl in pairs:
        max_w = max(max_w, ceil8(rl) * 8)
        max_q = max(max_q, ceil8(ql) * 8)
    del sw
    if w is None:
        w = -(-max_w // LANE) * LANE
    if dmax is not None:
        max_q = max(max_q, dmax)  # back-compat: allow oversizing
    assert w >= max_w
    gb_unit = b_pairs_for_width(w, w > window_width(cfg))
    gb = -(-n // gb_unit) * gb_unit

    # >= 3 blocks: the kernel stages the query feed in 384-lane windows
    qf = max(3 * LANE, -(-max_q // LANE) * LANE)
    meta = np.ones((gb, 2), np.int32)
    tcodes = np.zeros((gb, w), np.int8)
    qfwd = np.zeros((gb, qf), np.int8)
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        meta[p] = (ql, rl)
        tcodes[p, : len(tc)] = tc
        qfwd[p, : len(qc)] = qc
    return meta, tcodes, qfwd
