"""Pallas TPU kernel: batched AGAThA guided-alignment wavefront.

TPU-native execution scheme (replaces the reference's CUDA subwarp /
shared-memory design, AGAThA/src/kernels/agatha_kernel.h:49-431):

* One program instance aligns ``B_PAIRS`` pairs at once: pairs sit in the
  sublane dimension, reference rows in the lane dimension, so every VPU
  op advances B_PAIRS * W DP cells of state.
* The DP is swept one *base* antidiagonal per ``while_loop`` iteration —
  the only axis on which all in-flight cells are independent (the
  reference's intra-block column/row chains serialize E/H instead).
* All O(len) state (H at d-1, H at d-2, E, F) lives in VMEM as
  (B_PAIRS, W) int32 arrays carried through the loop; the reference
  keeps these as short2 strips in GPU global memory (ctors.cpp:89).
* Z-drop / empty-slice termination is tracked per pair as a mask; the
  loop exits when every pair in the program has terminated or finished
  (replaces CUDA subwarp rejoining, agatha_kernel.h:365-408, with
  host-side length bucketing + early loop exit).
* Scoring params are compile-time constants (the reference uploads them
  to __constant__ memory, gasal_align.cu:295-309).

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

# Pairs per program instance == int32 sublane tile height.
B_PAIRS = 8
# Lane tile width; W must be a multiple of this.
LANE = 128

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


def _rollm1(x, *, interpret: bool):
    """out[:, l] = x[:, l+1] (circular left shift by one lane)."""
    if interpret:
        return jnp.roll(x, -1, axis=1)
    return pltpu.roll(x, shift=x.shape[1] - 1, axis=1)


def _make_kernel(cfg: AlignConfig, W: int, interpret: bool):
    sw, bw, z = cfg.slice_width, cfg.band_width, cfg.z_threshold
    goe, ge = cfg.gap_oe, cfg.gap_extend
    match, mism = cfg.match, cfg.mismatch
    B = B_PAIRS
    P8 = 8 * sw

    def top_h(col):
        # top-boundary H for column `col` (agatha_kernel.h:126-148); col==-1
        # is the origin corner (topleft[0] == 0).
        k = _trunc16(-(goe + ge * col))
        v = jnp.where(col <= bw, k, MINUS_INF2)
        return jnp.where(col < 0, 0, v)

    def top_e(col):
        k = _trunc16(-(goe + ge * col))
        return jnp.where(col <= bw, _trunc16(k - goe), MINUS_INF2)

    def kernel(meta_ref, tcodes_ref, qfwd_ref, out_ref):
        qlen = meta_ref[:, 0:1]
        rlen = meta_ref[:, 1:2]
        pql = (qlen + 7) >> 3
        prl = (rlen + 7) >> 3
        n_diags = qlen + rlen - 1
        tad = prl + pql - 1
        i_end = ((tad + (sw - 1)) // sw) * sw
        i_end8 = i_end << 3
        end_p = i_end8 + 8

        def slice_bounds(i):
            # banded slice clipping (agatha_kernel.h:183-186); i may be a
            # scalar or (B,1).  ss uses C-truncating division.
            ss = jnp.maximum(
                jnp.maximum(0, i - pql + 1), _ctrunc16((i << 3) + (8 - bw))
            )
            se = jnp.minimum(
                jnp.minimum(prl - 1, i + (sw - 1)),
                _ctrunc16((i << 3) + (8 * (sw - 1) + 7 + bw)),
            )
            return ss, se

        # --- per-lane invariants ---
        r = jax.lax.broadcasted_iota(_I32, (B, W), 1)
        # Mosaic workaround: while-loop carries whose init is sublane-
        # replicated (pure lane-iota functions / splats) hit an invalid
        # relayout against the non-replicated body results.  Mixing in a
        # sublane iota through a value-preserving min forces a plain
        # layout without changing any value (all inits are < 2^30).
        def derep(x):
            si = jax.lax.broadcasted_iota(_I32, x.shape, 0)
            return jnp.minimum(x, si + jnp.int32(0x3FFFFFFF))

        col0 = r == 0
        pr = r >> 3
        ro = r & 7
        two_r = r << 1
        blk_first = ro == 0
        cs = jnp.maximum(0, (pr << 3) - bw) >> 3
        ce = jnp.minimum(pql - 1, ((pr << 3) + (7 + bw)) >> 3)
        fake = r >= rlen          # rows beyond ref_len in the last word
        prev_fake = r > rlen      # fake shifted down one row

        kb = _trunc16(-(goe + ge * r))
        in_b0 = r <= bw
        left_h0 = derep(jnp.where(in_b0, kb, jnp.int32(MINUS_INF2)))
        left_f0 = derep(
            jnp.where(in_b0, _trunc16(kb - goe), jnp.int32(MINUS_INF2))
        )

        tb = tcodes_ref[:, :]
        t_is_n = tb == N_VALUE

        zeros = jnp.zeros((B, 1), _I32)

        def cond(carry):
            d = carry[0]
            term = carry[10]
            # term is an int32 0/1 mask: Mosaic cannot carry i1 vectors
            # through scf.while.
            return jnp.any((term == 0) & (d < end_p))

        def body(carry):
            (d, hf1, hf2, fst, est, qwin, feed, ms, mr, mq, term,
             diags) = carry

            # --- query feed: qwin[l] = q[d - l] ---
            # feed is a 128-lane block whose lane 0 holds q[d]; it is
            # rotated one lane per step and reloaded (128-aligned; Mosaic
            # requires aligned dynamic lane slices) every 128 steps.
            da = (d >> 7) << 7
            feed = jax.lax.cond(
                d == da,
                lambda: qfwd_ref[:, pl.ds(pl.multiple_of(da, LANE), LANE)],
                lambda: feed,
            )
            qwin = jnp.where(
                col0, feed[:, 0:1], _roll1(qwin, interpret=interpret)
            )
            qb = qwin
            a = d & 7
            D = d >> 3
            i1 = (D // sw) * sw
            i2 = ((D - 1) // sw) * sw
            ss1, se1 = slice_bounds(i1)
            ss2, se2 = slice_bounds(i2)

            # Cells on base diagonal d split into two packed-diagonal
            # classes: ro <= a -> dp = D, ro > a -> dp = D-1.
            cls = ro > a
            i_cell = jnp.where(cls, i2, i1)
            in_slice = (pr >= jnp.where(cls, ss2, ss1)) & (
                pr <= jnp.where(cls, se2, se1)
            )
            qq = d - r
            valid = (qq >= 0) & (qq < qlen)
            pq = (D - pr) - cls.astype(_I32)
            in_chunk = (pq >= cs) & (pq <= ce)
            interior = (pq > cs) & (pq < ce)
            in_band = jnp.abs(d - two_r) <= bw
            C = valid & in_slice & in_chunk & (interior | in_band)
            cst = (ro == a) & (qq >= 0) & (
                pq == jnp.maximum(cs, i_cell - pr)
            )

            # diagonal-H input with strip truncation / fake-row reload
            htl = _roll1(hf2, interpret=interpret)
            htl = jnp.where(col0, top_h(d - 1), htl)
            htl = jnp.where(blk_first | cst, _trunc16(htl), htl)
            htl = jnp.where(cst & prev_fake, jnp.int32(MINUS_INF2), htl)
            # E input (flows down rows; top strip is int16)
            e_in = jnp.where(blk_first, _trunc16(est), est)
            e_in = jnp.where(col0, top_e(d), e_in)
            # F input (flows along rows; left strip is int16)
            f_in = jnp.where(cst, _trunc16(fst), fst)
            f_in = jnp.where(cst & fake, jnp.int32(MINUS_INF2), f_in)

            s = jnp.where(qb == tb, match, -mism)
            s = jnp.where((qb == N_VALUE) | t_is_n, -N_PENALTY, s)

            temp = htl + s
            h_new = jnp.maximum(jnp.maximum(temp, f_in), e_in)
            tg = temp - goe
            f_nx = jnp.where(C, jnp.maximum(tg, f_in - ge), f_in)
            e_nx = jnp.where(C, jnp.maximum(tg, e_in - ge), e_in)

            hf2n = hf1
            hf1n = jnp.where(C, h_new, hf1)
            estn = _roll1(e_nx, interpret=interpret)
            feedn = _rollm1(feed, interpret=interpret)

            packed = (h_new << 16) + r
            packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
            dmax = jnp.max(packed, axis=1, keepdims=True)

            # --- per-pair bookkeeping (agatha_kernel.h:291-313,336-356) ---
            live = (term == 0) & (d < end_p)
            at_ss = jax.lax.rem(d, P8) == 0
            islice = d >> 3
            ss_sl, se_sl = slice_bounds(islice)
            term = jnp.where(
                live & at_ss & (d < i_end8) & (ss_sl > se_sl), 1, term
            )
            live2 = (term == 0) & (d < end_p)
            gate = live2 & (((d < i_end8) & (d < n_diags)) | (d >= i_end8))
            th = dmax >> 16
            tr = dmax & 0xFFFF
            dq = d - tr
            upd = gate & (th > ms)
            if z >= 0:
                zel = gate & ~(th > ms) & (tr >= mr) & (dq >= mq)
                gap = jnp.abs((tr - mr) - (dq - mq))
                term = jnp.where(zel & (ms - th > z + gap * ge), 1, term)
            ms = jnp.where(upd, th, ms)
            mr = jnp.where(upd, tr, mr)
            mq = jnp.where(upd, dq, mq)
            diags = diags + live.astype(_I32)

            return (d + 1, hf1n, hf2n, f_nx, estn, qwin, feedn, ms, mr,
                    mq, term, diags)

        init = (
            jnp.int32(0),
            left_h0,
            left_h0,
            left_f0,
            derep(jnp.full((B, W), MINUS_INF2, _I32)),
            derep(jnp.zeros((B, W), _I32)),      # qwin (filled at d=0)
            derep(jnp.zeros((B, LANE), _I32)),   # feed (reloaded at d=0)
            zeros,
            zeros,
            zeros,
            zeros,
            zeros,
        )
        final = jax.lax.while_loop(cond, body, init)
        ms, mr, mq, diags = final[7], final[8], final[9], final[11]
        out_ref[:, 0:1] = ms
        out_ref[:, 1:2] = mq
        out_ref[:, 2:3] = mr
        out_ref[:, 3:4] = diags

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "w", "qf", "interpret")
)
def _align_bucket_jit(meta, tcodes, qfwd, *, cfg, w, qf, interpret):
    gb = tcodes.shape[0]
    grid = (gb // B_PAIRS,)
    kernel = _make_kernel(cfg, w, interpret)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_PAIRS, 2), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_PAIRS, w), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_PAIRS, qf), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_PAIRS, 4), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gb, 4), _I32),
        interpret=interpret,
    )(meta, tcodes, qfwd)


def align_bucket(
    meta: np.ndarray | jax.Array,
    tcodes: np.ndarray | jax.Array,
    qfwd: np.ndarray | jax.Array,
    cfg: AlignConfig,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Align one shape-uniform bucket of pairs.

    Args:
      meta:   (GB, 2) int32 — [qlen, rlen] per pair, GB % B_PAIRS == 0.
              Padding pairs should use qlen = rlen = 1.
      tcodes: (GB, W) int32 — 4-bit target codes per row, W % 128 == 0,
              W >= padded target length of every pair.
      qfwd:   (GB, QF) int32 — query codes left-aligned, zero padded;
              QF % 128 == 0 and QF >= 8 * i_end + 8 for every pair
              (the kernel's query feed reads 128-lane blocks up to the
              last swept diagonal).
      cfg:    alignment parameters (static; triggers recompilation).

    Returns:
      (GB, 4) int32 — [score, query_end, target_end, diagonals_swept].
    """
    w = int(tcodes.shape[1])
    qf = int(qfwd.shape[1])
    assert w % LANE == 0 and qf % LANE == 0
    assert tcodes.shape[0] % B_PAIRS == 0
    return _align_bucket_jit(
        jnp.asarray(meta, _I32),
        jnp.asarray(tcodes, _I32),
        jnp.asarray(qfwd, _I32),
        cfg=cfg,
        w=w,
        qf=qf,
        interpret=interpret,
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
    gb = -(-n // B_PAIRS) * B_PAIRS
    sw = cfg.slice_width

    def ceil8(x):
        return -(-x // 8)

    max_w = 0
    max_d = 0
    for _qc, _tc, ql, rl in pairs:
        prl8 = ceil8(rl) * 8
        max_w = max(max_w, prl8)
        tad = ceil8(rl) + ceil8(ql) - 1
        i_end = -(-tad // sw) * sw
        max_d = max(max_d, 8 * i_end + 8)
    if w is None:
        w = -(-max_w // LANE) * LANE
    if dmax is None:
        dmax = max_d
    assert w >= max_w and dmax >= max_d

    qf = -(-dmax // LANE) * LANE
    meta = np.ones((gb, 2), np.int32)
    tcodes = np.zeros((gb, w), np.int32)
    qfwd = np.zeros((gb, qf), np.int32)
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        meta[p] = (ql, rl)
        tcodes[p, : len(tc)] = tc
        qfwd[p, : len(qc)] = qc
    return meta, tcodes, qfwd
