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
* **band_width >= max(qlen-1, 8*ceil(rlen/8)-1)** per pair.  This is
  the tight condition; every clause of `computed_mask` (ops/sweep.py)
  reduces to it:
  - band test `|q-r| <= bw`: computed cells span q <= qlen-1 (fake
    columns are never computed) but r <= 8*prl-1 (fake ROWS are
    computed and pollute diagonal maxima), so the extremes are
    q-r <= qlen-1 and r-q <= 8*prl-1;
  - chunk start `cs = max(0, 8*pr-bw)//8 == 0` iff bw >= 8*pr-7, worst
    pr = prl-1: bw >= 8*prl-15 — implied;
  - chunk end `ce = min(pql-1, (8*pr+7+bw)//8) == pql-1` at worst
    pr = 0: bw >= 8*pql-15 <= qlen-1 — implied;
  - slice clip `pr >= ctrunc16(8*i+8-bw)` at worst i = pr+pq,
    pq = pql-1, pr = 0: bw >= 8*pql-15 — implied; the `se` twin
    needs bw >= 8*prl-15 — implied;
  - the empty-slice termination (agatha_kernel.h:189) is unreachable
    under these bounds (each `ss` term stays <= its `se` partner for
    every slice below i_end).
  At the canonical band 751 this admits qlen <= 752, rlen <= 752 —
  the reference's ENTIRE short-read regime (150/300/600 bp datasets,
  test_prog/Makefile:45-61).

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
    are harmless).  Tight condition (see the module docstring):
    ``band >= max(qlen-1, 8*ceil(rlen/8)-1)`` per pair, plus the
    int16-safe regime.
    """
    if not safe16:
        return False
    qlen = np.asarray(meta[:, 0], _I64)
    rlen = np.asarray(meta[:, 1], _I64)
    r8 = 8 * (-(-rlen // 8))
    need = np.maximum(qlen - 1, r8 - 1)
    return bool((need <= cfg.band_width).all())


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
    assert max(qlen - 1, R8 - 1) <= bw, "pair not colsweep-eligible"

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


# --- device implementation (Pallas sweep + XLA skew + Pallas chain) ----

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_I32j = jnp.int32
LN = 128
_NEG_BIG = -(1 << 28)  # scan fill: loses every max, no wraparound


def _tr16j(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _shift_down(x, s, fill, interpret):
    """rows[s:] = x[:-s], rows[:s] = fill (int32 scalar)."""
    if interpret:
        y = jnp.roll(x, s, axis=0)
    else:
        y = pltpu.roll(x, shift=s, axis=0)
    ri = jax.lax.broadcasted_iota(_I32j, x.shape, 0)
    return jnp.where(ri < s, fill, y)


def _make_sweep_kernel(R, Q, Dpad, cfg, interpret):
    """One 128-lane block: pairs on lanes, target rows on sublanes.

    Per-diagonal packed maxima accumulate in a VMEM ring DURING the
    sweep: column j contributes packed(r) to diagonal r + j, and
    within an 8-column group the offsets j..j+7 collapse into one
    group-local skewed accumulator (8 shifted maxes) whose ring
    destination offset 8*g8 is sublane-ALIGNED — so the only output is
    the (Dpad, 128) ring itself (a first version emitted the full
    packed cell matrix and recovered diagonals with an XLA skew pass;
    that moved multi-GB of HBM traffic and measured 185 k reads/s —
    the ring version removes ~all of it).  Semantics:
    align_one_colsweep_np (the NumPy contract), which matches
    ops/sweep.py on eligible buckets.
    """
    sw, bw = cfg.slice_width, cfg.band_width
    goe, ge = cfg.gap_oe, cfg.gap_extend
    match, mism = cfg.match, cfg.mismatch
    del bw  # eligibility guarantees every column/row is inside the band

    def kernel(meta_ref, tmat_ref, qmat_ref, out_ref):
        qlen = meta_ref[0:1, :]
        rlen = meta_ref[1:2, :]
        r_iota = jax.lax.broadcasted_iota(_I32j, (R, LN), 0)
        pr = r_iota >> 3
        r8p = ((rlen + 7) >> 3) << 3
        exist = r_iota < r8p
        fake = r_iota >= rlen            # rows in [rlen, R8p) pollute
        prev_fake = r_iota >= rlen + 1   # fake(r-1); row 0 never
        ge_r = ge * r_iota               # scan weights
        tmat = tmat_ref[:, :]
        t_is_n = tmat == N_VALUE

        def run(hprev, fst):
            # left-strip inits (rows always <= band: formula direct)
            k0 = _tr16j(-(goe + ge * r_iota))
            hprev[:, :] = k0
            fst[:, :] = _tr16j(k0 - goe)
            out_ref[:, :] = jnp.full((Dpad, LN), INT32_MIN, _I32j)

            def column(j, k, g8, qblk, cst):
                colm = qlen > j                      # (1, LN)
                qb = qblk[k:k + 1, :]
                s = jnp.where(qb == tmat, match, -mism)
                s = jnp.where((qb == N_VALUE) | t_is_n, -N_PENALTY, s)

                # top-boundary scalars (j <= Q-1 < band always)
                top_h = jnp.where(
                    j == 0, 0, _tr16j(-(goe + ge * (j - 1)))
                )
                top_e = _tr16j(_tr16j(-(goe + ge * j)) - goe)

                htl = _shift_down(hprev[:, :], 1, 0, interpret)
                htl = jnp.where(r_iota == 0, top_h, htl)
                if k == 0:
                    htl = jnp.where(cst & prev_fake, MINUS_INF2, htl)
                temp = htl + s

                f_in = fst[:, :]
                if k == 0:
                    f_in = jnp.where(cst & fake, MINUS_INF2, f_in)

                # E prefix: e_in(r) = max(top_e - r*ge,
                #   max_{k<r} temp(k) - goe - (r-1-k)*ge)
                gv = temp - goe + ge_r
                p = _shift_down(gv, 1, 0, interpret)
                p = jnp.where(r_iota == 0, top_e - ge, p)
                sft = 1
                while sft < R:
                    p = jnp.maximum(
                        p, _shift_down(p, sft, _NEG_BIG, interpret)
                    )
                    sft *= 2
                e_in = p - (ge_r - ge)

                h_new = jnp.maximum(jnp.maximum(temp, f_in), e_in)
                f_new = jnp.maximum(temp - goe, f_in - ge)
                fst[:, :] = jnp.where(colm, f_new, fst[:, :])
                hprev[:, :] = jnp.where(colm, h_new, hprev[:, :])

                packed = (h_new << 16) + r_iota
                packed = jnp.where(colm & exist, packed,
                                   jnp.int32(INT32_MIN))
                # extend to the (R+8) group frame and skew by k: row
                # (k + r) of the group accumulator = diagonal
                # 8*g8 + k + r
                pe = jnp.concatenate(
                    [packed,
                     jnp.full((8, LN), INT32_MIN, _I32j)], axis=0
                )
                if k:
                    pe = _shift_down(pe, k, INT32_MIN, interpret)
                return pe

            def group(g8, _):
                qblk = qmat_ref[pl.ds(pl.multiple_of(g8 * 8, 8), 8), :]
                # chunk-start mask for column 8*g8 (pj == g8):
                # i = sw*((pr + g8)//sw); cst = g8 == max(0, i - pr)
                i_sl = ((pr + g8) // sw) * sw
                cst = g8 == jnp.maximum(0, i_sl - pr)

                gacc = column(g8 * 8, 0, g8, qblk, cst)
                for k in range(1, 8):
                    gacc = jnp.maximum(
                        gacc, column(g8 * 8 + k, k, g8, qblk, cst)
                    )
                # ring merge at the 8-aligned group offset
                seg = pl.ds(pl.multiple_of(g8 * 8, 8), R + 8)
                out_ref[seg, :] = jnp.maximum(out_ref[seg, :], gacc)
                return 0

            jax.lax.fori_loop(0, Q // 8, group, 0)

        pl.run_scoped(
            run,
            hprev=pltpu.VMEM((R, LN), _I32j),
            fst=pltpu.VMEM((R, LN), _I32j),
        )

    return kernel


def _make_chain_kernel(Dpad, GB, z, ge):
    """Per-diagonal best/Z-drop chain over the whole bucket at once.

    diag_ref holds (Dpad, GB) packed diagonal maxima in HBM (rows DMA'd
    in double-buffered groups of 8); scal_ref (4, GB) carries per-pair
    [i_end8, n_diags, end_p, 0].  One serial loop over diagonals with
    every pair on the lanes — the exact sequential semantics of
    sweep.py check_diag + the slice/wrap-up schedule, vectorized across
    pairs only (kernel.py runs the identical chain per substep).
    """

    def kernel(scal_ref, diag_ref, out_ref):
        i_end8 = scal_ref[0:1, :]
        n_diags = scal_ref[1:2, :]
        end_p = scal_ref[2:3, :]

        def row_dma(buf, gd, sem):
            return pltpu.make_async_copy(
                diag_ref.at[pl.ds(pl.multiple_of(gd * 8, 8), 8), :],
                buf, sem,
            )

        def run(buf_a, buf_b, sems):
            row_dma(buf_a, jnp.int32(0), sems.at[0]).start()
            row_dma(buf_b, jnp.int32(1), sems.at[1]).start()

            def steps(buf, gd, carry):
                ms, mr, mq, term, diags = carry
                for k in range(8):
                    d = gd * 8 + k
                    dmax = buf[k:k + 1, :]
                    live = (term == 0) & (d < end_p)
                    gate = live & (
                        ((d < i_end8) & (d < n_diags)) | (d >= i_end8)
                    )
                    th = dmax >> 16
                    tr = dmax & 0xFFFF
                    dq = d - tr
                    upd = gate & (th > ms)
                    zel = gate & ~(th > ms) & (tr >= mr) & (dq >= mq)
                    gap = jnp.abs((tr - mr) - (dq - mq))
                    if z >= 0:
                        term = jnp.where(
                            zel & (ms - th > z + gap * ge), 1, term
                        )
                    ms = jnp.where(upd, th, ms)
                    mr = jnp.where(upd, tr, mr)
                    mq = jnp.where(upd, dq, mq)
                    diags = diags + live.astype(_I32j)
                return ms, mr, mq, term, diags

            def pair_of_groups(q, carry):
                gd = 2 * q
                cp = row_dma(buf_a, gd, sems.at[0])
                cp.wait()
                carry = steps(buf_a, gd, carry)
                row_dma(buf_a, jnp.minimum(gd + 2, Dpad // 8 - 1),
                        sems.at[0]).start()
                cp = row_dma(buf_b, gd + 1, sems.at[1])
                cp.wait()
                carry = steps(buf_b, gd + 1, carry)
                row_dma(buf_b, jnp.minimum(gd + 3, Dpad // 8 - 1),
                        sems.at[1]).start()
                return carry

            z0 = jnp.zeros((1, GB), _I32j)
            carry = jax.lax.fori_loop(
                0, Dpad // 16, pair_of_groups, (z0, z0, z0, z0, z0)
            )
            ms, mr, mq, term, diags = carry
            row_dma(buf_a, jnp.int32(0), sems.at[0]).wait()
            row_dma(buf_b, jnp.int32(0), sems.at[1]).wait()
            out_ref[0:1, :] = ms
            out_ref[1:2, :] = mq
            out_ref[2:3, :] = mr
            out_ref[3:4, :] = diags

        pl.run_scoped(
            run,
            buf_a=pltpu.VMEM((8, GB), _I32j),
            buf_b=pltpu.VMEM((8, GB), _I32j),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "r_rows", "q_cols", "d_pad", "interpret"),
)
def _colsweep_jit(meta, tcodes, qfwd, *, cfg, r_rows, q_cols, d_pad,
                  interpret):
    """Jitted sweep + skew + chain for one chunk of <= cap pairs.

    meta (GB, 2) int32 (GB a multiple of 128); tcodes/qfwd in the
    bucket wire format ((GB, X/2) uint8 nibbles or (GB, X) int8).
    Returns (GB, 4) int32 [score, q_end, t_end, diags] — the
    align_bucket result contract.
    """
    from agatha_tpu.ops.kernel import _unpack_nibbles

    GB = meta.shape[0]
    R, Q = r_rows, q_cols
    t = (_unpack_nibbles(tcodes) if tcodes.dtype == jnp.uint8
         else tcodes.astype(_I32j))
    q = (_unpack_nibbles(qfwd) if qfwd.dtype == jnp.uint8
         else qfwd.astype(_I32j))
    tmat = t[:, :R].T
    qmat = q[:, :Q].T
    meta2 = meta.astype(_I32j).T

    diag = pl.pallas_call(
        _make_sweep_kernel(R, Q, d_pad, cfg, interpret),
        grid=(GB // LN,),
        in_specs=[
            pl.BlockSpec((2, LN), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LN), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, LN), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_pad, LN), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, GB), _I32j),
        interpret=interpret,
    )(meta2, tmat, qmat)

    # per-pair schedule scalars
    qlen = meta[:, 0].astype(_I32j)
    rlen = meta[:, 1].astype(_I32j)
    sw = cfg.slice_width
    tad = -(-qlen // 8) + -(-rlen // 8) - 1
    i_end8 = (-(-tad // sw) * sw) * 8
    nd = qlen + rlen - 1
    scal = jnp.stack(
        [i_end8, nd, i_end8 + 8, jnp.zeros_like(nd)], axis=0
    )

    out4 = pl.pallas_call(
        _make_chain_kernel(d_pad, GB, cfg.z_threshold,
                           cfg.gap_extend),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, GB), _I32j),
        interpret=interpret,
    )(scal, diag)
    return out4.T


def colsweep_shapes(meta, tcodes, qfwd, cfg: AlignConfig):
    """Static kernel extents (R rows, Q cols, d_pad ring rows) for a
    bucket.  Extents round up to coarse grid steps (32 rows/cols, 128
    ring rows) so bucket length jitter does not mint a fresh compile
    per bucket; rounded-out rows/columns are fully masked in-kernel
    (measured cost of the rounding vs exact extents: ~4% at 150 bp —
    PERF_NOTES round 3)."""
    meta = np.asarray(meta)
    wire = 2 if np.asarray(tcodes).dtype == np.uint8 else 1
    cap_r = tcodes.shape[1] * wire
    cap_q = qfwd.shape[1] * wire
    R = int(min(cap_r, -(-8 * int(-(-meta[:, 1].max() // 8)) // 32) * 32))
    Q = int(min(cap_q, -(-8 * int(-(-meta[:, 0].max() // 8)) // 32) * 32))
    assert R % 8 == 0 and Q % 8 == 0
    sw = cfg.slice_width
    tad = -(-meta[:, 0].astype(_I64) // 8) + \
        -(-meta[:, 1].astype(_I64) // 8) - 1
    i_end8_max = int((-(-tad.max() // sw) * sw) * 8)
    # chain consumes 16 ring rows/iteration; ring needs Q + R rows
    d_pad = -(-max(i_end8_max + 8, R + Q) // 128) * 128
    return R, Q, d_pad


def align_bucket_colsweep(meta, tcodes, qfwd, cfg: AlignConfig,
                          interpret: bool = False, device=None):
    """Column-sweep bucket alignment (same contract as align_bucket).

    Caller must have checked `colsweep_eligible`.  Pads the bucket to
    a 128-lane multiple; per-block memory is a few hundred KB of VMEM
    (no HBM intermediates beyond the (d_pad, GB) diagonal ring).
    Returns a device array; results are bit-identical to align_bucket.

    Row/column/ring extents round up to coarse grid steps so bucket
    length jitter does not mint a fresh compile per bucket (the same
    hygiene as the flag-plane rounding, PERF_NOTES); rounded-out rows
    and columns are fully masked inside the kernel.  ``device`` pins
    the dispatch to one local chip (the engine round-robins eligible
    buckets across chips — the ring + chain are device-local, so whole
    buckets parallelize more simply than sharded rows).
    """
    import numpy as np_

    meta = np_.asarray(meta)
    gb = meta.shape[0]
    R, Q, d_pad = colsweep_shapes(meta, tcodes, qfwd, cfg)

    m, tc, qc = meta, tcodes, qfwd
    pad = (-gb) % LN
    if pad:
        m = np_.concatenate([m, np_.ones((pad, 2), meta.dtype)], axis=0)
        tc = np_.concatenate(
            [tc, np_.zeros((pad, tc.shape[1]), tc.dtype)], axis=0)
        qc = np_.concatenate(
            [qc, np_.zeros((pad, qc.shape[1]), qc.dtype)], axis=0)
    if device is not None:
        def put(a):
            return jax.device_put(a, device)
    else:
        put = jnp.asarray
    out = _colsweep_jit(
        put(np_.asarray(m, np_.int32)), put(np_.asarray(tc)),
        put(np_.asarray(qc)), cfg=cfg, r_rows=R, q_cols=Q, d_pad=d_pad,
        interpret=interpret,
    )
    return out[:gb] if pad else out
