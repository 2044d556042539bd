"""Banded column-sweep probe: can the colsweep mapping beat the
antidiagonal kernel on the LONG-READ (banded) regime?

The round-3 column-sweep kernel (ops/colsweep.py) delivers ~43 GCUPS
at 600 bp — above the antidiagonal kernel's own 39.4-GCUPS faithful
roofline — because pairs-on-lanes amortizes every shift over 128
pairs and has no serial per-diagonal roll chain.  Its eligibility
gate (band covers the whole rectangle) excludes the headline
long-read workload.  This probe measures the cost structure of the
BANDED extension before the exact semantics are built:

* a sliding row window of RW rows (the band crossed by a column spans
  2*bw+1 rows; the window tracks it, advancing 8 rows per 8-column
  group) holds the H / F carries — lane efficiency ~2*bw/RW = ~96%
  vs the antidiagonal kernel's bw/W = 73%;
* per column: score feed, diagonal-H shift, E as a weighted prefix-max
  (log2(RW) shifted maxes), interval masks (the slice/chunk/band
  predicates collapse to per-column row intervals with (1,128)
  bounds — the full algebra is the production kernel's job; the probe
  spends the same op count), packed (H<<16)|r emission skewed into a
  VMEM diagonal ring;
* per 8-column group: window/ring rolls, 16 finalized diagonals
  consumed by a VECTORIZED Z-drop chain (prefix-argmax over the
  16-row segment + per-step term predicates — no serial scalar
  chain), target-row refill (synthesized here; an 8-row HBM DMA in
  production, ~4 KB/group).

Timing-faithful, semantically WRONG (mask bounds are placeholder
intervals; chain carry-in simplified).  Sustained protocol: REPS
back-to-back dispatches, best-of-3 windows.

Usage: python scripts/colband_probe.py [G] [NCOLS]
Reports ns/column and the implied GCUPS at bw=751 (credited cells per
column = 2*bw+1 per pair x 128 pairs, the steady-state in-band count).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
LN = 128
BW = 751
GOE, GE = 8, 2
MATCH, MISM = 1, 4
Z = 400
N_VALUE = 14
N_PENALTY = 1
INT32_MIN = -(2 ** 31)
MINUS_INF2 = -16384
NEG_BIG = -(1 << 28)


def _shift_down(x, s, fill):
    y = pltpu.roll(x, shift=s, axis=0)
    ri = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    return jnp.where(ri < s, fill, y)


def _shift_up(x, s, fill):
    n = x.shape[0]
    y = pltpu.roll(x, shift=n - s, axis=0)
    ri = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    return jnp.where(ri >= n - s, fill, y)


def _vchain(seg, d0, carry):
    """Vectorized Z-drop chain over a (S,128) ring segment.

    Structurally honest stand-in: prefix-argmax (first-wins) over the
    segment via log2(S) shifted selects, per-step term predicates
    against the running state, first-term one-hot extraction.  The
    production version adds the carry-in combine and the per-pair
    (i_end8, n_diags, end_p) gates — same op class, + ~6 ops.
    """
    S = seg.shape[0]
    ms0, mr0, mq0, term0, diags0 = carry
    th = seg >> 16
    tr = seg & 0xFFFF
    ri = jax.lax.broadcasted_iota(_I32, seg.shape, 0)
    d = ri + d0

    # carry-in as a virtual element before row 0
    bth = jnp.maximum(th, 0)       # placeholder per-step candidate
    run_th = th
    run_tr = tr
    run_d = d
    s = 1
    while s < S:
        pth = _shift_down(run_th, s, NEG_BIG)
        ptr = _shift_down(run_tr, s, 0)
        pd = _shift_down(run_d, s, 0)
        win = pth >= run_th            # earlier-wins tie-break
        run_th = jnp.where(win, pth, run_th)
        run_tr = jnp.where(win, ptr, run_tr)
        run_d = jnp.where(win, pd, run_d)
        s *= 2
    # fold the carry-in state
    win0 = ms0 >= run_th
    run_th = jnp.where(win0, ms0, run_th)
    run_tr = jnp.where(win0, mr0, run_tr)
    run_d = jnp.where(win0, mq0 + mr0, run_d)

    # per-step term predicate against the state BEFORE the step
    pre_th = _shift_down(run_th, 1, 0)
    pre_tr = _shift_down(run_tr, 1, 0)
    pre_d = _shift_down(run_d, 1, 0)
    pre_th = jnp.where(ri == 0, ms0, pre_th)
    pre_tr = jnp.where(ri == 0, mr0, pre_tr)
    pre_d = jnp.where(ri == 0, mq0 + mr0, pre_d)
    dq = d - tr
    pre_q = pre_d - pre_tr
    zel = ~(th > pre_th) & (tr >= pre_tr) & (dq >= pre_q)
    gap = jnp.abs((tr - pre_tr) - (dq - pre_q))
    tcand = zel & (pre_th - th > Z + gap * GE) | (term0 > 0)
    # first-term prefix-or (int32 lanes: bool rolls don't legalize)
    tpre = tcand.astype(_I32)
    s = 1
    while s < S:
        tpre = jnp.maximum(tpre, _shift_down(tpre, s, 0))
        s *= 2
    live = (tpre == 0) | tcand  # first term row stays "selected"
    # freeze at first term: pick the last live row's running state
    sel_th = jnp.where(live, run_th, NEG_BIG)
    ms = jnp.max(sel_th, axis=0, keepdims=True)
    mr = jnp.max(jnp.where(live, run_tr, NEG_BIG), axis=0,
                 keepdims=True)
    mq = jnp.max(jnp.where(live, run_d - run_tr, NEG_BIG), axis=0,
                 keepdims=True)
    term = jnp.max(tcand.astype(_I32), axis=0, keepdims=True)
    diags = diags0 + jnp.sum((~tpre).astype(_I32), axis=0,
                             keepdims=True)
    return (ms, mr, mq, term, diags)


def make_kernel(RW, NCOLS, QRES, with_chain, n_prefix, with_ring=True,
                unroll=8):
    """One pair-block program.  RW window rows, NCOLS columns."""
    RING = RW + 16

    def kernel(meta_ref, qmat_ref, prev_ref, out_ref):
        def run(hprev, fst, tmw, ring):
            qlen = meta_ref[0:1, :]
            r_iota = jax.lax.broadcasted_iota(_I32, (RW, LN), 0)
            ge_r = GE * r_iota
            hprev[:, :] = jnp.full((RW, LN), MINUS_INF2, _I32)
            fst[:, :] = jnp.full((RW, LN), MINUS_INF2, _I32)
            tmw[:, :] = r_iota & 3
            ring[:, :] = jnp.full((RING, LN), INT32_MIN, _I32)

            def group(g, carry):
                ms, mr, mq, term, diags = carry
                w0 = 8 * g  # steady-state window origin

                # chain-consume the 16 finalized diagonals
                if with_chain:
                    seg = ring[0:16, :]
                    ms, mr, mq, term, diags = _vchain(
                        seg, 16 * g - 8, (ms, mr, mq, term, diags)
                    )
                ring[:, :] = _shift_up(ring[:, :], 16, INT32_MIN)

                # window advance: 8 rows roll up, inits enter below
                hprev[:, :] = _shift_up(hprev[:, :], 8, MINUS_INF2)
                fst[:, :] = _shift_up(fst[:, :], 8, MINUS_INF2)
                tmw[:, :] = _shift_up(
                    tmw[:, :], 8, 0
                ) | jnp.where(r_iota >= RW - 8, (r_iota + w0) & 3, 0)
                tmat = tmw[:, :]
                t_is_n = tmat == N_VALUE

                qblk = qmat_ref[
                    pl.ds(pl.multiple_of((g % (QRES // 8)) * 8, 8), 8), :
                ]

                hp = hprev[:, :]
                fi = fst[:, :]
                if with_ring:
                    gacc = jnp.full((RW + 8, LN), INT32_MIN, _I32)
                for k in range(8):
                    j = 8 * g + k
                    # interval mask: placeholder bounds of the real
                    # slice/chunk/band algebra ((1,128) scalar math is
                    # ~free; the row compares are the real cost)
                    lo = j - BW - w0 + (j & 7)
                    hi = j + BW - w0 - (j & 3)
                    colm = qlen > j
                    C = (r_iota >= lo) & (r_iota <= hi) & colm

                    qb = qblk[k:k + 1, :]
                    s = jnp.where(qb == tmat, MATCH, -MISM)
                    s = jnp.where((qb == N_VALUE) | t_is_n,
                                  -N_PENALTY, s)

                    htl = _shift_down(hp, 1, MINUS_INF2)
                    temp = htl + s

                    # E: weighted prefix-max within the column
                    gv = temp - GOE + ge_r
                    gv = jnp.where(C, gv, NEG_BIG)
                    p = _shift_down(gv, 1, NEG_BIG)
                    sft = 1
                    lv = 0
                    while lv < n_prefix:
                        p = jnp.maximum(p, _shift_down(p, sft, NEG_BIG))
                        sft *= 2
                        lv += 1
                    e_in = p - (ge_r - GE)

                    h_new = jnp.maximum(jnp.maximum(temp, fi), e_in)
                    tg = gv - ge_r  # = temp - GOE
                    f_new = jnp.maximum(tg, fi - GE)
                    fi = jnp.where(C, f_new, fi)
                    hp = jnp.where(C, h_new, hp)

                    if with_ring:
                        packed = (h_new << 16) + (r_iota + w0)
                        packed = jnp.where(C, packed,
                                           jnp.int32(INT32_MIN))
                        pe = jnp.concatenate(
                            [packed,
                             jnp.full((8, LN), INT32_MIN, _I32)],
                            axis=0,
                        )
                        if k:
                            pe = _shift_down(pe, k, INT32_MIN)
                        gacc = jnp.maximum(gacc, pe)
                hprev[:, :] = hp
                fst[:, :] = fi
                if with_ring:
                    seg = pl.ds(pl.multiple_of(8, 8), RW + 8)
                    ring[seg, :] = jnp.maximum(ring[seg, :], gacc)
                return (ms, mr, mq, term, diags)

            z0 = jnp.zeros((1, LN), _I32)
            ms, mr, mq, term, diags = jax.lax.fori_loop(
                0, NCOLS // 8, group, (z0, z0, z0, z0, z0)
            )
            # xor the previous rep's output in: forces the in-jit
            # rep loop to serialize (the carry is a real data dep)
            out_ref[0:1, :] = ms ^ prev_ref[0:1, :]
            out_ref[1:2, :] = mr ^ prev_ref[1:2, :]
            out_ref[2:3, :] = mq ^ prev_ref[2:3, :]
            out_ref[3:4, :] = diags ^ prev_ref[3:4, :]

        pl.run_scoped(
            run,
            hprev=pltpu.VMEM((RW, LN), _I32),
            fst=pltpu.VMEM((RW, LN), _I32),
            tmw=pltpu.VMEM((RW, LN), _I32),
            ring=pltpu.VMEM((RING, LN), _I32),
        )

    return kernel


def run_variant(name, RW, G, ncols, with_chain=True, n_prefix=None,
                with_ring=True, reps=8):
    """In-jit rep protocol: the serving tunnel charges a large,
    NOISY per-dispatch overhead (~25 ms, serialized — measured
    2026-08-19), so reps run inside ONE jit via a fori_loop whose
    carry feeds the pallas kernel (a real data dep: out ^= prev).
    Two rep counts give a slope that cancels the remaining fixed
    cost of the single dispatch."""
    if n_prefix is None:
        n_prefix = max(1, int(np.ceil(np.log2(RW))))
    QRES = 512
    kernel = make_kernel(RW, ncols, QRES, with_chain, n_prefix,
                         with_ring)
    meta = np.full((2, G * LN), ncols, np.int32)
    qmat = np.zeros((QRES, G * LN), np.int32)

    def call(meta, qmat, prev):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((2, LN), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QRES, LN), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, LN), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, LN), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, G * LN), _I32),
        )(meta, qmat, prev)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(meta, qmat, n):
        return jax.lax.fori_loop(
            0, n, lambda i, acc: call(meta, qmat, acc),
            jnp.zeros((4, G * LN), _I32),
        )

    t0 = time.perf_counter()
    np.asarray(go(meta, qmat, reps))  # compile
    np.asarray(go(meta, qmat, reps // 2))
    tc = time.perf_counter() - t0

    def timeit(n):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(go(meta, qmat, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timeit(reps)
    t_half = timeit(reps // 2)
    dcols = G * ncols * (reps - reps // 2)
    ns_col = (t_full - t_half) / dcols * 1e9
    cells_col = LN * (2 * BW + 1)
    gcups = cells_col / ns_col
    print(f"{name:22s} RW={RW:5d} G={G}: {t_full*1e3:7.1f}/"
          f"{t_half*1e3:6.1f} ms {ns_col:8.1f} ns/col  -> "
          f"{gcups:6.1f} GCUPS-equiv (compile {tc:.0f}s)", flush=True)
    return ns_col, gcups


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ncols = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    print(f"banded column-sweep probe: G={G} blocks x {ncols} columns, "
          f"bw={BW}", flush=True)
    run_variant("full (chain fused)", 1568, G, ncols)
    run_variant("no chain", 1568, G, ncols, with_chain=False)
    run_variant("no prefix (E ablate)", 1568, G, ncols, n_prefix=1)
    run_variant("no ring", 1568, G, ncols, with_ring=False)
    run_variant("bare (no ring/prefix)", 1568, G, ncols, n_prefix=1,
                with_ring=False, with_chain=False)
    # RW scaling: spill/bandwidth wall shows super-linear ns/col
    run_variant("RW 768", 768, G, ncols)
    run_variant("RW 384", 384, G, ncols)


if __name__ == "__main__":
    main()
