"""Wave-interleave probe: can independent pair-blocks hide the
short-read shuffle latency?

PERF_NOTES (round 3, short-read section) shows narrow-width programs
are shuffle-LATENCY-bound: per-substep wall at (B, 256) is ~flat in B
while the same op mix at (8, 1024) costs ~2.6x less per lane-cell —
the three chained per-substep rolls plus the cross-lane reduce expose
their full latency because one substep's rolls depend on the previous
substep's outputs.  Raising B adds tiles to the SAME serial chain.

This probe measures the one transform that attacks the chain without
touching semantics: run N INDEPENDENT pair-blocks ("waves") inside one
program and interleave their substeps in program order —

    for k in 0..7:  for wave in 0..N-1:  substep(wave, k)

Wave w's substep k has no data dependence on wave w-1's substep k, so
consecutive instruction bundles are independent and the issue slots
that sat idle behind a roll's latency fill with the other waves' ALU
work.  Each wave runs the EXACT production substep (same DP core, mask
formulas computed per wave from that wave's own pair lengths,
injections, packed-max reduce, z-drop bookkeeping chain as
skew_probe.make_current) — a production implementation is the same
kernel code instantiated N times over disjoint VMEM scratch, i.e. a
pure bit-exactness-preserving transform.  Per-wave lengths are offset
(qlen+w) so the compiler cannot CSE the per-wave mask chains the way
it never could in production (each wave holds different pairs).

Usage: python scripts/wave_probe.py [G] [DIAGS]
Reports ns/substep/wave for waves=1,2,4 at (32,256) [the production
short-read shape] plus a (64,256) single-wave control (the flat-B
finding) and the implied 150 bp read rate.
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
LANE = 128
SW = 3
BW = 751
GOE, GE = 8, 2
MATCH, MISM = 1, 4
Z = 400
N_VALUE = 14
N_PENALTY = 1
INT32_MIN = -(2 ** 31)
MINUS_INF2 = -16384


def _ctrunc16(t):
    return jnp.where(t >= 0, t >> 4, -((-t) >> 4))


def _roll1(x):
    return pltpu.roll(x, shift=1, axis=1)


def _core(qwin, tb, htl, e_in, f_in, C, r, d, carry):
    """The exact production DP core + bookkeeping (kernel.py _inner)."""
    ms, mr, mq, term, diags = carry
    t_is_n = tb == N_VALUE
    sub_m = jnp.where(t_is_n, -N_PENALTY, MATCH)
    sub_x = jnp.where(t_is_n, -N_PENALTY, -MISM)
    s = jnp.where(qwin == tb, sub_m, sub_x)
    s = jnp.where(qwin == N_VALUE, -N_PENALTY, s)
    temp = htl + s
    h_new = jnp.maximum(jnp.maximum(temp, f_in), e_in)
    tg = temp - GOE
    f_out = jnp.where(C, jnp.maximum(tg, f_in - GE), f_in)
    e_out = jnp.where(C, jnp.maximum(tg, e_in - GE), e_in)
    h_out = jnp.where(C, h_new, htl)
    packed = (h_new << 16) + r
    packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
    dmax = jnp.max(packed, axis=1, keepdims=True)
    live = term == 0
    th = dmax >> 16
    tr = dmax & 0xFFFF
    dq = d - tr
    upd = live & (th > ms)
    zel = live & ~(th > ms) & (tr >= mr) & (dq >= mq)
    gap = jnp.abs((tr - mr) - (dq - mq))
    term = jnp.where(zel & (ms - th > Z + gap * GE), 1, term)
    ms = jnp.where(upd, th, ms)
    mr = jnp.where(upd, tr, mr)
    mq = jnp.where(upd, dq, mq)
    diags = diags + live.astype(_I32)
    return h_out, e_out, f_out, (ms, mr, mq, term, diags)


def make_waves(B, W, n_waves, n_diags):
    """n_waves independent (B, W) blocks, substeps interleaved.

    Every per-pair quantity (lengths, chunk bounds, slice membership,
    per-substep masks) is computed separately per wave from that
    wave's own (offset) lengths — the honest production op count.
    """

    def kernel(meta_ref, out_ref, *scratch):
        per = 6
        waves = [scratch[w * per:(w + 1) * per] for w in range(n_waves)]
        qfws = scratch[n_waves * per:]
        lane = jax.lax.broadcasted_iota(_I32, (B, W), 1)
        lane0 = lane == 0
        zeros = jnp.zeros((B, 1), _I32)

        r = lane
        pr = r >> 3
        ro = r & 7
        two_r = r << 1

        # per-wave pair metadata (offset lengths defeat CSE, exactly
        # as distinct pairs do in production) + per-wave hoistables
        wqlen, wrlen, wpql, wprl = [], [], [], []
        wcs, wce, wfake, wprev_fake = [], [], [], []
        for w in range(n_waves):
            qlen = meta_ref[:, 0:1] + w
            rlen = meta_ref[:, 1:2] + w
            wqlen.append(qlen)
            wrlen.append(rlen)
            wpql.append((qlen + 7) >> 3)
            wprl.append((rlen + 7) >> 3)
            wcs.append(jnp.maximum(0, (pr << 3) - BW) >> 3)
            wce.append(
                jnp.minimum(wpql[w] - 1, ((pr << 3) + (7 + BW)) >> 3)
            )
            wfake.append(r >= rlen)
            wprev_fake.append(r > rlen)

        for w, (hfa, hfb, fst_r, est_r, qwin_r, tb_r) in enumerate(waves):
            hfa[:, :] = lane + w
            hfb[:, :] = lane + 1 + w
            fst_r[:, :] = jnp.full((B, W), MINUS_INF2, _I32)
            est_r[:, :] = jnp.full((B, W), MINUS_INF2, _I32)
            qwin_r[:, :] = (lane + w) & 3
            tb_r[:, :] = ((lane + w) >> 2) & 3
            qfws[w][:, :] = (
                jax.lax.broadcasted_iota(_I32, (B, 3 * LANE), 1) + w
            ) & 3

        def slice_bounds(i, pql, prl):
            ss = jnp.maximum(
                jnp.maximum(0, i - pql + 1), _ctrunc16((i << 3) + (8 - BW))
            )
            se = jnp.minimum(
                jnp.minimum(prl - 1, i + (SW - 1)),
                _ctrunc16((i << 3) + (8 * (SW - 1) + 7 + BW)),
            )
            return ss, se

        def inner(carry):
            d8, i1, kph = carry[0], carry[1], carry[2]
            bks = list(carry[3])
            D = d8 >> 3
            phase = d8 & 127
            i2 = jnp.where(kph == 0, i1 - SW, i1)

            # per-wave hoisted block (per packed diagonal in prod)
            feeds, hoist = [], []
            for w in range(n_waves):
                feed = qfws[w][:, pl.ds(pl.multiple_of(0, LANE), LANE)]
                feeds.append(pltpu.roll(feed, shift=LANE - phase, axis=1))
                ss1, se1 = slice_bounds(i1, wpql[w], wprl[w])
                ss2, se2 = slice_bounds(i2, wpql[w], wprl[w])
                insl_a = (pr >= ss1) & (pr <= se1)
                insl_b = (pr >= ss2) & (pr <= se2)
                pq_a = D - pr
                pq_b = pq_a - 1
                x_a = insl_a & (pq_a >= wcs[w]) & (pq_a <= wce[w])
                x_b = insl_b & (pq_b >= wcs[w]) & (pq_b <= wce[w])
                y_a = x_a & (pq_a > wcs[w]) & (pq_a < wce[w])
                y_b = x_b & (pq_b > wcs[w]) & (pq_b < wce[w])
                cse_a = pq_a == jnp.maximum(wcs[w], i1 - pr)
                hoist.append((x_a, x_b, y_a, y_b, cse_a))
            base_qq = d8 - r
            base_band = d8 - two_r

            for k in range(8):
                d = d8 + k
                cls = ro > k
                ncls = ro <= k
                qq_ge0 = base_qq >= -k
                in_band = jnp.abs(base_band + k) <= BW

                for w, (hfa, hfb, fst_r, est_r, qwin_r, tb_r) in (
                        enumerate(waves)):
                    x_a, x_b, y_a, y_b, cse_a = hoist[w]
                    valid = qq_ge0 & (base_qq < wqlen[w] - k)
                    z_a = y_a | (x_a & in_band)
                    z_b = y_b | (x_b & in_band)
                    C = valid & ((cls & z_b) | (ncls & z_a))
                    cst = (ro == k) & qq_ge0 & cse_a

                    hf1_ref, hf2_ref = (
                        (hfa, hfb) if k % 2 == 0 else (hfb, hfa)
                    )
                    qwin = jnp.where(lane0, feeds[w][:, k:k + 1],
                                     _roll1(qwin_r[:, :]))
                    qwin_r[:, :] = qwin
                    htl = _roll1(hf2_ref[:, :])
                    htl = jnp.where(lane0, jnp.int32(MINUS_INF2), htl)
                    htl = jnp.where(cst & wprev_fake[w], MINUS_INF2, htl)
                    e_in = est_r[:, :]
                    e_in = jnp.where(lane0, jnp.int32(MINUS_INF2), e_in)
                    f_in = fst_r[:, :]
                    f_in = jnp.where(cst & wfake[w], MINUS_INF2, f_in)

                    h_out, e_out, f_out, bks[w] = _core(
                        qwin, tb_r[:, :], htl, e_in, f_in, C, r, d,
                        bks[w],
                    )
                    hf2_ref[:, :] = h_out
                    est_r[:, :] = _roll1(e_out)
                    fst_r[:, :] = f_out
            kph = kph + 1
            wrap = kph >= SW
            return (d8 + 8, jnp.where(wrap, i1 + SW, i1),
                    jnp.where(wrap, 0, kph), tuple(bks))

        init_bk = tuple(
            (zeros, zeros, zeros, zeros, zeros) for _ in range(n_waves)
        )
        final = jax.lax.while_loop(
            lambda c: c[0] < 8 * n_diags, lambda c: inner(c),
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), init_bk),
        )
        bks = final[3]
        # fold every wave's bookkeeping into the output (keeps all
        # waves live against DCE)
        ms = bks[0][0]
        mr = bks[0][1]
        mq = bks[0][2]
        dg = bks[0][4]
        for w in range(1, n_waves):
            ms = jnp.maximum(ms, bks[w][0])
            mr = jnp.maximum(mr, bks[w][1])
            mq = jnp.maximum(mq, bks[w][2])
            dg = dg + bks[w][4]
        out_ref[:, 0:1] = ms
        out_ref[:, 1:2] = mr
        out_ref[:, 2:3] = mq
        out_ref[:, 3:4] = dg

    return kernel


def run_variant(name, B, W, n_waves, G, n_diags):
    scratch = []
    for _ in range(n_waves):
        scratch += [pltpu.VMEM((B, W), _I32) for _ in range(6)]
    scratch += [pltpu.VMEM((B, 3 * LANE), _I32) for _ in range(n_waves)]
    kernel = make_waves(B, W, n_waves, n_diags)
    meta = np.full((G * B, 2), 150, np.int32)

    import os
    interp = bool(os.environ.get("AGATHA_PROBE_INTERPRET"))

    @jax.jit
    def go(meta):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((B, 2), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, 4), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * B, 4), _I32),
            scratch_shapes=scratch,
            interpret=interp,
        )(meta)

    np.asarray(go(meta))  # compile
    REPS = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [go(meta) for _ in range(REPS)]
        for o in outs:
            np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / REPS)
    substeps = G * n_diags * 8 * n_waves  # per-wave substeps
    ns = best / substeps * 1e9
    # implied 150 bp rate: a 150x150 pair sweeps ~2*ceil(150/8)*8+8
    # base antidiagonals = ~312 substeps; pairs/substep = B per wave
    rate = B * n_waves * G / (best * 312.0 / (n_diags * 8))
    print(f"{name:16s} B={B:3d} W={W:4d} waves={n_waves}: "
          f"{best*1e3:7.1f} ms  {ns:6.1f} ns/substep/wave  "
          f"implied {rate/1e3:6.1f} k reads/s", flush=True)
    return ns


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_diags = int(sys.argv[2]) if len(sys.argv) > 2 else 312 // 8
    print(f"G={G} programs x {n_diags} packed diagonals "
          "(x8 substeps each)", flush=True)
    base = run_variant("base (prod map)", 32, 256, 1, G * 4, n_diags)
    ctrl = run_variant("B-sweep control", 64, 256, 1, G * 2, n_diags)
    w2 = run_variant("wave2", 32, 256, 2, G * 2, n_diags)
    w4 = run_variant("wave4", 32, 256, 4, G, n_diags)
    w2b64 = run_variant("wave2 B=64", 64, 256, 2, G, n_diags)
    for name, v in (("ctrl(B=64)", ctrl), ("wave2", w2), ("wave4", w4),
                    ("wave2 B=64", w2b64)):
        print(f"{name:12s}/base per-substep-wave ratio: {v/base:.3f} "
              f"({'WIN' if v < base else 'LOSS'} "
              f"{abs(1 - v/base)*100:.1f}%)")


if __name__ == "__main__":
    main()
