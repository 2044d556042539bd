"""Timing probes: which part of the while-body costs what.

Run on the real chip: python scripts/perf_probe.py
Variants (cumulative ablations of the real kernel structure):
  full      — the real kernel (import from ops.kernel)
  noreload  — feed reload cond removed (wrong results; timing only)
  nobook    — per-pair bookkeeping removed, fixed-trip fori_loop
  nomask    — band/slice/chunk masks replaced by `valid` only
  core      — DP core only (temp/h/e/f updates + rolls), fori_loop
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, W = 8, 1024
QF = 2560
STEPS = 2048
I32 = jnp.int32
MINUS_INF2 = -16384
INT32_MIN = -(2 ** 31)


def trunc16(x):
    return (x << 16) >> 16


def ctrunc16(t):
    return jnp.where(t >= 0, t >> 4, -((-t) >> 4))


def make(variant):
    sw, bw, z, goe, ge, match, mism = 3, 751, 400, 6, 2, 1, 4
    P8 = 8 * sw

    def kernel(meta_ref, tcodes_ref, qfwd_ref, out_ref):
        qlen = meta_ref[:, 0:1]
        rlen = meta_ref[:, 1:2]
        pql = (qlen + 7) >> 3
        prl = (rlen + 7) >> 3
        n_diags = qlen + rlen - 1
        i_end8 = (((prl + pql - 1 + sw - 1) // sw) * sw) << 3
        end_p = i_end8 + 8

        def slice_bounds(i):
            ss = jnp.maximum(jnp.maximum(0, i - pql + 1),
                             ctrunc16((i << 3) + (8 - bw)))
            se = jnp.minimum(jnp.minimum(prl - 1, i + (sw - 1)),
                             ctrunc16((i << 3) + (8 * (sw - 1) + 7 + bw)))
            return ss, se

        r = jax.lax.broadcasted_iota(I32, (B, W), 1)

        def derep(x):
            si = jax.lax.broadcasted_iota(I32, x.shape, 0)
            return jnp.minimum(x, si + jnp.int32(0x3FFFFFFF))

        col0 = r == 0
        pr = r >> 3
        ro = r & 7
        two_r = r << 1
        blk_first = ro == 0
        cs = jnp.maximum(0, (pr << 3) - bw) >> 3
        ce = jnp.minimum(pql - 1, ((pr << 3) + (7 + bw)) >> 3)
        fake = r >= rlen
        prev_fake = r > rlen
        kb = trunc16(-(goe + ge * r))
        left_h0 = derep(jnp.where(r <= bw, kb, jnp.int32(MINUS_INF2)))
        left_f0 = derep(jnp.where(r <= bw, trunc16(kb - goe),
                                  jnp.int32(MINUS_INF2)))
        tb = tcodes_ref[:, :]
        t_is_n = tb == 14
        zeros = jnp.zeros((B, 1), I32)

        def top_h(col):
            k = trunc16(-(goe + ge * col))
            v = jnp.where(col <= bw, k, MINUS_INF2)
            return jnp.where(col < 0, 0, v)

        def top_e(col):
            k = trunc16(-(goe + ge * col))
            return jnp.where(col <= bw, trunc16(k - goe), MINUS_INF2)

        def body_fn(carry):
            (d, hf1, hf2, fst, est, qwin, feed, ms, mr, mq, term,
             diags) = carry
            a = d & 7
            D = d >> 3

            if variant not in ("noreload", "core"):
                da = (d >> 7) << 7
                feed = jax.lax.cond(
                    d == da,
                    lambda: qfwd_ref[:, pl.ds(pl.multiple_of(da, 128), 128)],
                    lambda: feed,
                )
            roll1 = (lambda x: x) if variant in ("noroll", "nothing") \
                else (lambda x: pltpu.roll(x, shift=1, axis=1))
            qwin = jnp.where(col0, feed[:, 0:1], roll1(qwin))
            qb = qwin

            if variant in ("full", "noreload", "nobook", "nomask_off"):
                i1 = (D // sw) * sw
                i2 = ((D - 1) // sw) * sw
                ss1, se1 = slice_bounds(i1)
                ss2, se2 = slice_bounds(i2)
                cls = ro > a
                i_cell = jnp.where(cls, i2, i1)
                in_slice = (pr >= jnp.where(cls, ss2, ss1)) & (
                    pr <= jnp.where(cls, se2, se1))
                qq = d - r
                valid = (qq >= 0) & (qq < qlen)
                pq = (D - pr) - cls.astype(I32)
                in_chunk = (pq >= cs) & (pq <= ce)
                interior = (pq > cs) & (pq < ce)
                in_band = jnp.abs(d - two_r) <= bw
                C = valid & in_slice & in_chunk & (interior | in_band)
                cst = (ro == a) & (qq >= 0) & (
                    pq == jnp.maximum(cs, i_cell - pr))
            else:
                qq = d - r
                C = (qq >= 0) & (qq < qlen)
                cst = (ro == a) & (qq >= 0)

            htl = roll1(hf2)
            htl = jnp.where(col0, top_h(d - 1), htl)
            htl = jnp.where(blk_first | cst, trunc16(htl), htl)
            htl = jnp.where(cst & prev_fake, jnp.int32(MINUS_INF2), htl)
            e_in = jnp.where(blk_first, trunc16(est), est)
            e_in = jnp.where(col0, top_e(d), e_in)
            f_in = jnp.where(cst, trunc16(fst), fst)
            f_in = jnp.where(cst & fake, jnp.int32(MINUS_INF2), f_in)

            s = jnp.where(qb == tb, match, -mism)
            s = jnp.where((qb == 14) | t_is_n, -1, s)
            temp = htl + s
            h_new = jnp.maximum(jnp.maximum(temp, f_in), e_in)
            tg = temp - goe
            f_nx = jnp.where(C, jnp.maximum(tg, f_in - ge), f_in)
            e_nx = jnp.where(C, jnp.maximum(tg, e_in - ge), e_in)
            hf2n = hf1
            hf1n = jnp.where(C, h_new, hf1)
            estn = roll1(e_nx)
            feedn = feed if variant in ("noroll", "nothing") \
                else pltpu.roll(feed, shift=127, axis=1)

            packed = (h_new << 16) + r
            packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
            if variant == "nothing":
                dmax = packed[:, 0:1]
            else:
                dmax = jnp.max(packed, axis=1, keepdims=True)

            if variant in ("full", "noreload"):
                live = (term == 0) & (d < end_p)
                at_ss = jax.lax.rem(d, P8) == 0
                islice = d >> 3
                ss_sl, se_sl = slice_bounds(islice)
                term = jnp.where(live & at_ss & (d < i_end8) &
                                 (ss_sl > se_sl), 1, term)
                live2 = (term == 0) & (d < end_p)
                gate = live2 & (((d < i_end8) & (d < n_diags)) |
                                (d >= i_end8))
                th = dmax >> 16
                tr = dmax & 0xFFFF
                dq = d - tr
                upd = gate & (th > ms)
                zel = gate & ~(th > ms) & (tr >= mr) & (dq >= mq)
                gap = jnp.abs((tr - mr) - (dq - mq))
                term = jnp.where(zel & (ms - th > z + gap * ge), 1, term)
                ms = jnp.where(upd, th, ms)
                mr = jnp.where(upd, tr, mr)
                mq = jnp.where(upd, dq, mq)
                diags = diags + live.astype(I32)
            else:
                th = dmax >> 16
                ms = jnp.maximum(ms, th)

            return (d + 1, hf1n, hf2n, f_nx, estn, qwin, feedn, ms, mr,
                    mq, term, diags)

        init = (jnp.int32(0), left_h0, left_h0, left_f0,
                derep(jnp.full((B, W), MINUS_INF2, I32)),
                derep(jnp.zeros((B, W), I32)),
                derep(jnp.zeros((B, 128), I32)),
                zeros, zeros, zeros, zeros, zeros)

        if variant in ("full", "noreload"):
            def cond(c):
                return jnp.any((c[10] == 0) & (c[0] < end_p))
            fin = jax.lax.while_loop(cond, body_fn, init)
        else:
            fin = jax.lax.fori_loop(
                0, STEPS, lambda i, c: body_fn(c), init)
        ms_f = fin[7]
        out_ref[:, 0:1] = ms_f
        out_ref[:, 1:2] = fin[8]
        out_ref[:, 2:3] = fin[9]
        out_ref[:, 3:4] = fin[11]

    return kernel


def run(variant, reps=5):
    kernel = make(variant)
    meta = np.full((B, 2), 1020, np.int32)
    rng = np.random.default_rng(0)
    tcodes = rng.integers(1, 8, size=(B, W)).astype(np.int32)
    qfwd = rng.integers(1, 8, size=(B, QF)).astype(np.int32)
    f = pl.pallas_call(
        make(variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4), I32),
    )
    f = jax.jit(f)
    out = np.asarray(f(meta, tcodes, qfwd))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(meta, tcodes, qfwd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    us_per_step = dt / STEPS * 1e6
    print(f"{variant:18s} {dt*1e3:8.2f} ms  {us_per_step:7.3f} us/step")


if __name__ == "__main__":
    variants = sys.argv[1:] or [
        "full", "noreload", "nobook", "nomask", "core",
    ]
    for v in variants:
        run(v)
