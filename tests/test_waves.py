"""Multi-wave interleaving is a pure program-order transform.

n_waves > 1 runs independent pair-blocks inside one program with their
substeps interleaved (short-read latency hiding, PERF_NOTES round 3).
Results must be bit-identical to the single-wave kernel for every wave
count, bucket size, and config class.  The production policy is
single-wave everywhere (the interleave measured as a regression on the
real kernel — see n_waves_for_width), so these tests are what keep the
explicit multi-wave mechanism correct.
"""

import numpy as np
import pytest

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.kernel import (
    align_bucket,
    build_bucket_arrays,
    n_waves_for_width,
    window_width,
)
from agatha_tpu.ops.packing import encode_padded

from .conftest import mutate, random_seq

CANON = AlignConfig(
    match=1, mismatch=4, gap_open=6, gap_extend=2,
    slice_width=3, z_threshold=400, band_width=751,
)


def _pairs(rng, n, lo, hi):
    out = []
    for i in range(n):
        ql = int(rng.integers(lo, hi))
        q = random_seq(rng, ql, 0.02)
        t = mutate(rng, q) if i % 2 == 0 else random_seq(
            rng, int(rng.integers(lo, hi)), 0.02
        )
        out.append((encode_padded(q), encode_padded(t), len(q), len(t)))
    return out


@pytest.mark.parametrize("lo,hi", [(100, 160), (40, 500)])
def test_waves_bit_identical(rng, lo, hi):
    pairs = _pairs(rng, 24, lo, hi)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, CANON)
    base = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True, n_waves=1)
    )
    for nw in (2, 4):
        got = np.asarray(
            align_bucket(meta, tcodes, qfwd, CANON, interpret=True,
                         n_waves=nw)
        )
        assert (got == base).all(), f"n_waves={nw}"


def test_waves_non_dividing_bucket_lowers(rng):
    # 8 rows cannot host 4 waves of >= 8 rows each: the impl must lower
    # the wave count rather than fail.
    pairs = _pairs(rng, 7, 80, 140)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, CANON)
    meta, tcodes, qfwd = meta[:8], tcodes[:8], qfwd[:8]
    base = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True, n_waves=1)
    )
    got = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True, n_waves=4)
    )
    assert (got == base).all()


def test_waves_partial_lowering(rng):
    # 16 rows with n_waves=4 lowers 4 -> 2 (not all the way to 1):
    # the partially-lowered multi-wave path must stay bit-identical.
    pairs = _pairs(rng, 16, 80, 140)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, CANON)
    meta, tcodes, qfwd = meta[:16], tcodes[:16], qfwd[:16]
    base = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True, n_waves=1)
    )
    got = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True, n_waves=4)
    )
    assert (got == base).all()


def test_wave_policy_bounds():
    # measured policy (PERF_NOTES round 3): single-wave EVERYWHERE —
    # production waves regressed 12-13% at the narrow widths the
    # hypothesis targeted, despite the mini-probe win
    assert n_waves_for_width(window_width(CANON) + 128, windowed=True) == 1
    assert n_waves_for_width(1024) == 1
    assert n_waves_for_width(256) == 1
    assert n_waves_for_width(512) == 1


def test_waves_windowed_bit_identical(rng):
    # small band -> small window so the sliding-window variant triggers
    # on short targets (fast interpret trace); the shift decision is
    # shared across waves, only the state shifts replicate
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=90)
    pairs = _pairs(rng, 16, 700, 1000)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    w = tcodes.shape[1] * (2 if tcodes.dtype == np.uint8 else 1)
    assert w > window_width(cfg), "workload must exercise the window"
    base = np.asarray(
        align_bucket(meta, tcodes, qfwd, cfg, interpret=True, n_waves=1)
    )
    got = np.asarray(
        align_bucket(meta, tcodes, qfwd, cfg, interpret=True, n_waves=2)
    )
    assert (got == base).all()


def test_waves_emit_flags_bitmap_identical(rng):
    # each wave DMAs its own flag planes to its own bitmap rows, so
    # (results, bitmap, CIGAR move words) must all match single-wave
    import jax.numpy as jnp

    from agatha_tpu.ops.kernel import _align_bucket_jit, flag_planes_needed
    from agatha_tpu.ops.walk import align_bucket_traceback

    pairs = _pairs(rng, 16, 80, 200)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, CANON)
    w = tcodes.shape[1] * (2 if tcodes.dtype == np.uint8 else 1)
    qf = qfwd.shape[1] * (2 if qfwd.dtype == np.uint8 else 1)
    planes = flag_planes_needed(meta, CANON)
    outs, bitmaps = {}, {}
    for nw in (1, 2):
        o, f = _align_bucket_jit(
            jnp.asarray(meta, jnp.int32), jnp.asarray(tcodes),
            jnp.asarray(qfwd), cfg=CANON, w=w, qf=qf, safe16=True,
            interpret=True, emit_flags=True, d8_planes=planes,
            n_waves=nw,
        )
        outs[nw], bitmaps[nw] = np.asarray(o), np.asarray(f)
    assert (outs[1] == outs[2]).all()
    # compare only the planes a pair actually swept: slack planes past
    # each pair's own sweep hold whatever the staging buffer last held
    # (never read by the walk)
    pql = -(-meta[:, 0] // 8)
    prl = -(-meta[:, 1] // 8)
    i_end = -(-(pql + prl - 1) // CANON.slice_width) * CANON.slice_width
    b1 = bitmaps[1].reshape(meta.shape[0], planes, -1)
    b2 = bitmaps[2].reshape(meta.shape[0], planes, -1)
    for p in range(meta.shape[0]):
        lim = int(i_end[p]) + 1
        assert (b1[p, :lim] == b2[p, :lim]).all(), f"pair {p}"
    # end-to-end: the full device-traceback pipeline agrees as well
    o1, w1 = align_bucket_traceback(meta, tcodes, qfwd, CANON,
                                    interpret=True)
    assert (np.asarray(o1) == outs[1]).all()


def test_waves_strict_strip_path(rng):
    # force_strips exercises the int16 strip round-trips under waves
    pairs = _pairs(rng, 16, 60, 200)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, CANON)
    base = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True,
                     force_strips=True, n_waves=1)
    )
    got = np.asarray(
        align_bucket(meta, tcodes, qfwd, CANON, interpret=True,
                     force_strips=True, n_waves=2)
    )
    assert (got == base).all()
