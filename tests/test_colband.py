"""Banded column-sweep contract vs the oracle.

The NumPy banded column sweep (ops/colband.py) is the semantic
contract for the long-read Pallas kernel: on int16-safe inputs it must
reproduce align_one_sweep — scores, end positions, terminations —
bit-exactly, with the band/slice/chunk clipping ACTIVE (the regime
ops/colsweep.py's eligibility gate excludes).  The hole-detector
doubles as the proof obligation for the kernel's plain-weight E form:
it fires whenever a column's computed set is not one contiguous row
interval.
"""

import numpy as np
import pytest

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.colband import (
    align_one_colband_np,
    first_empty_slice,
)
from agatha_tpu.ops.kernel import int16_safe
from agatha_tpu.ops.packing import encode_padded
from agatha_tpu.ops.sweep import align_one_sweep

from .conftest import mutate, random_seq

CANON = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                    slice_width=3, z_threshold=400, band_width=751)
# Small bands against moderate lengths hit the same clip geometry as
# the canonical band against 10 kb reads, at test-speed sizes.
CONFIGS = [
    CANON,
    AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                slice_width=3, z_threshold=400, band_width=31),
    AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                slice_width=3, z_threshold=20, band_width=101),
    AlignConfig(match=2, mismatch=3, gap_open=5, gap_extend=1,
                slice_width=5, z_threshold=150, band_width=55),
    AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                slice_width=1, z_threshold=100, band_width=63),
    AlignConfig(match=3, mismatch=5, gap_open=4, gap_extend=2,
                slice_width=4, z_threshold=800, band_width=127),
]


def _pairs(rng, n=30, lo=8, hi=400):
    out = []
    for i in range(n):
        ql = int(rng.integers(lo, hi))
        q = random_seq(rng, ql, 0.03)
        if i % 3 == 0:
            t = random_seq(rng, int(rng.integers(lo, hi)), 0.03)
        else:
            t = mutate(rng, q)
        out.append((encode_padded(q), encode_padded(t), len(q), len(t)))
    return out


@pytest.mark.parametrize("cfg", CONFIGS)
def test_colband_matches_oracle(rng, cfg):
    assert int16_safe(cfg, max_len=1024)
    holes = []
    for p, (qc, tc, ql, rl) in enumerate(_pairs(rng)):
        exp = align_one_sweep(qc, tc, ql, rl, cfg)
        got = align_one_colband_np(qc, tc, ql, rl, cfg,
                                   collect_holes=holes)[:3]
        assert got == tuple(exp), (p, got, tuple(exp), ql, rl)
    assert not holes, (
        "computed column set not a single interval: plain-weight E "
        f"in the kernel would be wrong here ({len(holes)} columns, "
        f"first at j={holes[0][0] if holes else None})"
    )


def test_colband_adversarial_shapes(rng):
    """Extreme aspect ratios: rlen >> qlen + band and the converse
    (the regimes where the skewed-frame analysis found disconnected
    mask intervals in the DIAGONAL frame), plus empty-slice
    terminations and single-base edges."""
    shapes = [
        (8, 400), (400, 8), (16, 391), (391, 16), (1, 200), (200, 1),
        (9, 9), (64, 257), (257, 64), (120, 120), (33, 300), (300, 33),
    ]
    cfgs = [
        AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                    slice_width=3, z_threshold=400, band_width=31),
        AlignConfig(match=2, mismatch=3, gap_open=5, gap_extend=1,
                    slice_width=2, z_threshold=60, band_width=15),
        AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                    slice_width=3, z_threshold=400, band_width=751),
    ]
    holes = []
    for cfg in cfgs:
        for ql, rl in shapes:
            q = random_seq(rng, ql, 0.05)
            t = random_seq(rng, rl, 0.05)
            qc, tc = encode_padded(q), encode_padded(t)
            exp = align_one_sweep(qc, tc, ql, rl, cfg)
            got = align_one_colband_np(qc, tc, ql, rl, cfg,
                                       collect_holes=holes)[:3]
            assert got == tuple(exp), (cfg.band_width, ql, rl, got,
                                       tuple(exp))
    assert not holes, [(j,) for j, _m in holes[:5]]


def test_chain_scalars_matches_slice_loop(rng):
    """The vectorized first-empty-slice scan in chain_scalars equals
    the per-slice loop it replaced (round 5: the loop cost 24-65 ms of
    host time per bucket and serialized every colband dispatch).

    The loop reimplementation here is the pre-vectorization formula,
    kept as the executable spec.
    """
    from agatha_tpu.ops.colband import chain_scalars, slice_bounds_np

    def chain_scalars_loop(meta, cfg):
        sw, bw = cfg.slice_width, cfg.band_width
        meta = np.asarray(meta, np.int64)
        qlen, rlen = meta[:, 0], meta[:, 1]
        pql = -(-qlen // 8)
        prl = -(-rlen // 8)
        i_end = -(-(pql + prl - 1) // sw) * sw
        i_end8 = 8 * i_end
        end_p = i_end8 + 8
        i_max = int(i_end.max()) if meta.shape[0] else 0
        for islice in range(0, i_max, sw):
            ss, se = slice_bounds_np(islice, pql, prl, sw, bw)
            hit = (islice < i_end) & (ss > se) & (end_p == i_end8 + 8)
            end_p = np.where(hit, 8 * islice, end_p)
        out = np.zeros((8, meta.shape[0]), np.int32)
        out[0], out[1], out[2] = qlen, rlen, i_end8
        out[3], out[4] = qlen + rlen - 1, end_p
        return out

    for cfg in CONFIGS:
        # extreme aspect ratios reach empty slices; tiny pairs reach
        # the i_max == 0 path
        meta = np.stack([
            rng.integers(1, 800, 96),
            rng.integers(1, 800, 96),
        ], axis=1).astype(np.int32)
        meta[:8, 0] = 1
        meta[8:16, 1] = 1
        got = chain_scalars(meta, cfg)
        want = chain_scalars_loop(meta, cfg)
        assert np.array_equal(got, want), cfg
    assert chain_scalars(np.zeros((0, 2), np.int32), CANON).shape == (8, 0)


def test_colband_hits_empty_slice():
    """The empty-slice cap is reachable and reproduced: a target far
    longer than query + band terminates at a slice top."""
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=15)
    assert first_empty_slice(16, 600, cfg) is not None


def test_colband_n_codes(rng):
    """N bases score -N_PENALTY through the column frame too."""
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=63)
    q = random_seq(rng, 180, 0.2)
    t = mutate(rng, q)
    qc, tc = encode_padded(q), encode_padded(t)
    exp = align_one_sweep(qc, tc, len(q), len(t), cfg)
    got = align_one_colband_np(qc, tc, len(q), len(t), cfg)[:3]
    assert got == tuple(exp)


def test_device_colband_matches_oracle_interpret(rng):
    """Pallas banded column-sweep (interpret mode) vs the oracle,
    bucket-level, including diags parity vs align_bucket."""
    from agatha_tpu.ops.colband import align_bucket_colband
    from agatha_tpu.ops.kernel import align_bucket, build_bucket_arrays

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=63)
    pairs = _pairs(rng, n=24, lo=8, hi=300)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    got = np.asarray(
        align_bucket_colband(meta, tcodes, qfwd, cfg, interpret=True)
    )
    exp = np.asarray(
        align_bucket(meta, tcodes, qfwd, cfg, interpret=True)
    )
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        sc = align_one_sweep(qc, tc, ql, rl, cfg)
        assert tuple(got[p, :3]) == tuple(sc), (p, ql, rl, got[p], sc)
    assert (got == exp).all(), np.argwhere(got != exp)


def test_device_colband_tight_z_and_empty_slice_interpret(rng):
    """Terminations: tight Z-drop + shapes that hit the empty-slice
    cap, through the fused vectorized chain."""
    from agatha_tpu.ops.colband import align_bucket_colband
    from agatha_tpu.ops.kernel import align_bucket, build_bucket_arrays

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=20, band_width=31)
    pairs = []
    for ql, rl in [(16, 600), (600, 16), (200, 200), (64, 257),
                   (1, 100), (100, 1), (300, 33), (33, 300)]:
        q = random_seq(rng, ql, 0.05)
        t = random_seq(rng, rl, 0.05)
        pairs.append((encode_padded(q), encode_padded(t), ql, rl))
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    got = np.asarray(
        align_bucket_colband(meta, tcodes, qfwd, cfg, interpret=True)
    )
    exp = np.asarray(
        align_bucket(meta, tcodes, qfwd, cfg, interpret=True)
    )
    assert (got == exp).all(), np.argwhere(got != exp)
