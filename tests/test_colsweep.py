"""Column-sweep (inter-sequence) formulation vs the oracle.

The NumPy column-sweep (ops/colsweep.py) is the semantic contract for
the short-read Pallas kernel: on eligible inputs (band covers every
packed diagonal, int16-safe) it must reproduce align_one_sweep —
scores, end positions, and terminations — bit-exactly, including
fake-row pollution and the Z-drop wrap-up pass.
"""

import numpy as np
import pytest

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.colsweep import (
    align_one_colsweep_np,
    colsweep_eligible,
)
from agatha_tpu.ops.kernel import int16_safe
from agatha_tpu.ops.packing import encode_padded
from agatha_tpu.ops.sweep import align_one_sweep

from .conftest import mutate, random_seq

CANON = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                    slice_width=3, z_threshold=400, band_width=751)
CONFIGS = [
    CANON,
    # tight z: forces terminations inside slices and at wrap-up
    AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                slice_width=3, z_threshold=20, band_width=751),
    # different scoring + slice width
    AlignConfig(match=2, mismatch=3, gap_open=5, gap_extend=1,
                slice_width=5, z_threshold=150, band_width=911),
]


def _rand_pairs(rng, cfg, n=40, lo=8, hi=170):
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
def test_colsweep_matches_oracle(rng, cfg):
    pairs = _rand_pairs(rng, cfg)
    meta = np.array([[ql, rl] for _q, _t, ql, rl in pairs], np.int32)
    assert int16_safe(cfg, max_len=512)
    assert colsweep_eligible(meta, cfg, True)
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        exp = align_one_sweep(qc, tc, ql, rl, cfg)
        got = align_one_colsweep_np(qc, tc, ql, rl, cfg)[:3]
        assert got == tuple(exp), (p, got, tuple(exp), ql, rl)


def test_colsweep_eligibility_boundary():
    # 8*tad + 8 == bw is eligible; one packed block more is not
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      band_width=88)
    ok = np.array([[40, 40]], np.int32)       # tad 9 -> 80 <= 88
    assert colsweep_eligible(ok, cfg, True)
    bad = np.array([[41, 48]], np.int32)      # tad 11 -> 96 > 88
    assert not colsweep_eligible(bad, cfg, True)
    assert not colsweep_eligible(ok, cfg, False)  # needs int16-safe


def test_device_colsweep_matches_oracle_interpret(rng):
    """Pallas sweep + skew + chain (interpret) vs the oracle."""
    from agatha_tpu.ops.colsweep import align_bucket_colsweep
    from agatha_tpu.ops.kernel import build_bucket_arrays

    cfg = CANON
    pairs = _rand_pairs(rng, cfg, n=24, lo=8, hi=170)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    out = np.asarray(
        align_bucket_colsweep(meta, tcodes, qfwd, cfg, interpret=True)
    )
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        exp = align_one_sweep(qc, tc, ql, rl, cfg)
        got = tuple(int(v) for v in out[p, :3])
        assert got == tuple(exp), (p, got, tuple(exp), ql, rl)


def test_device_colsweep_matches_align_bucket_interpret(rng):
    """Full-row parity (incl. diags accounting) vs the main kernel."""
    from agatha_tpu.ops.colsweep import align_bucket_colsweep
    from agatha_tpu.ops.kernel import align_bucket, build_bucket_arrays

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=25, band_width=751)
    pairs = _rand_pairs(rng, cfg, n=16, lo=8, hi=150)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    ref = np.asarray(align_bucket(meta, tcodes, qfwd, cfg,
                                  interpret=True))
    got = np.asarray(
        align_bucket_colsweep(meta, tcodes, qfwd, cfg, interpret=True)
    )
    n = len(pairs)
    assert (got[:n] == ref[:n]).all(), np.argwhere(
        (got[:n] != ref[:n]).any(axis=1)
    ).ravel()
