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
    # tight gate: bw >= max(qlen-1, 8*ceil(rlen/8)-1)
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      band_width=88)
    ok = np.array([[89, 88]], np.int32)   # q-1=88, 8*11-1=87 <= 88
    assert colsweep_eligible(ok, cfg, True)
    assert not colsweep_eligible(
        np.array([[90, 88]], np.int32), cfg, True)  # qlen-1 = 89 > 88
    assert not colsweep_eligible(
        np.array([[89, 89]], np.int32), cfg, True)  # 8*12-1 = 95 > 88
    assert not colsweep_eligible(ok, cfg, False)  # needs int16-safe


def test_colsweep_exact_at_eligibility_boundary(rng):
    """Pairs exactly at the gate (band == max(qlen-1, 8*prl-1)) must
    still be bit-exact — the derivation's worst cases live here."""
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=60, band_width=88)
    for ql, rl in [(89, 88), (89, 81), (12, 88), (89, 10), (88, 88)]:
        for _ in range(4):
            q = random_seq(rng, ql, 0.02)
            t = (mutate(rng, q) + random_seq(rng, rl))[:rl]
            qc, tc = encode_padded(q), encode_padded(t)
            assert colsweep_eligible(
                np.array([[len(q), len(t)]]), cfg, True)
            exp = align_one_sweep(qc, tc, len(q), len(t), cfg)
            got = align_one_colsweep_np(qc, tc, len(q), len(t), cfg)[:3]
            assert got == tuple(exp), (ql, rl, got, tuple(exp))


def test_colsweep_midlength_matches_oracle(rng):
    """The widened regime (300-740 bp at the canonical band): slice
    and chunk clipping are active in the reference formulation here
    (8*tad+8 > band), yet provably vacuous cell-wise."""
    pairs = []
    for n in [200, 299, 300, 450, 600, 601, 740, 752]:
        q = random_seq(rng, n, 0.02)
        t = mutate(rng, q)[:752]
        pairs.append((encode_padded(q), encode_padded(t), len(q),
                      len(t)))
    meta = np.array([[ql, rl] for _q, _t, ql, rl in pairs], np.int32)
    assert colsweep_eligible(meta, CANON, True)
    # these lengths exceed the OLD 8*tad+8 gate — the point of the test
    tad = -(-meta[:, 0] // 8) + -(-meta[:, 1] // 8) - 1
    assert (8 * tad.max() + 8) > CANON.band_width
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        exp = align_one_sweep(qc, tc, ql, rl, CANON)
        got = align_one_colsweep_np(qc, tc, ql, rl, CANON)[:3]
        assert got == tuple(exp), (p, got, tuple(exp), ql, rl)


def test_device_colsweep_midlength_interpret(rng):
    """Pallas path on ~600 bp pairs (widened regime)."""
    from agatha_tpu.ops.colsweep import align_bucket_colsweep
    from agatha_tpu.ops.kernel import build_bucket_arrays

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=100, band_width=751)
    pairs = []
    for n in [480, 600, 740]:
        q = random_seq(rng, n, 0.02)
        t = mutate(rng, q)[:752]
        pairs.append((encode_padded(q), encode_padded(t), len(q),
                      len(t)))
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    out = np.asarray(
        align_bucket_colsweep(meta, tcodes, qfwd, cfg, interpret=True)
    )
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        exp = align_one_sweep(qc, tc, ql, rl, cfg)
        got = tuple(int(v) for v in out[p, :3])
        assert got == tuple(exp), (p, got, tuple(exp), ql, rl)


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


def test_engine_routes_shortreads_through_colsweep(rng, monkeypatch):
    """Short-read buckets take the column-sweep path; results are
    bit-identical to the engine with colsweep disabled (which routes
    through the sharded antidiagonal kernel on the 8-device mesh)."""
    import agatha_tpu.ops.colsweep as csmod
    from agatha_tpu.config import EngineConfig
    from agatha_tpu.engine import AlignEngine

    pairs = _rand_pairs(rng, CANON, n=48, lo=8, hi=170)
    calls = []
    real = csmod.align_bucket_colsweep

    def spy(*a, **kw):
        calls.append(kw.get("device"))
        return real(*a, **kw)

    monkeypatch.setattr(csmod, "align_bucket_colsweep", spy)
    eng = AlignEngine(CANON, EngineConfig(aligns_per_batch=16),
                      interpret=True)
    res = eng.align(pairs)
    assert calls, "colsweep path not taken for eligible buckets"
    # round-robin across the 8 local CPU devices
    assert len({d.id for d in calls if d is not None}) > 1

    off = AlignEngine(CANON, EngineConfig(aligns_per_batch=16,
                                          colsweep=False),
                      interpret=True).align(pairs)
    assert (res.scores == off.scores).all()
    assert (res.query_ends == off.query_ends).all()
    assert (res.target_ends == off.target_ends).all()
    assert (res.diags == off.diags).all()


def test_engine_colsweep_skips_ineligible(rng, monkeypatch):
    """Long pairs (band does not cover every diagonal) stay on the
    antidiagonal kernel even with colsweep enabled."""
    import agatha_tpu.ops.colsweep as csmod
    from agatha_tpu.engine import AlignEngine

    def boom(*a, **kw):
        raise AssertionError("colsweep dispatched on ineligible bucket")

    monkeypatch.setattr(csmod, "align_bucket_colsweep", boom)
    # eligibility at band 751 admits lengths <= 752; 900 bp is
    # unambiguously past it regardless of what mutate() does to rlen
    q = random_seq(rng, 900)
    t = mutate(rng, q)
    enc = [(encode_padded(q), encode_padded(t), len(q), len(t))]
    res = AlignEngine(CANON, interpret=True).align(enc)
    exp = align_one_sweep(*enc[0], CANON)
    assert (int(res.scores[0]), int(res.query_ends[0]),
            int(res.target_ends[0])) == tuple(exp)


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
