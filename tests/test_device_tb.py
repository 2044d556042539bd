"""On-device traceback (emit-flags kernel + vectorized walk).

Validation strategy: the device CIGAR must (a) re-score under the plain
affine model to exactly the kernel-reported score, (b) consume exactly
q_end+1 / t_end+1 bases, and (c) agree in score with the host AVX-512
adaptive engine (paths may differ legitimately between co-optimal
alignments).  Interpret mode on the CPU mesh = the CI path; the
compiled path is exercised by scripts/tb_ratio_check.py on the chip.
"""

import numpy as np
import pytest

from agatha_tpu.config import AlignConfig, EngineConfig
from agatha_tpu.engine import AlignEngine
from agatha_tpu.ops.kernel import build_bucket_arrays, window_width
from agatha_tpu.ops.packing import encode_padded
from agatha_tpu.ops.traceback import (
    cigar_to_pairs,
    score_cigar,
    traceback_one,
)
from agatha_tpu.ops.walk import (
    align_bucket_traceback,
    decode_moves,
    moves_to_cigar,
    vbase_schedule,
)

from .conftest import mutate, random_seq


def _check_bucket(pairs, cfg, *, expect_windowed=None):
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    if expect_windowed is not None:
        w = tcodes.shape[1] * (2 if tcodes.dtype == np.uint8 else 1)
        assert (w > window_width(cfg)) == expect_windowed
    out, words = align_bucket_traceback(
        meta, tcodes, qfwd, cfg, interpret=True
    )
    out = np.asarray(out)
    moves = decode_moves(np.asarray(words))
    for p, (qc, tc, ql, rl) in enumerate(pairs):
        score, qe, te = int(out[p, 0]), int(out[p, 1]), int(out[p, 2])
        cig = moves_to_cigar(moves[p])
        if score == 0 and qe == 0 and te == 0:
            continue  # never-updated init handled at engine level
        assert score_cigar(cig, qc, tc, cfg) == score, (p, cig[:60])
        cq, ct = cigar_to_pairs(cig)
        assert (cq, ct) == (qe + 1, te + 1), p
        # score agreement with the host engine (paths may differ)
        _hc, hs = traceback_one(qc, tc, qe, te, cfg,
                                expected_score=score)
        assert hs == score, p


@pytest.mark.parametrize("cfg", [
    AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                slice_width=3, z_threshold=400, band_width=751),
    AlignConfig(match=2, mismatch=3, gap_open=5, gap_extend=1,
                slice_width=2, z_threshold=-1, band_width=751),
])
def test_full_kernel_traceback(rng, cfg):
    pairs = []
    for i in range(8):
        n = 250 + 30 * i
        q = random_seq(rng, n, 0.01)
        t = mutate(rng, q) if i % 2 else random_seq(rng, n + 16, 0.01)
        pairs.append((encode_padded(q), encode_padded(t), len(q), len(t)))
    _check_bucket(pairs, cfg, expect_windowed=False)


@pytest.mark.parametrize("cfg", [
    AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                band_width=60, z_threshold=200),
    AlignConfig(band_width=40, z_threshold=100, slice_width=2),
    AlignConfig(band_width=25, z_threshold=-1, slice_width=1),
])
def test_windowed_kernel_traceback(rng, cfg):
    pairs = []
    for i in range(8):
        n = 600 + 40 * i
        q = random_seq(rng, n, 0.01)
        t = mutate(rng, q) if i % 2 == 0 else random_seq(rng, n + 30, 0.01)
        pairs.append((encode_padded(q), encode_padded(t), len(q), len(t)))
    _check_bucket(pairs, cfg, expect_windowed=True)


def test_mixed_lengths_and_asymmetry(rng):
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      band_width=50, z_threshold=-1)
    pairs = []
    for ql, rl in [(100, 700), (700, 100), (500, 500), (1, 600),
                   (40, 40), (640, 655), (20, 650), (650, 650)]:
        q = random_seq(rng, ql)
        t = random_seq(rng, rl)
        pairs.append((encode_padded(q), encode_padded(t), ql, rl))
    _check_bucket(pairs, cfg)


def test_vbase_schedule_matches_kernel_invariant():
    """Schedule parks at wt - W and never shifts before the band."""
    cfg = AlignConfig(band_width=60, z_threshold=200)
    W = window_width(cfg)
    wt = W + 4 * 128
    vb = vbase_schedule(400, cfg, wt)
    assert vb[0] == 0
    assert vb.max() <= wt - W
    assert (np.diff(vb.astype(np.int64)) >= 0).all()
    assert set(np.diff(vb[::8].astype(np.int64))) <= {0, 128}
    # non-windowed: all zero
    assert (vbase_schedule(100, cfg, W) == 0).all()


def test_engine_device_vs_host_traceback(rng):
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2)
    enc = make_workload(24, 700, seed=5)
    dev = AlignEngine(cfg, EngineConfig(aligns_per_batch=8),
                      interpret=True).align(enc, traceback=True)
    host = AlignEngine(
        cfg, EngineConfig(aligns_per_batch=8, traceback_mode="host"),
        interpret=True,
    ).align(enc, traceback=True)
    assert (dev.scores == host.scores).all()
    for i, (qc, tc, _ql, _rl) in enumerate(enc):
        if dev.cigars[i] == "":
            assert host.cigars[i] == ""
            continue
        s_d = score_cigar(dev.cigars[i], qc, tc, cfg)
        s_h = score_cigar(host.cigars[i], qc, tc, cfg)
        assert s_d == s_h == int(dev.scores[i]), i
        assert cigar_to_pairs(dev.cigars[i]) == (
            int(dev.query_ends[i]) + 1, int(dev.target_ends[i]) + 1
        ), i


def test_engine_flag_bucket_split(rng):
    """tb_flag_bytes forces bucket splitting without changing results."""
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2)
    enc = make_workload(16, 400, seed=6)
    # single-device engines: isolates the tb_flag_bytes split from the
    # per-device split the multi-chip round-robin also applies
    small = AlignEngine(
        cfg, EngineConfig(aligns_per_batch=16, tb_flag_bytes=1 << 20,
                          use_all_devices=False),
        interpret=True,
    ).align(enc, traceback=True)
    big = AlignEngine(
        cfg, EngineConfig(aligns_per_batch=16, use_all_devices=False),
        interpret=True,
    ).align(enc, traceback=True)
    assert small.cigars == big.cigars
    assert (small.scores == big.scores).all()
    assert small.n_buckets > big.n_buckets


def test_stream_device_traceback_matches_batch(rng):
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2)
    enc = make_workload(20, 500, seed=7)
    eng = AlignEngine(cfg, EngineConfig(aligns_per_batch=8),
                      interpret=True)
    batch = eng.align(enc, traceback=True)
    stream = [
        c for r in eng.align_stream(iter(enc), traceback=True)
        for c in r.cigars
    ]
    assert stream == batch.cigars


def test_engine_traceback_round_robin_devices(rng):
    """Traceback buckets round-robin across the 8-device mesh; CIGARs
    must equal the single-device path exactly."""
    import jax

    from agatha_tpu.utils.workload import make_workload

    assert len(jax.local_devices()) == 8
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2)
    enc = make_workload(24, 500, seed=15)
    multi = AlignEngine(cfg, EngineConfig(aligns_per_batch=8),
                        interpret=True).align(enc, traceback=True)
    single = AlignEngine(
        cfg, EngineConfig(aligns_per_batch=8, use_all_devices=False),
        interpret=True,
    ).align(enc, traceback=True)
    assert multi.cigars == single.cigars
    assert (multi.scores == single.scores).all()
