"""Traceback-cost gate: align(traceback=True) vs score-only wall.

Measures the BASELINE config-2 criterion (full-CIGAR runs at batch
rate) on 1024 x 10 kb mutated pairs with canonical parameters.

Gate (round 3, on-device traceback): measured ratio <= 2.0x on THIS
host, no projection — the device path (emit-flags kernel + on-device
walk) scales with the chip, not host cores, so the single-core-host
escape hatch of rounds 1-2 no longer applies.  With
--mode host the old AVX-512 engine is measured instead (informational:
~1.8 ms/pair/core; its <= 3x budget only holds with >= 2 host cores).

The score-only wall is measured both before AND after the traceback
run and the smaller value is used, so chip ramp-up between runs cannot
flatter the ratio (an early round-2 measurement made that mistake and
reported 1.13x).  Both paths are warmed (compile excluded) before
timing.

The gate is TUNNEL-AWARE (round 5): the traceback path fetches
megabytes of move-words through the serving tunnel, so its wall is
sensitive to the tunnel's download bandwidth in a way the score path
(tiny results) is not.  The 2.0x gate was calibrated in round 3 on a
tunnel delivering ~0.3 s for an all-at-once 1024 x 10 kb word blob
(~70-100 MB/s); on 2026-08-20 the same code (58eca84) measured 2.31x
with the tunnel at 25 ms/call + 39 MB/s.  The script therefore probes
the tunnel first and exits 2 (tunnel-degraded, not a code regression)
when the gate fails with a degraded tunnel (bw < 80 MB/s or
floor > 35 ms).

Usage: python scripts/tb_ratio_check.py [n_pairs] [read_len] [--mode host]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import sys


import time

import numpy as np

from agatha_tpu.config import AlignConfig, EngineConfig
from agatha_tpu.engine import AlignEngine
from agatha_tpu.ops.packing import encode_padded
from agatha_tpu.ops.traceback import cigar_to_pairs, score_cigar


def random_seq(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=n)])


def mutate(rng, seq, sub=0.05, ins=0.03, dele=0.03):
    out, bases = [], "ACGT"
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        out.append(bases[rng.integers(0, 4)] if r < dele + sub else ch)
        if rng.random() < ins:
            out.append(bases[rng.integers(0, 4)])
    return "".join(out) or "A"


def tunnel_health():
    """(call_floor_ms, bandwidth_MBps) of the device->host fetch path.

    Warm best-of-3 on a 64 KB fetch (the per-call floor) and an 8 MB
    fetch (bandwidth); `y + 1` forces a fresh computation so no cached
    host copy can be returned.
    """
    import jax.numpy as jnp

    def best_fetch(shape):
        y = jnp.ones(shape, jnp.int32)
        np.asarray(y)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(y + 1)
            best = min(best, time.perf_counter() - t0)
        return best

    floor_s = best_fetch((16, 1024))
    big_s = best_fetch((2048, 1024))
    bw = 8.0 / max(big_s - floor_s, 1e-9)
    return floor_s * 1e3, bw


def main():
    argv = list(sys.argv[1:])
    mode = "device"
    if "--mode" in argv:
        i = argv.index("--mode")
        argv.pop(i)
        mode = argv.pop(i)
    n = int(argv[0]) if len(argv) > 0 else 1024
    rl = int(argv[1]) if len(argv) > 1 else 10000
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    engine = AlignEngine(cfg, EngineConfig(traceback_mode=mode))
    print(f"generating {n} x {rl} pairs...", flush=True)
    from agatha_tpu.utils.workload import make_workload

    enc = make_workload(n, rl, seed=11)
    print("warm-up (compile, both paths)...", flush=True)
    engine.align(enc)
    engine.align(enc, traceback=True)
    # Tunnel snapshot AROUND the timed window (before here, again
    # after a failure): the traceback wall is fetch-heavy, so every
    # recorded gate number must carry the tunnel state it was
    # measured under (PERF_NOTES round 5, "traceback gate drift").
    floor_pre, bw_pre = tunnel_health()
    print(f"tunnel before timed runs: {floor_pre:.0f} ms/call floor, "
          f"{bw_pre:.0f} MB/s fetch bandwidth (round-3 calibration: "
          f"~25 ms, ~70-100 MB/s)", flush=True)
    t0 = time.perf_counter()
    engine.align(enc)
    score_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2 = engine.align(enc, traceback=True)
    tb_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    engine.align(enc)
    score_b = time.perf_counter() - t0
    score_wall = min(score_a, score_b)
    print(f"score-only wall: {score_wall:.2f}s "
          f"(before {score_a:.2f}, after {score_b:.2f})", flush=True)
    ratio = tb_wall / score_wall
    tb_ms = (tb_wall - score_wall) / n * 1e3
    print(f"with-traceback wall ({mode}): {tb_wall:.2f}s -> "
          f"ratio {ratio:.2f}x (~{tb_ms:.2f} ms/pair CIGAR)")
    for i in (0, n // 2, n - 1):
        qn, tn = cigar_to_pairs(r2.cigars[i])
        assert qn == r2.query_ends[i] + 1 and tn == r2.target_ends[i] + 1
        assert (score_cigar(r2.cigars[i], enc[i][0], enc[i][1], cfg)
                == r2.scores[i])
    print("cigar invariants OK")
    if mode == "device":
        ok = ratio <= 2.0
        print(f"gate: measured ratio {ratio:.2f}x <= 2.0x "
              f"({'PASS' if ok else 'FAIL'})")
        if ok:
            return 0
        # re-probe after the failure and judge on the WORSE of the
        # two snapshots, so a transient dip during the timed run that
        # recovers afterwards is still attributed to the tunnel
        floor_post, bw_post = tunnel_health()
        floor_ms = max(floor_pre, floor_post)
        bw = min(bw_pre, bw_post)
        degraded = bw < 80.0 or floor_ms > 35.0
        print(f"tunnel after: {floor_post:.0f} ms/call floor, "
              f"{bw_post:.0f} MB/s; judging on worse of before/after")
        if degraded:
            print("verdict: TUNNEL-DEGRADED — the word-fetch tax "
                  "explains the overshoot; re-run when the tunnel "
                  "recovers before attributing to code (round-3 code "
                  "58eca84 measured 2.31x on the same degraded "
                  "tunnel, 2026-08-20)")
            return 2
        return 1
    # host engine: informational <= 3x budget, threads across cores
    return 0 if ratio <= 3.0 else 1


if __name__ == "__main__":
    sys.exit(main())
