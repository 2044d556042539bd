"""Duty-cycle experiment: is the sustained 3x slowdown environment throttling?

Protocol: one fixed windowed-kernel workload (G programs of B_PAIRS
10 kb pairs each, canonical params) is executed repeatedly.  Between
executions we idle for `gap` seconds.  If the per-execution wall
(after subtracting the ~26 ms dispatch floor) recovers toward the
burst rate as the gap grows, position-independent per-program cost is
ruled out and the slowdown is sustained-load throttling (DVFS or pool
time-slicing) on the serving chip — see PERF_NOTES.md.

Usage: python scripts/duty_cycle.py [G] [reps]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import sys


import time

import numpy as np

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.kernel import B_PAIRS, align_bucket, build_bucket_arrays
from agatha_tpu.ops.packing import encode_padded


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = np.random.default_rng(3)
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    L = 10000
    bases = np.array(list("ACGT"))
    pairs = []
    for _ in range(G * B_PAIRS):
        q = "".join(bases[rng.integers(0, 4, size=L)])
        t = "".join(bases[rng.integers(0, 4, size=L)])
        pairs.append((encode_padded(q), encode_padded(t), L, L))
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    print(f"shape: {tcodes.shape} x{G} programs", flush=True)

    def run_once():
        t0 = time.perf_counter()
        out = align_bucket(meta, tcodes, qfwd, cfg)
        np.asarray(out)  # force fetch (block_until_ready unreliable)
        return time.perf_counter() - t0

    run_once()  # compile
    for gap in (0.0, 1.0, 3.0, 10.0):
        walls = []
        for _ in range(reps):
            if gap:
                time.sleep(gap)
            walls.append(run_once())
        w = np.array(walls[1:]) if gap == 0.0 else np.array(walls)
        print(
            f"gap {gap:5.1f}s: per-exec wall "
            f"min {w.min()*1e3:7.1f} ms  median {np.median(w)*1e3:7.1f} ms"
            f"  max {w.max()*1e3:7.1f} ms", flush=True,
        )


if __name__ == "__main__":
    main()
