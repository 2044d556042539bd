"""Pin all single-chip BASELINE configs in one run.

Runs bench.py's three canonical configurations back-to-back in this
process (headline / HiFi / ONT — BASELINE.md "Targets") and prints
the PERF_NOTES-style pinned-config table plus a tunnel-health
snapshot, so a round's numbers land with their measurement context
in one command:

    python scripts/pin_configs.py

Each row is the same protocol as `python bench.py [args]`: full
warm-up (all bucket-shape compiles), then best-of-3 back-to-back
engine walls.  Config 5 (multi-host) is hardware-gated and not
attempted here (tests/test_multiprocess.py covers the mechanism).
"""
import _path  # noqa: F401
import time

from bench import cross_mapping_bound, make_workload

CONFIGS = [
    ("headline 1024 x 10 kb, bw 751", 1024, 10000, 751, 400),
    ("HiFi 1024 x 15 kb, bw 751", 1024, 15000, 751, 400),
    ("ONT 128 x 75 kb, bw 2001", 128, 75000, 2001, 400),
]


def run():
    from agatha_tpu.config import AlignConfig, EngineConfig
    from agatha_tpu.engine import AlignEngine
    from agatha_tpu.utils.workload import banded_cells
    from tb_ratio_check import tunnel_health

    floor_ms, bw = tunnel_health()
    print(f"tunnel: {floor_ms:.0f} ms/call floor, {bw:.0f} MB/s fetch "
          f"bandwidth (calibration: ~25 ms, ~70-100 MB/s)", flush=True)

    rows = []
    for name, n_pairs, mean_len, band, zthr in CONFIGS:
        cfg = AlignConfig(match=1, mismatch=4, gap_open=6,
                          gap_extend=2, slice_width=3,
                          z_threshold=zthr, band_width=band)
        enc = make_workload(n_pairs, mean_len)
        eng = AlignEngine(cfg, EngineConfig())
        t0 = time.perf_counter()
        eng.align(enc)  # warm-up: compile every bucket shape
        warm = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = eng.align(enc)
            dt = min(dt, time.perf_counter() - t0)
        cells = banded_cells([e[2] for e in enc], [e[3] for e in enc],
                             res.diags, band)
        gcups = cells / dt / 1e9
        bound = cross_mapping_bound(cfg)
        rows.append((name, gcups, dt * 1e3, res.n_buckets,
                     gcups / bound, bound))
        print(f"{name:32s} {gcups:6.2f} GCUPS  {dt*1e3:7.1f} ms  "
              f"{res.n_buckets:3d} buckets  {gcups/bound:.3f} of "
              f"{bound:.1f} (warm-up {warm:.0f}s)", flush=True)

    print("\n| config | GCUPS | wall | buckets | vs bound |")
    print("|---|---|---|---|---|")
    for name, gcups, ms, nb, frac, bound in rows:
        print(f"| {name} | **{gcups:.2f}** | {ms:.1f} ms | {nb} | "
              f"{frac:.3f} of {bound:.1f} |")


if __name__ == "__main__":
    run()
