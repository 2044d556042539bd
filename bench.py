"""Benchmark: GCUPS on the canonical guided-alignment workload.

Mirrors the reference harness (AGAThA.sh:44): canonical parameters
-m 1 -x 4 -q 6 -r 2 -s 3 -z 400 -w 751.  The reference's bundled
dataset is stripped from the mount, so a deterministic synthetic
long-read seed-extension workload stands in: homologous pairs with
~10% divergence (substitutions + indels), the regime AGAThA targets.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = banded DP cell-updates per second (GCUPS) on one chip,
counting exactly the in-band cells of the antidiagonals the kernel
actually swept (Z-drop credit included, padding excluded).
vs_baseline = fraction of the VPU roofline for this recurrence
(~35 int32 VPU ops per DP cell update at 8x128 lanes/cycle; see
ROOFLINE_GCUPS below).  The reference repo publishes no numbers
(BASELINE.json "published": {}); the BASELINE.md target is >= 0.70.
"""

import json
import sys
import time

import numpy as np


def make_workload(n_pairs=2048, mean_len=1000, seed=1234):
    """Deterministic homologous pair set (seed-extension style)."""
    from agatha_tpu.ops.packing import encode_padded

    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    pairs = []
    for _ in range(n_pairs):
        n = int(rng.integers(mean_len // 2, mean_len * 3 // 2))
        q = bases[rng.integers(0, 4, size=n)]
        # ~10% divergence: substitutions + short indels
        t = []
        i = 0
        while i < n:
            r = rng.random()
            if r < 0.03:  # deletion
                i += int(rng.integers(1, 4))
                continue
            if r < 0.06:  # insertion
                t.extend(bases[rng.integers(0, 4, size=int(rng.integers(1, 4)))])
            if rng.random() < 0.05:
                t.append(bases[rng.integers(0, 4)])
            else:
                t.append(q[i])
            i += 1
        qs = "".join(q)
        ts = "".join(t) if t else "A"
        pairs.append(
            (encode_padded(qs), encode_padded(ts), len(qs), len(ts))
        )
    return pairs


def banded_cells(qlens, rlens, diags, bw):
    """Exact in-band cell count over the first `diags` antidiagonals."""
    total = 0
    for ql, rl, nd in zip(qlens, rlens, diags):
        d = np.arange(int(nd), dtype=np.int64)
        ub = np.minimum(np.minimum(rl - 1, d), (d + bw) // 2)
        lb = np.maximum(
            np.maximum(0, d - ql + 1), -((bw - d) // 2)
        )
        total += int(np.maximum(0, ub - lb + 1).sum())
    return total


# Minimal VPU ops per DP cell for this recurrence (substitution select,
# 3-way H max, F/E updates, packed-max tracking) is ~13; the engine's
# current inner loop spends ~35 including band/slice masking.  Roofline
# assumes 8x128 int32 lanes per cycle at 940 MHz (TPU v5e vector clock):
# 1024 lanes / 13 ops * 0.94e9 = ~74 G cell-updates/s.
ROOFLINE_GCUPS = 74.0


def main():
    from agatha_tpu.config import AlignConfig, EngineConfig
    from agatha_tpu.engine import AlignEngine

    cfg = AlignConfig(
        match=1, mismatch=4, gap_open=6, gap_extend=2,
        slice_width=3, z_threshold=400, band_width=751,
    )
    # Default workload: 512 ~10kb long-read extensions — the domain the
    # reference targets (long-read mapping) and large enough that
    # serving-path dispatch latency is amortized.
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    encoded = make_workload(n_pairs, mean_len)
    engine = AlignEngine(cfg, EngineConfig())

    # Warm-up: compile every bucket shape.
    engine.align(encoded)

    # Best-of-3: the serving path to the chip has multi-ms jitter.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = engine.align(encoded)
        dt = min(dt, time.perf_counter() - t0)

    qlens = [e[2] for e in encoded]
    rlens = [e[3] for e in encoded]
    cells = banded_cells(qlens, rlens, res.diags, cfg.band_width)
    gcups = cells / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "banded_dp_cell_updates_per_second",
                "value": round(gcups, 4),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / ROOFLINE_GCUPS, 4),
            }
        )
    )
    print(
        f"# pairs={n_pairs} mean_len={mean_len} wall={dt*1e3:.1f}ms "
        f"cells={cells} buckets={res.n_buckets}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
