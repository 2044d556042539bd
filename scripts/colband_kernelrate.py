"""Kernel-only rate of the PRODUCTION colband kernel (ops/colband.py).

The round-4/5 colband measurements conflated three costs:
  * the Pallas kernel itself,
  * per-dispatch plumbing (host prep: chain_scalars' empty-slice
    scan, colband_shapes' invariant simulation; the nibble unpack +
    pad + transpose inside _colband_jit; the serving tunnel's ~25 ms
    fixed dispatch cost),
  * engine-level bucket sequencing.

This probe isolates the first with the shared staged protocol
(_colband_bench.py: pre-staged device arrays, in-jit rep chain
through an opaque smeta row, two-rep-count slope).  Comparing its
ns/col against colband_probe's ~4.4 us structure number and against
align_bucket_colband's end-to-end wall tells where a "gap" actually
lives.  Round-5 finding (PERF_NOTES "the colband 3.7x gap,
decomposed"): kernel 4.93 us/col = 39.0 GCUPS-equiv at the canonical
bucket — the kernel was never slow; plumbing was 65% of the e2e wall.

Usage: python scripts/colband_kernelrate.py [n_pairs] [mean_len] [reps]
           [band_width] [z_threshold]
"""
import _path  # noqa: F401
import sys
import time

import numpy as np

import _colband_bench as cb
from agatha_tpu.config import AlignConfig


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    BW = int(sys.argv[4]) if len(sys.argv) > 4 else 751
    zthr = int(sys.argv[5]) if len(sys.argv) > 5 else 400

    import agatha_tpu.ops.colband as colband
    from agatha_tpu.ops.kernel import build_bucket_arrays
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=zthr, band_width=BW)
    pairs = make_workload(n_pairs, mean_len, 77)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    meta = np.asarray(meta, np.int32)
    assert meta.shape[0] % colband.LN == 0, "use a 128-multiple count"
    GB = meta.shape[0]

    # host-prep costs, timed separately (they are per-dispatch
    # plumbing in align_bucket_colband)
    t0 = time.perf_counter()
    shapes = colband.colband_shapes(meta, cfg)
    t_shapes = time.perf_counter() - t0
    t0 = time.perf_counter()
    colband.chain_scalars(meta, cfg)
    t_chain = time.perf_counter() - t0
    RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX = shapes
    print(f"host prep: colband_shapes {t_shapes*1e3:.1f} ms, "
          f"chain_scalars {t_chain*1e3:.1f} ms  "
          f"(RW={RW} R8pad={R8pad} Qpad={Qpad} G={G} "
          f"gA={gA} gB={gB} tail={tail_steps})", flush=True)

    smj, tmat, qmat, shapes = cb.stage_bucket(
        colband, meta, tcodes, qfwd, cfg)
    call = cb.make_call(colband, cfg, shapes, GB)
    go = cb.rep_chain(call, GB)
    ns_col, tc = cb.slope_ns_per_col(
        go, smj, tmat, qmat, reps, GB // colband.LN, Qpad)
    print(f"compile+first: {tc:.0f} s", flush=True)
    cells_col = colband.LN * (2 * BW + 1)
    gcups = cells_col / ns_col
    print(f"production kernel: {ns_col:8.1f} ns/col -> "
          f"{gcups:6.1f} GCUPS-equiv "
          f"({GB // colband.LN} programs x {Qpad} cols)", flush=True)

    # sanity: the rep chain returns the same result as one plain call
    ref = np.asarray(go(smj, tmat, qmat, 2))
    one = np.asarray(call(smj, tmat, qmat))
    assert np.array_equal(ref, one), "rep chain changed results"

    # end-to-end comparison: the full align_bucket_colband wall
    from agatha_tpu.ops.colband import align_bucket_colband

    np.asarray(align_bucket_colband(meta, tcodes, qfwd, cfg))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(align_bucket_colband(meta, tcodes, qfwd, cfg))
        best = min(best, time.perf_counter() - t0)
    progs = GB // colband.LN
    ns_e2e = best / (progs * Qpad) * 1e9
    print(f"align_bucket_colband e2e: {best*1e3:.1f} ms "
          f"({ns_e2e:.1f} ns/col -> {cells_col/ns_e2e:.1f} "
          f"GCUPS-equiv): plumbing = "
          f"{(ns_e2e-ns_col)/ns_e2e*100:.0f}% of the e2e wall",
          flush=True)


if __name__ == "__main__":
    main()
