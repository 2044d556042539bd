"""Kernel-only rate of the PRODUCTION colband kernel (ops/colband.py).

The round-4/5 colband measurements conflated three costs:
  * the Pallas kernel itself,
  * per-dispatch plumbing (host prep: chain_scalars' empty-slice scan,
    colband_shapes' invariant simulation; the nibble unpack + pad +
    transpose inside _colband_jit; the serving tunnel's ~25 ms fixed
    dispatch cost),
  * engine-level bucket sequencing.

This probe isolates the first: the exact production kernel
(_make_colband_kernel, production shapes from colband_shapes) on
pre-staged, pre-transposed device arrays, timed with the in-jit rep
protocol of scripts/colband_probe.py (reps chained through a zero-cost
data dependency; two rep counts give a slope that cancels the fixed
dispatch cost).  Comparing its ns/col against colband_probe's ~4.4 us
structure number and against align_bucket_colband's end-to-end wall
tells where the round-4 "3.7x gap" actually lives.

Usage: python scripts/colband_kernelrate.py [n_pairs] [mean_len] [reps]
           [band_width] [z_threshold]
"""
import _path  # noqa: F401
import functools
import sys
import time

import numpy as np

from agatha_tpu.config import AlignConfig


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    BW = int(sys.argv[4]) if len(sys.argv) > 4 else 751
    zthr = int(sys.argv[5]) if len(sys.argv) > 5 else 400

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from agatha_tpu.ops.colband import (
        LN,
        _make_colband_kernel,
        chain_scalars,
        colband_shapes,
    )
    from agatha_tpu.ops.kernel import _unpack_nibbles, build_bucket_arrays
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=zthr, band_width=BW)
    pairs = make_workload(n_pairs, mean_len, 77)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    meta = np.asarray(meta, np.int32)
    assert meta.shape[0] % LN == 0, "use a 128-multiple pair count"

    t0 = time.perf_counter()
    shapes = colband_shapes(meta, cfg)
    t_shapes = time.perf_counter() - t0
    RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX = shapes
    t0 = time.perf_counter()
    sm = chain_scalars(meta, cfg)
    t_chain = time.perf_counter() - t0
    print(f"host prep: colband_shapes {t_shapes*1e3:.1f} ms, "
          f"chain_scalars {t_chain*1e3:.1f} ms  "
          f"(RW={RW} R8pad={R8pad} Qpad={Qpad} G={G} "
          f"gA={gA} gB={gB} tail={tail_steps})", flush=True)

    GB = meta.shape[0]
    # stage exactly what the pallas_call consumes (the production
    # _colband_jit's unpack/pad/transpose, done once here)
    t = _unpack_nibbles(jnp.asarray(tcodes))
    q = _unpack_nibbles(jnp.asarray(qfwd))

    def padt(x, n):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1]))) \
            if x.shape[1] < n else x[:, :n]

    tmat = jnp.asarray(np.asarray(padt(t, R8pad).T))
    qmat = jnp.asarray(np.asarray(padt(q, Qpad).T))
    smj = jnp.asarray(sm)

    kernel = _make_colband_kernel(cfg, RW, R8pad, Qpad, G, gA, gB,
                                  tail_steps, LEAD, WMAX, False)

    def call(smeta, tm, qm):
        return pl.pallas_call(
            kernel,
            grid=(GB // LN,),
            in_specs=[
                pl.BlockSpec((8, LN), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((4, LN), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, GB), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(smeta, tm, qm)

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(smeta, tm, qm, n):
        def body(i, acc):
            # genuine data dep XLA cannot fold away: write the prior
            # rep's output into an smeta row the kernel never reads
            # (chain_scalars fills rows 0-4; pallas_call is opaque, so
            # XLA must serialize the reps)
            sm2 = smeta.at[7:8, :].set(acc[3:4, :])
            return call(sm2, tm, qm)

        return jax.lax.fori_loop(
            0, n, body, jnp.zeros((4, GB), jnp.int32))

    t0 = time.perf_counter()
    ref = np.asarray(go(smj, tmat, qmat, reps))
    tc = time.perf_counter() - t0
    print(f"compile+first: {tc:.0f} s", flush=True)
    np.asarray(go(smj, tmat, qmat, reps // 2))

    def timeit(n):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(go(smj, tmat, qmat, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timeit(reps)
    t_half = timeit(reps // 2)
    progs = GB // LN
    dcols = progs * Qpad * (reps - reps // 2)
    ns_col = (t_full - t_half) / dcols * 1e9
    cells_col = LN * (2 * BW + 1)
    gcups = cells_col / ns_col
    print(f"production kernel: {t_full*1e3:7.1f}/{t_half*1e3:6.1f} ms "
          f"{ns_col:8.1f} ns/col -> {gcups:6.1f} GCUPS-equiv "
          f"({progs} programs x {Qpad} cols)", flush=True)

    # sanity: the rep chain returns the same result as one plain call
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
    ns_e2e = best / (progs * Qpad) * 1e9
    print(f"align_bucket_colband e2e: {best*1e3:.1f} ms "
          f"({ns_e2e:.1f} ns/col -> {cells_col/ns_e2e:.1f} "
          f"GCUPS-equiv): plumbing = "
          f"{(ns_e2e-ns_col)/ns_e2e*100:.0f}% of the e2e wall",
          flush=True)


if __name__ == "__main__":
    main()
