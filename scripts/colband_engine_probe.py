"""Decompose the engine-level colband wall (round 5).

colband_kernelrate.py pinned the production kernel at ~4.93 us/col
(39 GCUPS-equiv); the engine (bench.py --colband) delivers 492-559 ms
at the canonical 1024 x 10 kb where the kernel sum predicts ~423 ms.
This probe decomposes the difference in ONE process (compiles amortize
across experiments):

  e2e        engine.align wall (best-of-3)           [the bench number]
  disp+coll  _dispatch wall vs _collect wall split
  staged     pre-staged device arrays -> per-bucket _colband_jit calls
             + one concat fetch (no host prep, no uploads in the loop)
  fused      all buckets inside ONE jit (single dispatch)

Usage: python scripts/colband_engine_probe.py [n_pairs] [mean_len]
"""
import _path  # noqa: F401
import sys
import time

import numpy as np


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

    import jax
    import jax.numpy as jnp

    from agatha_tpu.config import AlignConfig, EngineConfig
    from agatha_tpu.engine import AlignEngine
    from agatha_tpu.ops.colband import (
        _colband_jit,
        chain_scalars,
        colband_shapes,
    )
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    enc = make_workload(n_pairs, mean_len)
    eng = AlignEngine(cfg, EngineConfig(colband=True))

    t0 = time.perf_counter()
    eng.align(enc)
    print(f"warmup (all compiles): {time.perf_counter()-t0:.0f} s",
          flush=True)

    def best3(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(f"e2e align: {best3(lambda: eng.align(enc)):.1f} ms",
          flush=True)

    # dispatch vs collect split
    for _ in range(3):
        t0 = time.perf_counter()
        buckets, pending, routes = eng._dispatch(enc)
        t1 = time.perf_counter()
        eng._collect(enc, buckets, pending, t0, routes=routes,
                     traceback=False)
        t2 = time.perf_counter()
        print(f"dispatch {1e3*(t1-t0):7.1f} ms   collect "
              f"{1e3*(t2-t1):7.1f} ms", flush=True)

    # pre-staged arrays: no host prep / uploads in the timed loop
    staged = []
    for b in eng.iter_buckets(enc):
        meta = np.asarray(b.meta)
        shapes = colband_shapes(meta, cfg)
        sm = jnp.asarray(np.ascontiguousarray(chain_scalars(meta, cfg)))
        tc = jnp.asarray(np.asarray(b.tcodes))
        qc = jnp.asarray(np.asarray(b.qfwd))
        staged.append((sm, tc, qc, shapes))
    jax.block_until_ready([s[0] for s in staged])

    def run_staged():
        outs = [
            _colband_jit(sm, tc, qc, cfg=cfg, shapes=shapes,
                         interpret=False)
            for sm, tc, qc, shapes in staged
        ]
        np.asarray(jnp.concatenate(outs))

    run_staged()  # compile the (pad-free) jit variants if any differ
    print(f"staged per-bucket dispatches: {best3(run_staged):.1f} ms",
          flush=True)

    # fused: all buckets inside one jit = ONE dispatch
    shapes_t = tuple(s[3] for s in staged)

    from functools import partial

    @partial(jax.jit, static_argnames=("shapes_t",))
    def fused(args, shapes_t):
        return jnp.concatenate([
            _colband_jit(sm, tc, qc, cfg=cfg, shapes=shp,
                         interpret=False)
            for (sm, tc, qc), shp in zip(args, shapes_t)
        ])

    args = tuple((sm, tc, qc) for sm, tc, qc, _ in staged)
    np.asarray(fused(args, shapes_t))
    print(f"fused single dispatch: "
          f"{best3(lambda: np.asarray(fused(args, shapes_t))):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
