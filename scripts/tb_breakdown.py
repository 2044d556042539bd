"""Device-traceback stage breakdown: where does the CIGAR cost go?

Splits align(traceback=True)'s extra wall over score-only into its
pipeline stages, each measured in the sustained state (back-to-back
reps, best-of-N) on ONE bucket so engine bucketing does not blur the
attribution:

  score   — plain kernel, no flag emission
  flags   — emit_flags kernel (bitmap stays in HBM; walk not run)
  walk    — flags + Pallas walk (only a 1-word sync slice fetched)
  fetch   — + full move-word fetch to host (the serving-tunnel hop)
  decode  — + native RLE decode to CIGAR strings

Use this before optimizing any one stage (walk micro-optimizations
are pointless if the tunnel fetch dominates, and vice versa).

Usage: python scripts/tb_breakdown.py [n_pairs] [read_len] [reps]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import sys
import time

import numpy as np

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.kernel import (
    _align_bucket_jit,
    build_bucket_arrays,
    flag_planes_needed,
    int16_safe,
    window_width,
)
from agatha_tpu.ops.walk import align_bucket_traceback, decode_moves
from agatha_tpu.utils.workload import make_workload


def best_of(fn, reps, n_best=3):
    walls = []
    for _ in range(n_best):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        walls.append((time.perf_counter() - t0) / reps)
    return min(walls)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rl = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    print(f"{n} x ~{rl} bp, one bucket, reps={reps}", flush=True)
    enc = make_workload(n, rl, seed=11)
    meta, tcodes, qfwd = build_bucket_arrays(enc, cfg)
    w = tcodes.shape[1] * (2 if tcodes.dtype == np.uint8 else 1)
    qf = qfwd.shape[1] * (2 if qfwd.dtype == np.uint8 else 1)
    safe16 = int16_safe(cfg, max_len=w + qf)
    windowed = w > window_width(cfg)
    planes = flag_planes_needed(meta, cfg)
    meta32 = np.asarray(meta, np.int32)

    import jax.numpy as jnp

    jm, jt, jq = jnp.asarray(meta32), jnp.asarray(tcodes), jnp.asarray(qfwd)

    def score():
        out = _align_bucket_jit(jm, jt, jq, cfg=cfg, w=w, qf=qf,
                                safe16=safe16, interpret=False,
                                windowed=windowed)
        np.asarray(out[:1, :1])

    def flags_only():
        out, fl = _align_bucket_jit(jm, jt, jq, cfg=cfg, w=w, qf=qf,
                                    safe16=safe16, interpret=False,
                                    windowed=windowed, emit_flags=True,
                                    d8_planes=planes)
        np.asarray(out[:1, :1])
        del fl

    def walk(fetch=False, decode=False):
        # pass the PRE-STAGED device arrays: align_bucket_traceback's
        # stage() is a no-op on device arrays, so the tunnel upload
        # (~8 MB/bucket at ~40 MB/s) is excluded — it belongs to the
        # engine's (overlapped) dispatch path, not to the walk
        out, words = align_bucket_traceback(meta, jt, jq, cfg)
        if decode:
            from agatha_tpu import native
            wn = np.asarray(words)
            if native.moves_to_cigars_batch(wn) is None:
                decode_moves(wn)  # NumPy fallback path
        elif fetch:
            np.asarray(words)
        else:
            np.asarray(words[:1, :8])

    stages = [
        ("score", score),
        ("flags", flags_only),
        ("walk", lambda: walk()),
        ("fetch", lambda: walk(fetch=True)),
        ("decode", lambda: walk(fetch=True, decode=True)),
    ]
    # warm every stage (compiles) before any timing
    for name, fn in stages:
        fn()
    walls = {}
    for name, fn in stages:
        walls[name] = best_of(fn, reps)
        print(f"{name:7s}: {walls[name]*1e3:8.1f} ms", flush=True)
    print("-- deltas --")
    print(f"flag emission : {(walls['flags'] - walls['score'])*1e3:8.1f} ms")
    print(f"device walk   : {(walls['walk'] - walls['flags'])*1e3:8.1f} ms")
    print(f"word fetch    : {(walls['fetch'] - walls['walk'])*1e3:8.1f} ms")
    print(f"native decode : {(walls['decode'] - walls['fetch'])*1e3:8.1f} ms")
    print(f"total tb cost : {(walls['decode'] - walls['score'])*1e3:8.1f} ms "
          f"({walls['decode']/walls['score']:.2f}x score wall)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
