"""Ablation timing of the banded column-sweep kernel (colband.py).

kernel_probe.py-style: each variant source-patches ops/colband.py
(semantically WRONG, timing-faithful), loads it as a fresh module, and
times align_bucket_colband on a pre-staged canonical bucket.  The
serving tunnel's ~25 ms fixed dispatch cost is constant across
variants, so deltas are meaningful; absolute ns/col is reported both
raw and overhead-corrected.

Usage: python scripts/colband_ablate.py [n_pairs] [mean_len] [reps]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import importlib.util
import os
import sys
import time

import numpy as np

from agatha_tpu.config import AlignConfig  # noqa: E402
from agatha_tpu.utils.workload import make_workload  # noqa: E402

SRC = os.path.join(os.path.dirname(__file__), "..",
                   "agatha_tpu", "ops", "colband.py")

_EMIT = """                    packed = (h_new << 16) + r_abs
                    packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
                    pe = jnp.concatenate(
                        [packed, jnp.full((8, LN), INT32_MIN, _I32j)],
                        axis=0,
                    )
                    if k:
                        # raw roll: the 8-row INT32_MIN pad absorbs
                        # the wrap for k <= 7 (no fill op needed)
                        pe = (jnp.roll(pe, k, axis=0) if interpret
                              else pltpu.roll(pe, shift=k, axis=0))
                    gacc = jnp.maximum(gacc, pe)"""

PATCHES = {
    "base": [],
    # E prefix reduced to one level (the log2(RW) shift-max chain)
    "no_prefix": [(
        "                    while sft < RW:",
        "                    while sft < 2:  # ABLATED",
    )],
    # per-column packed emit: pack/where/skew-roll off (a
    # jnp.concatenate + jnp.maximum merge is retained as an anti-DCE
    # anchor keeping h_new live, so the delta excludes concat/merge)
    "no_emit": [(
        _EMIT,
        "                    gacc = jnp.maximum(gacc, jnp.concatenate("
        "\n                        [h_new, jnp.full((8, LN), INT32_MIN,"
        " _I32j)],\n                        axis=0))  # ABLATED",
    )],
    # skew roll only (emit stays)
    "no_skew": [(
        "                        pe = (jnp.roll(pe, k, axis=0) if"
        " interpret\n"
        "                              else pltpu.roll(pe, shift=k,"
        " axis=0))",
        "                        pe = pe + 0  # ABLATED",
    )],
    # fused chain + ring shift off (emit stays)
    "no_ring_all": [(
        "                carry = _vchain(seg, d0, scal, carry, z, ge,"
        " interpret)",
        "                pass  # ABLATED",
    ), (
        "                ring[:, :] = _shift_up(ring[:, :], c,"
        " INT32_MIN,\n"
        "                                       interpret)",
        "                pass  # ABLATED",
    )],
    # window slide (hprev/fst/tmw shifts) off; DMAs stay
    "no_slide": [(
        "                    hprev[:, :] = _shift_up(hprev[:, :], 8,"
        " MINUS_INF2,\n"
        "                                            interpret)\n"
        "                    fst[:, :] = _shift_up(fst[:, :], 8,"
        " MINUS_INF2,\n"
        "                                          interpret)",
        "                    pass  # ABLATED",
    ), (
        "                    tmw[:, :] = _shift_up(tmw[:, :], 8, 0,"
        " interpret)",
        "                    pass  # ABLATED",
    )],
    # per-group slice/chunk algebra down to a trivial surrogate
    "no_groupmask": [(
        "                i_sl = (((pr + g) * ((1 << 16) // sw + 1))\n"
        "                        >> 16) * sw",
        "                i_sl = pr + g  # ABLATED",
    )],
    # per-column band test + substitution selects off
    "no_colmasks": [(
        "                    band = (r_abs >= j - bw) & (r_abs <= j"
        " + bw)\n"
        "                    C = (yg | (xg & band)) & colm",
        "                    C = (yg | xg) & colm  # ABLATED",
    ), (
        "                    s = jnp.where(qb == tmat, sub_m, sub_x)\n"
        "                    s = jnp.where(qb == N_VALUE, -N_PENALTY,"
        " s)",
        "                    s = qb + sub_m  # ABLATED",
    )],
}


def load_variant(name):
    src = open(SRC).read()
    for old, new in PATCHES[name]:
        assert old in src, (name, old)
        src = src.replace(old, new)
    path = f"/tmp/_colband_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"_cb_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"_cb_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    import jax.numpy as jnp

    from agatha_tpu.ops.kernel import build_bucket_arrays

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    pairs = make_workload(n_pairs, mean_len, 77)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    m = jnp.asarray(np.asarray(meta, np.int32))
    tc = jnp.asarray(tcodes)
    qf = jnp.asarray(qfwd)

    base_ns = None
    for name in PATCHES:
        mod = load_variant(name)
        t0 = time.perf_counter()
        np.asarray(mod.align_bucket_colband(m, tc, qf, cfg))
        tcomp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [mod.align_bucket_colband(m, tc, qf, cfg)
                    for _ in range(reps)]
            for o in outs:
                np.asarray(o)
            best = min(best, (time.perf_counter() - t0) / reps)
        shp = mod.colband_shapes(meta, cfg)
        # programs pad to 128-lane blocks: ceil, not floor
        cols = (-(-meta.shape[0] // 128)) * shp[2]
        ns = best / cols * 1e9
        if base_ns is None:
            base_ns = ns
        print(f"{name:14s} {best*1e3:7.1f} ms  {ns:7.1f} ns/col "
              f"({ns/base_ns:5.2f}x base)  compile {tcomp:5.0f}s "
              f"RW={shp[0]}", flush=True)


if __name__ == "__main__":
    main()
