"""Staged-harness ablation of the production colband kernel.

colband_ablate.py times align_bucket_colband end-to-end, which the
round-5 decomposition (scripts/colband_kernelrate.py) showed is ~65%
per-dispatch plumbing — its deltas were swamped.  This variant times
the PURE KERNEL with the shared staged protocol (_colband_bench.py)
and the same source-patch trick to produce timing-faithful,
semantically wrong variants.

Round-5 results at the canonical 128 x 10 kb bucket (PERF_NOTES
"the colband 3.7x gap, decomposed"): base 4773 ns/col; no_prefix
-26%; no_emit -10%; no_tdma / no_qdma / no_groupmask / no_ring_all
all ~0 (noise-slower) — the kernel is at its structural floor.

Usage: python scripts/colband_ablate2.py [n_pairs] [mean_len] [reps]
"""
import _path  # noqa: F401
import importlib.util
import os
import sys

import numpy as np

import _colband_bench as cb
from agatha_tpu.config import AlignConfig

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

_DMA_ROLL = """                    dma_t(jnp.int32(0)).wait()
                    strip = tbuf[:, :]
                    tmw[:, :] = _shift_up(tmw[:, :], 8, 0, interpret)
                    tmw[pl.ds(RW - 8, 8), :] = strip
                    nxt = jnp.clip(w0 + 8 + RW - 8, 0, R8pad - 8)
                    dma_t(nxt).start()"""

_QDMA = """                dma_q(jnp.int32(0)).wait()
                qblk = qbuf[:, :]
                dma_q(jnp.clip(8 * g + 8, 0, Qpad - 8)).start()"""

PATCHES = {
    "base": [],
    # E prefix chain down to one stage
    "no_prefix": [(
        "                    while sft < RW:",
        "                    while sft < 2:  # ABLATED",
    )],
    # packed emission off (anti-DCE anchor keeps h_new live)
    "no_emit": [(
        _EMIT,
        "                    gacc = jnp.maximum(gacc, jnp.concatenate("
        "\n                        [h_new, jnp.full((8, LN), INT32_MIN,"
        " _I32j)],\n                        axis=0))  # ABLATED",
    )],
    # target-strip DMA machinery replaced by a synthesized refill
    # (the probe's structure); window roll kept
    "no_tdma": [(
        _DMA_ROLL,
        "                    tmw[:, :] = _shift_up(tmw[:, :], 8, 0,"
        " interpret)  # ABLATED",
    )],
    # query-strip DMA replaced by a constant block
    "no_qdma": [(
        _QDMA,
        "                qblk = tbuf[:, :]  # ABLATED",
    )],
    # per-group slice/chunk algebra down to trivial surrogates
    "no_groupmask": [(
        "                i_sl = (((pr + g) * ((1 << 16) // sw + 1))\n"
        "                        >> 16) * sw",
        "                i_sl = pr + g  # ABLATED",
    )],
    # chain + ring shift off
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
}


def load_variant(name):
    src = open(SRC).read()
    for old, new in PATCHES[name]:
        assert old in src, (name, old)
        src = src.replace(old, new)
    path = f"/tmp/_colband2_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"_cb2_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"_cb2_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from agatha_tpu.ops.kernel import build_bucket_arrays
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    pairs = make_workload(n_pairs, mean_len, 77)
    meta, tcodes, qfwd = build_bucket_arrays(pairs, cfg)
    meta = np.asarray(meta, np.int32)
    assert meta.shape[0] % 128 == 0
    GB = meta.shape[0]

    base = load_variant("base")
    smj, tmat, qmat, shapes = cb.stage_bucket(
        base, meta, tcodes, qfwd, cfg)
    Qpad = shapes[2]

    base_ns = None
    for name in PATCHES:
        mod = load_variant(name)
        call = cb.make_call(mod, cfg, shapes, GB)
        go = cb.rep_chain(call, GB)
        ns, tc = cb.slope_ns_per_col(
            go, smj, tmat, qmat, reps, GB // base.LN, Qpad)
        if base_ns is None:
            base_ns = ns
        print(f"{name:14s} {ns:8.1f} ns/col ({ns/base_ns:5.2f}x base) "
              f"compile {tc:4.0f}s", flush=True)


if __name__ == "__main__":
    main()
