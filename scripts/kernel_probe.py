"""Empirical substep op-cost breakdown of the Pallas kernel.

Compiles surgically modified kernel variants (results intentionally
wrong for the ablated ones) and measures per-substep wall on a
full-sweep workload, yielding an honest attribution of where the
~200 ns/substep goes.  Used for the round-2 instruction audit in
PERF_NOTES.md.

Usage: python scripts/kernel_probe.py [G]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import importlib.util
import os
import sys
import time


import numpy as np

from agatha_tpu.config import AlignConfig
from agatha_tpu.utils.workload import make_workload

SRC = os.path.join(os.path.dirname(__file__), "..",
                   "agatha_tpu", "ops", "kernel.py")

# Patterns track the production kernel text (wave-indexed, 20-space
# substep body since the multi-wave refactor); load_variant asserts on
# drift so a stale probe fails loudly instead of mis-ablating.
_BOOKKEEPING = """                    live = (term == 0) & (d < end_p[i])
                    gate = live & (
                        ((d < i_end8[i]) & (d < n_diags[i]))
                        | (d >= i_end8[i])
                    )
                    th = dmax >> 16
                    tr = dmax & 0xFFFF
                    dq = d - tr
                    upd = gate & (th > ms)
                    if z >= 0:
                        zel = gate & ~(th > ms) & (tr >= mr) & (dq >= mq)
                        gap = jnp.abs((tr - mr) - (dq - mq))
                        term = jnp.where(
                            zel & (ms - th > z + gap * ge), 1, term
                        )
                    ms = jnp.where(upd, th, ms)
                    mr = jnp.where(upd, tr, mr)
                    mq = jnp.where(upd, dq, mq)
                    diags = diags + live.astype(_I32)
                    bks[i] = [ms, mr, mq, term, diags]"""

VARIANTS = {
    "baseline": [],
    "no_bookkeeping": [
        # drop per-diagonal max tracking + z-drop bookkeeping AND the
        # packed/dmax reduction feeding it
        ("""                    packed = (h_new << 16) + r
                    packed = jnp.where(C, packed, jnp.int32(INT32_MIN))
                    dmax = jnp.max(packed, axis=1, keepdims=True)""",
         """                    _ = h_new  # bookkeeping ablated"""),
        (_BOOKKEEPING,
         """                    _ = term  # bookkeeping ablated"""),
    ],
    "no_masks": [
        ("C = valid & ((cls & z_b) | (ncls & z_a))", "C = valid"),
    ],
    "no_rolls": [
        ("    return pltpu.roll(x, shift=1, axis=1)", "    return x"),
    ],
    "lite_scalar_chain": [
        # keep packed/dmax reduction; replace the 15-op sequential
        # (B,1) chain with 2 ops (tests the latency-bound hypothesis)
        (_BOOKKEEPING,
         """                    live = (term == 0) & (d < end_p[i])
                    ms = jnp.maximum(ms, dmax)
                    diags = diags + live.astype(_I32)
                    bks[i] = [ms, mr, mq, term, diags]"""),
    ],
    "no_dma": [
        ("                cp_t.wait()\n                cp_q.wait()",
         "                pass"),
        ("                ncp_t.start()\n                ncp_q.start()",
         "                pass"),
        ("                p_t.start()\n                p_q.start()",
         "                pass"),
        ("                w_t.wait()\n                w_q.wait()",
         "                pass"),
    ],
    "two_stage_reduce": [
        ("dmax = jnp.max(packed, axis=1, keepdims=True)",
         "m128 = packed[:, 0:128]\n"
         "                    for _t in range(1, W // 128):\n"
         "                        m128 = jnp.maximum(m128, packed[:, 128*_t:128*(_t+1)])\n"
         "                    dmax = jnp.max(m128, axis=1, keepdims=True)"),
    ],
    "no_feed": [
        ("qwin = jnp.where(\n"
         "                        lane0, feed[i][:, k:k + 1],\n"
         "                        _roll1(qwin_r[:, :], interpret=interpret),\n"
         "                    )",
         "qwin = qwin_r[:, :]"),
    ],
}


def load_variant(name, repls):
    src = open(SRC).read()
    for old, new in repls:
        assert old in src, (name, old[:60])
        src = src.replace(old, new)
    path = f"/tmp/_kv_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"_kv_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"_kv_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mean_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    enc = make_workload(G * 8, mean_len, 1234)
    # steps actually swept: measure with the real kernel first
    from agatha_tpu.ops.kernel import align_bucket, build_bucket_arrays
    meta, tcodes, qfwd = build_bucket_arrays(enc, cfg)
    out = np.asarray(align_bucket(meta, tcodes, qfwd, cfg))
    # per-program substep count = max diags within each 8-pair program
    # (the while loop runs to the slowest pair), padded to slice group
    steps = 0
    sw = cfg.slice_width
    for g in range(G):
        d = out[g * 8:(g + 1) * 8, 3].max()
        steps += int(d)
    print(f"workload: {G} programs, ~{steps} total substeps*", flush=True)

    base = None
    for name, repls in VARIANTS.items():
        mod = load_variant(name, repls)
        m2, t2, q2 = build_bucket_arrays(enc, cfg)
        mod.align_bucket(m2, t2, q2, cfg)  # compile
        # sustained-state protocol: dispatch REPS copies back-to-back
        # (async) and time the whole window; the serving chip runs
        # ~2.4x faster under sustained load than after idle gaps (see
        # PERF_NOTES duty-cycle experiment), so single-dispatch timing
        # measures the ramped-down state.
        REPS = 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [mod.align_bucket(m2, t2, q2, cfg)
                    for _ in range(REPS)]
            for o in outs:
                np.asarray(o)
            best = min(best, (time.perf_counter() - t0) / REPS)
        ns = best / steps * 1e9
        if base is None:
            base = best * 1e3
            print(f"{name:16s}: {best*1e3:7.1f} ms  {ns:6.1f} ns/substep",
                  flush=True)
        else:
            print(f"{name:16s}: {best*1e3:7.1f} ms  {ns:6.1f} ns/substep"
                  f"  (saves {base - best*1e3:6.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
