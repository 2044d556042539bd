"""Short-read kernel-rate measurement (reference regime: 150 bp x 8192).

Protocol: the bucket arrays are staged on the device ONCE, then the
jitted kernel is dispatched REPS times back-to-back and the whole
window timed (sustained state; one concatenated fetch).  This isolates
the kernel rate from the serving tunnel's upload path, which caps
end-to-end throughput at ~73 k reads/s here (~40 MB/s host->device;
real PCIe hosts don't have that ceiling — see PERF_NOTES).

Two variants quantify the no-band specialization (bw >= max(w, qf)
makes every band/chunk-clip test vacuous and compiles the masks away):

  noband  — the production fast path for short reads
  banded  — same workload with the specialization disabled (source
            patch, kernel_probe.py-style)

Usage: python scripts/shortread_rate.py [n_reads] [read_len] [REPS]
                                         [spread]
(spread = +-fractional length jitter; default 0.5 to match the
round-2/3 history at 150 bp; the reference's Illumina datasets are
fixed-length, so 0.05 models them better at 300/600 bp.)
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


def load_banded_variant():
    src = open(SRC).read()
    old = ("    noband = (not windowed) and "
           "cfg.band_width >= max(w, qf)")
    assert old in src
    src = src.replace(old, "    noband = False")
    path = "/tmp/_kv_banded.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location("_kv_banded", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_kv_banded"] = mod
    spec.loader.exec_module(mod)
    return mod


def measure(mod, meta, tcodes, qfwd, cfg, n_reads, reps, n_waves=None):
    import jax.numpy as jnp

    # stage ONCE on device: align_bucket's jnp.asarray is then a no-op,
    # so the timed loop measures the kernel, not the host->device wire
    meta = jnp.asarray(np.asarray(meta, np.int32))
    tcodes = jnp.asarray(tcodes)
    qfwd = jnp.asarray(qfwd)
    kw = {} if n_waves is None else {"n_waves": n_waves}
    out = mod.align_bucket(meta, tcodes, qfwd, cfg, **kw)
    np.asarray(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [mod.align_bucket(meta, tcodes, qfwd, cfg, **kw)
                for _ in range(reps)]
        np.asarray(jnp.concatenate(outs))
        best = min(best, (time.perf_counter() - t0) / reps)
    return n_reads / best, out


def measure_colsweep(meta, tcodes, qfwd, cfg, n_reads, reps):
    """Pre-staged kernel rate of the column-sweep path (the engine
    default for this regime since round 3)."""
    import jax.numpy as jnp

    from agatha_tpu.ops import colsweep as cs

    gb = meta.shape[0]
    assert gb % 128 == 0, "stage a 128-multiple bucket for this probe"
    R, Q, d_pad = cs.colsweep_shapes(meta, tcodes, qfwd, cfg)
    meta_d = jnp.asarray(np.asarray(meta, np.int32))
    tc = jnp.asarray(tcodes)
    qc = jnp.asarray(qfwd)

    def run():
        return cs._colsweep_jit(meta_d, tc, qc, cfg=cfg, r_rows=R,
                                q_cols=Q, d_pad=d_pad, interpret=False)

    out = run()
    np.asarray(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(reps)]
        np.asarray(jnp.concatenate(outs))
        best = min(best, (time.perf_counter() - t0) / reps)
    return n_reads / best, out


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spread = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    enc = make_workload(n_reads, read_len, seed=77, spread=spread)

    import agatha_tpu.ops.kernel as kmod

    meta, tcodes, qfwd = kmod.build_bucket_arrays(enc, cfg)
    w = tcodes.shape[1] * (2 if tcodes.dtype == np.uint8 else 1)
    qf = qfwd.shape[1] * (2 if qfwd.dtype == np.uint8 else 1)
    noband_on = cfg.band_width >= max(w, qf)
    print(f"{n_reads} x ~{read_len} bp; bucket w={w} qf={qf}; "
          f"noband eligible: {noband_on}", flush=True)

    # wave sweep (the engine default comes from n_waves_for_width —
    # single-wave since the round-3 refutation — and its row doubles
    # as the headline "noband" measurement below — no duplicate run)
    default_nw = kmod.n_waves_for_width(w, w > kmod.window_width(cfg))
    out_w1 = rate_nb = out_nb = None
    for nw in (1, 2, 4, 8):
        rate_w, out_w = measure(kmod, meta, tcodes, qfwd, cfg,
                                n_reads, reps, n_waves=nw)
        if out_w1 is None:
            out_w1 = np.asarray(out_w)
        else:
            assert (np.asarray(out_w) == out_w1).all(), \
                f"n_waves={nw} changed results"
        mark = "  <- engine default" if nw == default_nw else ""
        print(f"waves={nw}: {rate_w/1e3:8.1f} k reads/s{mark}",
              flush=True)
        if nw == default_nw:
            rate_nb, out_nb = rate_w, out_w
    if rate_nb is None:  # default not in the sweep grid
        rate_nb, out_nb = measure(kmod, meta, tcodes, qfwd, cfg,
                                  n_reads, reps)
    print(f"noband : {rate_nb/1e3:8.1f} k reads/s (kernel rate, "
          f"engine default waves={default_nw}, pre-staged, best of "
          f"3 x {reps} back-to-back)", flush=True)

    banded = load_banded_variant()
    rate_b, out_b = measure(banded, meta, tcodes, qfwd, cfg,
                            n_reads, reps)
    print(f"banded : {rate_b/1e3:8.1f} k reads/s "
          f"(specialization disabled)", flush=True)
    assert (np.asarray(out_nb) == np.asarray(out_b)).all(), \
        "noband specialization changed results"
    print(f"noband speedup: {rate_nb/rate_b:.3f}x; results identical")

    # the column-sweep kernel (pairs on lanes) — the engine's default
    # path for this regime since round 3
    from agatha_tpu.ops.colsweep import colsweep_eligible
    from agatha_tpu.ops.kernel import int16_safe

    safe16 = int16_safe(cfg, max_len=w + qf)
    rate_best = rate_nb
    if colsweep_eligible(meta, cfg, safe16):
        rate_cs, out_cs = measure_colsweep(meta, tcodes, qfwd, cfg,
                                           n_reads, reps)
        assert (np.asarray(out_cs) == np.asarray(out_nb)).all(), \
            "column-sweep changed results"
        print(f"colsweep: {rate_cs/1e3:8.1f} k reads/s (engine "
              f"default path; {rate_cs/rate_nb:.2f}x the antidiagonal "
              f"kernel, results identical)", flush=True)
        rate_best = rate_cs
    else:
        print("colsweep: not eligible at this length/band "
              "(antidiagonal kernel is the engine path)", flush=True)

    if read_len > 200:
        # the 300k bar is defined on the 150 bp reference workload
        # (VERDICT round 2 #6); longer reads carry quadratically more
        # cells per read, so report rates without a gate here
        return 0
    target = 300e3
    print(f"target >= 300 k reads/s (150 bp workload): "
          f"{'PASS' if rate_best >= target else 'FAIL'}")
    return 0 if rate_best >= target else 1


if __name__ == "__main__":
    sys.exit(main())
