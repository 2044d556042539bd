"""Walk-kernel cost ablation: what makes a walk substep ~1.1 us?

The device walk (ops/walk.py) costs ~9 us per plane at Bw=64 on the
10 kb workload while its DMA needs ~2 us (hidden by double-buffering,
measured separately: single-stream HBM->VMEM reaches 130 GB/s at
depth 2).  This probe source-patches the production `_make_walk_kernel`
into timing-faithful but semantically wrong variants to attribute the
per-substep cost:

  base      — production kernel
  noreduce  — the (Bw, W) one-hot extraction + lane reduce replaced by
              a (Bw, 1) slice (kills the per-substep cross-lane sum)
  nostate   — extraction kept, move/state logic collapsed (cursor
              always steps diagonally)

Run on synthetic flags of production shape (256 x 10 kb bucket).
Usage: python scripts/walk_probe.py [GB] [planes] [reps]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import importlib.util
import os
import sys
import time

import numpy as np

SRC = os.path.join(os.path.dirname(__file__), "..",
                   "agatha_tpu", "ops", "walk.py")

# patterns target substep_k (the Pallas kernel); the XLA reference
# walk's similar lines differ by indexing ([None, :]) / st formatting
EXTRACT = """            oh = lane_iota == lane
            fl = jnp.sum(jnp.where(oh, plane, 0), axis=1,
                         keepdims=True)"""

NOREDUCE = """            oh = lane_iota == lane
            fl = plane[:, :1] + (lane & 0)"""

STATE_TAIL = """            r = r - jnp.where(is_m | is_d | b_d, 1, 0)
            c = c - jnp.where(is_m | is_i | b_i, 1, 0)
            st = jnp.where(
                h_e, 1, jnp.where(h_f, 2, jnp.where(is_m, 0, st)),
            )"""

NOSTATE = """            is_m = inb | is_m
            is_d = is_d & ~inb
            is_i = is_i & ~inb
            r = r - jnp.where(is_m | is_d | b_d, 1, 0)
            c = c - jnp.where(is_m | is_i | b_i, 1, 0)
            st = jnp.where(
                h_e, 1, jnp.where(h_f, 2, jnp.where(is_m, 0, st)),
            )"""


def load_variant(name, repl):
    src = open(SRC).read()
    for old, new in repl:
        assert old in src, f"{name}: pattern drifted:\n{old}"
        src = src.replace(old, new)
    path = f"/tmp/_walk_{name}.py"
    open(path, "w").write(src)
    spec = importlib.util.spec_from_file_location(f"_walk_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"_walk_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax.numpy as jnp

    from agatha_tpu.config import AlignConfig

    GB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    planes = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)

    # every variant (incl. base) drops buffer donation so the 4 GB
    # flag bitmap is uploaded ONCE and reused across reps (the tunnel
    # uploads at ~40 MB/s; re-uploading per rep would dwarf the walk)
    nodonate = [("donate_argnums=(0,)", "donate_argnums=()")]
    bw64 = [("(256, 128, 64, 32, 16, 8)", "(64, 32, 16, 8)")]
    variants = [
        ("base", nodonate),
        ("bw64", nodonate + bw64),
        ("noreduce", nodonate + [(EXTRACT, NOREDUCE)]),
        ("nostate", nodonate + [(STATE_TAIL, NOSTATE)]),
    ]
    import agatha_tpu.ops.walk as wmod

    W = wmod.window_width(cfg)
    vb = wmod.vbase_schedule(planes, cfg, planes * 8)  # windowed-ish
    ends = np.zeros((GB, 4), np.int32)
    ends[:, 1] = 5000  # q_end
    ends[:, 2] = 5000  # t_end
    base_ms = None
    jv = None
    import jax

    # synthesize the bitmap ON DEVICE (a host upload of this size
    # would take minutes through the serving tunnel)
    jf = jax.random.randint(jax.random.PRNGKey(0), (GB, planes * W),
                            minval=-(2 ** 31), maxval=2 ** 31 - 1,
                            dtype=jnp.int32)
    np.asarray(jf[:1, :1])
    for name, repl in variants:
        mod = load_variant(name, repl)
        f = mod._walk_pallas_jit
        jv = jnp.asarray(vb)
        je = jnp.asarray(ends)
        out = f(jf, jv, je, planes=planes, w_state=W)
        np.asarray(out[:1, :1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = []
            for _ in range(reps):
                outs.append(f(jf, jv, je, planes=planes, w_state=W))
            np.asarray(outs[-1][:1, :1])
            best = min(best, (time.perf_counter() - t0) / reps)
        ns_sub = best / (GB / 256 * planes * 8) * 1e9  # per 256-row substep
        if base_ms is None:
            base_ms = best
        print(f"{name:9s}: {best*1e3:8.1f} ms  {ns_sub:7.0f} ns/substep  "
              f"({best/base_ms:.2f}x of base)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
