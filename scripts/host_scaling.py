"""Multi-host harness overhead measurement (BASELINE config 5 proxy).

The >= 85% reads/s scaling-efficiency target needs N >= 2 real hosts;
this environment has one machine (and one core), so N-process wall
clocks here measure core contention, not the framework.  What IS
measurable here is the framework-side overhead that would erode
scaling on a real pod: jax.distributed init + deterministic sharding +
I/O-level merge, versus the plain single-process engine on the same
total workload.  Pairs are embarrassingly parallel and the distributed
path adds NO mid-flight collectives (parallel/distributed.py), so on
real hardware the scaling loss is bounded by (a) this overhead and
(b) shard imbalance, both printed below.

Protocol: CPU backend (deterministic, chip-independent), n_pairs short
reads; plain run timed in-process; then a 2-process jax.distributed
run where each worker times ONLY its align() wall (excluding
interpreter+import+init startup, which is per-job, not per-batch).

Usage: python scripts/host_scaling.py [n_pairs] [read_len]
"""
import _path  # noqa: F401  (repo-root shim, scripts/_path.py)
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

# force the CPU backend: sitecustomize may have imported jax (axon
# register()) before this script ran, so env vars alone are too late —
# the config update wins either way (same recipe as tests/conftest.py)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_WORKER = r"""
import json, os, sys, time
import numpy as np
import jax

coord, pid, nprocs, n_pairs, read_len, out_path, turndir = sys.argv[1:8]
pid = int(pid)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=int(nprocs),
                           process_id=pid)
from agatha_tpu.config import AlignConfig
from agatha_tpu.engine import AlignEngine
from agatha_tpu.parallel.distributed import align_distributed
from agatha_tpu.utils.workload import make_workload

encoded = make_workload(int(n_pairs), int(read_len), seed=3)
eng = AlignEngine(AlignConfig(match=1, mismatch=4, gap_open=6,
                              gap_extend=2), interpret=True)
sl, res = align_distributed(eng, encoded)  # warm (compile/trace)

# This machine has ONE core: if both workers time concurrently, the
# measurement is core contention, not framework overhead (a real pod
# gives every process its own machine).  Token files serialize the
# timed sections: every worker first announces its warm-up finished,
# waits for ALL peers' warm-ups (so worker 0's timed run does not
# overlap worker 1's warm run), then worker p times after p-1.
open(os.path.join(turndir, f"warm{pid}"), "w").close()
for q in range(int(nprocs)):
    while not os.path.exists(os.path.join(turndir, f"warm{q}")):
        time.sleep(0.02)
if pid > 0:
    while not os.path.exists(os.path.join(turndir, f"done{pid - 1}")):
        time.sleep(0.02)
t0 = time.perf_counter()
sl, res = align_distributed(eng, encoded)
wall = time.perf_counter() - t0
open(os.path.join(turndir, f"done{pid}"), "w").close()
json.dump({"pid": pid, "start": sl.start, "stop": sl.stop,
           "wall": wall, "score0": int(res.scores[0])},
          open(out_path, "w"))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    from agatha_tpu.config import AlignConfig
    from agatha_tpu.engine import AlignEngine
    from agatha_tpu.utils.workload import make_workload

    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2)
    encoded = make_workload(n_pairs, read_len, seed=3)
    eng = AlignEngine(cfg, interpret=True)
    eng.align(encoded)  # warm
    t0 = time.perf_counter()
    plain = eng.align(encoded)
    wall_plain = time.perf_counter() - t0
    print(f"plain 1-process align: {wall_plain:.2f}s "
          f"({n_pairs} x {read_len} bp, CPU interpret)", flush=True)

    with tempfile.TemporaryDirectory() as td:
        worker = os.path.join(td, "worker.py")
        open(worker, "w").write(_WORKER)
        coord = f"127.0.0.1:{_free_port()}"
        env = {"PATH": os.environ.get("PATH", "/usr/bin:/bin"),
               "HOME": os.environ.get("HOME", "/root"),
               "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__)))}
        procs, outs, errs = [], [], []
        for pid in range(2):
            out = os.path.join(td, f"out{pid}.json")
            outs.append(out)
            # stderr to a FILE, not a pipe: a chatty child (jax logs)
            # would fill a pipe buffer and deadlock against our wait()
            err = open(os.path.join(td, f"err{pid}"), "w+b")
            errs.append(err)
            procs.append(subprocess.Popen(
                [sys.executable, worker, coord, str(pid), "2",
                 str(n_pairs), str(read_len), out, td],
                env=env, stdout=subprocess.DEVNULL, stderr=err))
        failed = False
        for p, err in zip(procs, errs):
            try:
                rc = p.wait(timeout=1200)
            except subprocess.TimeoutExpired:
                rc = -1
            if rc != 0:
                failed = True
                err.seek(0)
                print(err.read().decode(errors="replace")[-1500:])
        if failed:
            # a dead peer can leave the other spinning on its token
            for p in procs:
                if p.poll() is None:
                    p.kill()
            return 1
        ds = [json.load(open(o)) for o in outs]

    walls = [d["wall"] for d in ds]
    sizes = [d["stop"] - d["start"] for d in ds]
    # per-shard throughput vs the plain run's on the same machine:
    # with zero framework overhead these match; the measured residue
    # on this box also includes shared-machine effects a real pod does
    # not have (a second resident JAX runtime + distributed heartbeat
    # threads sharing ONE core and its caches), so it is an upper
    # bound on the framework's own cost, not a scaling prediction
    per_pair_plain = wall_plain / n_pairs
    per_pair_dist = [w / s for w, s in zip(walls, sizes)]
    overhead = max(per_pair_dist) / per_pair_plain - 1.0
    imbalance = max(sizes) / (sum(sizes) / len(sizes)) - 1.0
    print(f"2-process shards: sizes={sizes}, walls="
          f"{[f'{w:.2f}s' for w in walls]}")
    print(f"per-pair overhead vs plain (UPPER bound, shared-core box): "
          f"{overhead*100:+.1f}%; shard imbalance {imbalance*100:+.1f}%")
    print("NOTE: the >= 85% reads/s scaling target (BASELINE config 5) "
          "needs N real hosts; the path itself has no mid-flight "
          "collectives (parallel/distributed.py), so per-host isolation "
          "removes everything measured here except imbalance.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
