"""CLI --tb-mode: the device (emit-flags kernel + walk) and host
(AVX-512 engine) CIGAR paths must print identical output.

Covers the L4 flag plumbing (cli.py --tb-mode -> EngineConfig
.traceback_mode) end-to-end through a real subprocess; the engine-level
equivalence of the two traceback engines is tested separately in
test_device_tb.py.
"""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _run(mode):
    proc = subprocess.run(
        [sys.executable, "-m", "agatha_tpu.cli", "-p", "--interpret",
         "--cigar", "--tb-mode", mode,
         "-m", "1", "-x", "4", "-q", "6", "-r", "2",
         os.path.join(GOLDEN, "query.fasta"),
         os.path.join(GOLDEN, "target.fasta")],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_cli_tb_mode_device_equals_host():
    dev = _run("device")
    host = _run("host")
    assert dev == host
    # every line must actually carry a CIGAR column
    lines = [ln for ln in dev.splitlines() if ln.strip()]
    assert lines and all("\t" in ln for ln in lines)
