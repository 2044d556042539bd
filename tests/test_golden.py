"""Golden score.log regression: CLI output vs checked-in oracle output.

The analogue of the reference's golden.log/out.log convention
(test_prog/Makefile:9-10,64-68) — but automated, with the golden file
produced by the cross-validated oracle rather than a prior binary run.
"""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_cli_matches_golden(tmp_path):
    raw = tmp_path / "raw.log"
    proc = subprocess.run(
        [sys.executable, "-m", "agatha_tpu.cli", "-p", "--interpret",
         "-m", "1", "-x", "4", "-q", "6", "-r", "2",
         os.path.join(GOLDEN, "query.fasta"),
         os.path.join(GOLDEN, "target.fasta"),
         str(raw)],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    expected = open(os.path.join(GOLDEN, "score.log")).read()
    assert proc.stdout == expected
