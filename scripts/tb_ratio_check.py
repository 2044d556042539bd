"""Traceback-cost gate: align(traceback=True) vs score-only wall.

Measures the BASELINE config-2 criterion (full-CIGAR runs at batch
rate) on 1024 x 10 kb mutated pairs with canonical parameters.  The
target is with-traceback <= 3x the score-only wall; the adaptive
native engine (native/traceback.cpp engine 2) delivers ~1.1-1.4x.

Usage: python scripts/tb_ratio_check.py [n_pairs] [read_len]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from agatha_tpu.config import AlignConfig
from agatha_tpu.engine import AlignEngine
from agatha_tpu.ops.packing import encode_padded
from agatha_tpu.ops.traceback import cigar_to_pairs, score_cigar


def random_seq(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=n)])


def mutate(rng, seq, sub=0.05, ins=0.03, dele=0.03):
    out, bases = [], "ACGT"
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        out.append(bases[rng.integers(0, 4)] if r < dele + sub else ch)
        if rng.random() < ins:
            out.append(bases[rng.integers(0, 4)])
    return "".join(out) or "A"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rl = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    rng = np.random.default_rng(11)
    cfg = AlignConfig(match=1, mismatch=4, gap_open=6, gap_extend=2,
                      slice_width=3, z_threshold=400, band_width=751)
    engine = AlignEngine(cfg)
    print(f"generating {n} x {rl} pairs...", flush=True)
    enc = []
    for _ in range(n):
        q = random_seq(rng, rl)
        t = mutate(rng, q)
        enc.append((encode_padded(q), encode_padded(t), len(q), len(t)))
    print("warm-up (compile)...", flush=True)
    engine.align(enc)
    t0 = time.perf_counter()
    engine.align(enc)
    score_wall = time.perf_counter() - t0
    print(f"score-only wall: {score_wall:.2f}s", flush=True)
    t0 = time.perf_counter()
    r2 = engine.align(enc, traceback=True)
    tb_wall = time.perf_counter() - t0
    ratio = tb_wall / score_wall
    print(f"with-traceback wall: {tb_wall:.2f}s -> ratio {ratio:.2f}x")
    for i in (0, n // 2, n - 1):
        qn, tn = cigar_to_pairs(r2.cigars[i])
        assert qn == r2.query_ends[i] + 1 and tn == r2.target_ends[i] + 1
        assert (score_cigar(r2.cigars[i], enc[i][0], enc[i][1], cfg)
                == r2.scores[i])
    print("cigar invariants OK")
    return 0 if ratio <= 3.0 else 1


if __name__ == "__main__":
    sys.exit(main())
