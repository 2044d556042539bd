"""Average raw per-iteration kernel times into time.json.

Output-format-compatible with the reference's misc/avg_time.py:1-44:
time.json maps {process: {dataset: avg_ms}} where avg_ms is the sum of
all raw.log lines divided by the iteration count.
"""

import json
import os
import sys


def main():
    process, dataset_id, raw_file, output_file, iters = sys.argv[1:6]
    iters = int(iters)

    if os.path.exists(raw_file):
        lines = [
            ln for ln in open(raw_file).read().splitlines() if ln.strip()
        ]
        avg = (
            sum(float(x) for x in lines) / float(iters)
            if lines else "NaN"
        )
    else:
        avg = "NaN"

    output = {}
    if os.path.exists(output_file):
        with open(output_file) as f:
            output = json.load(f)
    output.setdefault(process, {})[dataset_id] = avg
    with open(output_file, "w") as f:
        json.dump(output, f)


if __name__ == "__main__":
    main()
