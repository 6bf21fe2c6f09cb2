"""Compare two sweep jsonl generations per (config, seed).

    python benchmarks/compare_results.py benchmarks/results_r3.jsonl \
        benchmarks/results_r4.jsonl
"""
from __future__ import annotations

import json
import sys


def load(path):
    out = {}
    for line in open(path):
        if not line.strip():
            continue
        r = json.loads(line)
        out[(r.get("config"), r.get("seed"))] = r
    return out


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = load(a_path), load(b_path)
    keys = sorted(k for k in b if k in a)
    print(f"| config | seed | ESS/s {a_path.split('/')[-1]} -> "
          f"{b_path.split('/')[-1]} | x | R-hat | div | T (chees) |")
    print("|---|---|---|---|---|---|---|")
    for k in keys:
        ra, rb = a[k], b[k]
        if "error" in rb:
            print(f"| {k[0]} | {k[1]} | ERROR: {rb['error'][:60]} | | | | |")
            continue
        ea, eb = ra.get("ess_per_sec"), rb.get("ess_per_sec")
        x = f"{eb / ea:.2f}" if ea and eb else "-"
        t = rb.get("trajectory_length")
        print(
            f"| {k[0]} | {k[1]} | {ea} -> {eb} | {x} "
            f"| {ra.get('rhat_max')} -> {rb.get('rhat_max')} "
            f"| {ra.get('n_divergent')} -> {rb.get('n_divergent')} "
            f"| {t if t is not None else '-'} |"
        )


if __name__ == "__main__":
    main()
