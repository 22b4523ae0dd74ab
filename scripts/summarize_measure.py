#!/usr/bin/env python
"""Digest a MEASURE_rN.jsonl session into a readable table + headline stats.

Round 5 adds the BM25 variance study: `bm25_rep1..rep5` run the identical
bench.py at five session positions (VERDICT r4 #3 — the r4 artifacts
disagreed 52,264 vs 31,606 q/s with no explanation). This prints per-rep
numbers, the spread, and the recommended citation form
(median ± half-range across session positions).

Usage: python scripts/summarize_measure.py [MEASURE_r5.jsonl]
"""

import json
import statistics
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "MEASURE_r5.jsonl"
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))

    bm25_reps = []
    print(f"{'bench':32s} {'wall_s':>8s}  result")
    for r in rows:
        name = r["bench"]
        if "error" in r:
            print(f"{name:32s} {r.get('wall_s', 0):>8.1f}  ERROR rc={r['error']}")
            continue
        res = r["result"]
        det = res.get("detail", {})
        val = res.get("value")
        unit = res.get("unit", "")
        extra = ""
        if name.startswith("bm25_rep"):
            bm25_reps.append((name, float(val), det))
            extra = (f" raw={det.get('raw_elapsed_s')}s settle={det.get('settle_pass_s')}s"
                     f" fetch={det.get('fetch_after_s')}s")
        elif "tok_per_s" in det:
            extra = f" tok/s={det['tok_per_s']}"
        print(f"{name:32s} {r.get('wall_s', 0):>8.1f}  {val} {unit}{extra}")

    if bm25_reps:
        vals = [v for _, v, _ in bm25_reps]
        med = statistics.median(vals)
        half_range = (max(vals) - min(vals)) / 2
        print("\n== BM25 headline variance (identical bench.py, 5 session positions) ==")
        for name, v, det in bm25_reps:
            print(f"  {name}: {v:,.0f} q/s  (raw {det.get('raw_elapsed_s')}s,"
                  f" settle {det.get('settle_pass_s')}s, fetch_after {det.get('fetch_after_s')}s)")
        print(f"  median = {med:,.0f} q/s; spread = {min(vals):,.0f}..{max(vals):,.0f}"
              f" ({(max(vals)/min(vals)-1)*100:.0f}% max/min)")
        print(f"  citation form: {med:,.0f} ± {half_range:,.0f} q/s (median ± half-range)")


if __name__ == "__main__":
    main()
