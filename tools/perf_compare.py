"""Diff two bench outputs (raw bench.py JSON line or the driver's
BENCH_r{N}.json wrapper) per query. The host's absolute throughput
drifts ±30-45% between runs (BENCH/BASELINE.md), so only ratios beyond
``THRESHOLD`` are flagged as likely-real regressions; everything else
prints for the record.

Usage: python tools/perf_compare.py OLD.json NEW.json [threshold]
Exit 1 when any query regresses beyond the threshold.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 2.0  # x slower than before => beyond plausible host drift


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    # driver wrapper {"parsed": {...}} or the raw one-line bench output
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = json.loads([l for l in txt.splitlines() if l.startswith("{")][-1])
    return d.get("parsed", d)


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else THRESHOLD
    bad = 0
    for q in sorted(set(old.get("queries", {})) | set(new.get("queries", {}))):
        o, n = old.get("queries", {}).get(q), new.get("queries", {}).get(q)
        if o is None or n is None:
            print(json.dumps({"query": q, "old": o, "new": n, "note": "added/removed"}))
            continue
        ratio = round(n / o, 3) if o else None
        row = {"query": q, "old_s": o, "new_s": n, "ratio": ratio}
        if ratio is not None and ratio > thr:
            row["regression"] = True
            bad += 1
        print(json.dumps(row))
    ot, nt = old.get("tokens_per_sec"), new.get("tokens_per_sec")
    print(json.dumps({"summary": "tokens_per_sec", "old": ot, "new": nt,
                      "flagged_regressions": bad, "threshold_x": thr}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
