"""Compare a fresh bench.py sweep against the round-1 sweep (BENCH_r01.json).

Round 2's per-operator sweep was contaminated (same session as a heavy
kg_build); round 3 isolates the sweep in a fresh subprocess with
best-of-2 per query. This script makes the regression check explicit:
for every query present in both sweeps, print r1 vs now and flag >2x.

Usage: python bench.py > /tmp/bench_r3.json && \
       python scripts/compare_sweeps.py /tmp/bench_r3.json
"""

from __future__ import annotations

import json
import re
import sys


def load_sweep(path: str) -> dict:
    raw = open(path).read()
    # driver-recorded BENCH_r*.json wraps the bench line in a "tail" field
    try:
        doc = json.loads(raw)
        if "queries" in doc:
            return doc
        raw = doc.get("tail", "")
    except json.JSONDecodeError:
        pass
    m = re.search(r"\{\"metric\".*", raw)
    if not m:
        raise SystemExit(f"no bench JSON line found in {path}")
    return json.loads(m.group(0))


def main() -> None:
    now_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_r3.json"
    r1 = load_sweep("BENCH_r01.json")
    now = load_sweep(now_path)
    q1, qn = r1["queries"], now["queries"]
    common = sorted(set(q1) & set(qn))
    flagged = []
    print(f"{'query':32s} {'r1':>8s} {'now':>8s} {'ratio':>6s}")
    for k in common:
        ratio = qn[k] / q1[k] if q1[k] else float("inf")
        mark = "  <-- >2x" if ratio > 2.0 else ""
        if ratio > 2.0:
            flagged.append(k)
        print(f"{k:32s} {q1[k]:8.3f} {qn[k]:8.3f} {ratio:6.2f}{mark}")
    print(f"\ncommon={len(common)}  >2x slower than r1: {len(flagged)}")
    for k in flagged:
        print(f"  {k}")


if __name__ == "__main__":
    main()
