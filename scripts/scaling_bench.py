"""Two-parallelism-level scaling run (north-rule evidence).

No real multi-executor cluster exists in this sandbox, so the N vs 4N
executor criterion is evidenced by running the IDENTICAL kg-build job at
local[8] and local[32] on the same deterministic input and reporting
throughput at both plus scaling efficiency = (thr_4N / thr_N) / 4.

Writes/updates the "## Scaling" section consumed by BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CONVS = os.environ.get("SPARK_GRAFT_KG_CONVS", "2000")


def run(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_KG_CONVS"] = N_CONVS
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--kg-only"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo, hi = 8, 32
    r_lo = run(lo)
    print(f"local[{lo}]: {json.dumps(r_lo['kg'])}", file=sys.stderr)
    r_hi = run(hi)
    print(f"local[{hi}]: {json.dumps(r_hi['kg'])}", file=sys.stderr)

    thr_lo = r_lo["kg"]["triples_per_sec"]
    thr_hi = r_hi["kg"]["triples_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    report = {
        "n_convs": int(N_CONVS),
        "n_turns": r_lo["kg"]["n_turns"],
        "cores_N": lo,
        "cores_4N": hi,
        "triples_per_sec_N": thr_lo,
        "triples_per_sec_4N": thr_hi,
        "kg_build_sec_N": r_lo["kg"]["kg_build_sec"],
        "kg_build_sec_4N": r_hi["kg"]["kg_build_sec"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
