"""Shuffle-config A/B for the single-box kernel-time ceiling (VERDICT r3
item 3): interleaved full-build legs at a fixed pinned core count, one
config dimension changed per leg, best-of-REPS per config.

The 4→16 scaling pairs are capped by memory-bus service rate — 30-50% of
all CPU goes to kernel time in the shuffle-heavy stages (tmpfs writes +
Arrow socket copies). Candidate levers, each attacking one syscall/byte
stream:

* ``codec=zstd``       — fewer tmpfs bytes per shuffle row (more CPU/byte)
* ``shuffle_buffer=1m``— 32× fewer flush syscalls per shuffle writer
* ``arrow_batch=8192`` — 4× fewer Python-worker socket round-trips
* ``ppc=2``            — half the shuffle files/tasks (less per-task setup)

Usage::

    SPARK_GRAFT_AB_CPUS=16 SPARK_GRAFT_KG_CONVS=25000 \
        python scripts/diag_shuffle_configs.py

Interleaves configs within each rep so every config sees the same ambient
interference mix; prints a markdown table for BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# bench.py's adopted default on tmpfs is shuffle-compression OFF, so both
# sides of the compression trade are pinned EXPLICITLY here: the baseline
# leg forces compression ON (the pre-adoption config this grid originally
# measured against) and the last leg forces it OFF (the adopted default).
CONFIGS: list[tuple[str, dict[str, str]]] = [
    ("baseline (lz4 shuffle-compress ON, 32k, arrow2048, ppc4)",
     {"SPARK_GRAFT_SHUFFLE_COMPRESS": "true"}),
    ("zstd codec", {"SPARK_GRAFT_CODEC": "zstd",
                    "SPARK_GRAFT_SHUFFLE_COMPRESS": "true"}),
    ("1m shuffle buffer", {"SPARK_GRAFT_SHUFFLE_BUFFER": "1m",
                           "SPARK_GRAFT_SHUFFLE_COMPRESS": "true"}),
    ("arrow batch 8192", {"SPARK_GRAFT_ARROW_BATCH": "8192",
                          "SPARK_GRAFT_SHUFFLE_COMPRESS": "true"}),
    ("zstd + 1m buffer + arrow8192", {
        "SPARK_GRAFT_CODEC": "zstd",
        "SPARK_GRAFT_SHUFFLE_BUFFER": "1m",
        "SPARK_GRAFT_ARROW_BATCH": "8192",
        "SPARK_GRAFT_SHUFFLE_COMPRESS": "true",
    }),
    ("no shuffle compression (adopted tmpfs default)",
     {"SPARK_GRAFT_SHUFFLE_COMPRESS": "false"}),
]

# Focused subset via SPARK_GRAFT_AB_ONLY="baseline,no shuffle" (comma
# separated substring match) — reruns don't have to pay the full grid.
_only = __import__("os").environ.get("SPARK_GRAFT_AB_ONLY")
if _only:
    keys = [k.strip().lower() for k in _only.split(",")]
    CONFIGS = [c for c in CONFIGS if any(k in c[0].lower() for k in keys)]


def run_leg(cpus: int, extra_env: dict[str, str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_KG_CONVS", "25000")
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_KG_REPS"] = "1"
    env.update(extra_env)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--kg-only"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(f"leg {extra_env} produced no JSON (rc={out.returncode}); "
              "stderr tail:\n" + "\n".join(out.stderr.splitlines()[-20:]),
              file=sys.stderr)
        return {}
    return json.loads(lines[-1])


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_AB_CPUS", "16"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    best: dict[str, dict] = {}
    for r in range(reps):
        for name, extra in CONFIGS:
            res = run_leg(cpus, extra)
            if not res:
                continue
            kg = res["kg"]
            print(f"rep{r} [{name}]: build={kg['kg_build_sec']:.1f}s "
                  f"thr={kg['triples_per_sec']:.0f}/s", file=sys.stderr)
            if (name not in best
                    or kg["triples_per_sec"]
                    > best[name]["triples_per_sec"]):
                best[name] = kg
    print(f"\n### Shuffle-config A/B ({cpus} pinned cores, "
          f"{os.environ.get('SPARK_GRAFT_KG_CONVS', '25000')} convs, "
          f"best-of-{reps})\n")
    print("| config | build wall | triples/s | vs baseline |")
    print("|---|---|---|---|")
    base = best.get(CONFIGS[0][0], {}).get("triples_per_sec")
    for name, _ in CONFIGS:
        if name not in best:
            print(f"| {name} | FAILED | — | — |")
            continue
        kg = best[name]
        rel = (f"{kg['triples_per_sec'] / base:.2f}x"
               if base else "—")
        print(f"| {name} | {kg['kg_build_sec']:.1f} s "
              f"| {kg['triples_per_sec']:.0f} | {rel} |")


if __name__ == "__main__":
    main()
