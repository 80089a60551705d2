"""Skewed-fixture stress (SURVEY §7.4 hard part 3, VERDICT r4 item 5).

Runs the full KG build over an EXTREME-skew fixture — every 2500th
conversation is a 1,150-turn giant (100× the ~11.5-turn median) and one
hub entity carries ~10% of all mentions (`ScaledVocab(hub_rate=0.1)`) —
with the Spark UI enabled, then pulls REAL per-task executorRunTime
distributions for every completed stage from the REST status API and
pins the straggler ratio max/median.

A stage "fails" only when it is both skewed AND material:
ratio >= RATIO_MAX and max task >= MATERIAL_MS (sub-material stages with
2-3 tasks produce meaningless ratios; a 50 ms median vs 300 ms max
straggler costs nothing at any scale). The replay-bucket stage is
expected to carry the giant component's bucket as its longest task —
bounded by the O(E+V) frontier walk, not the component's square.

    N_CONVS=2000 CPUS=8 python scripts/diag_skew_stress.py

Prints a per-stage table and ONE JSON verdict line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

N = int(os.environ.get("N_CONVS", "2000"))
CPUS = int(os.environ.get("CPUS", "8"))
RATIO_MAX = float(os.environ.get("SKEW_RATIO_MAX", "4"))
MATERIAL_MS = float(os.environ.get("SKEW_MATERIAL_MS", "5000"))
UI_PORT = int(os.environ.get("SKEW_UI_PORT", "4050"))


_UI_BASE = [f"http://localhost:{UI_PORT}"]


def _get(path: str):
    # _UI_BASE is rebound to THIS session's uiWebUrl after startup — a
    # port collision makes Spark bind port+1 (spark.port.maxRetries), and
    # querying the fixed port would read some OTHER app's stages
    with urllib.request.urlopen(
        f"{_UI_BASE[0]}/api/v1{path}", timeout=30
    ) as r:
        return json.loads(r.read().decode("utf-8"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-skew-stress")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.default.parallelism", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if ui:
        _UI_BASE[0] = ui

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.fixtures import ScaledVocab, transcripts_df
    from graphrag_rs_spark.plans.pipeline import build_graph

    vocab = ScaledVocab(
        n_persons=max(50, N // 2), n_orgs=max(20, N // 5), hub_rate=0.1
    )
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4,
        vocab=vocab, extreme_skew=True,
    ).cache()
    n_turns = transcripts.count()

    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    t0 = time.perf_counter()
    tables = build_graph(spark, transcripts, cfg)
    n_edges = tables["edges"].count()
    n_nodes = tables["nodes"].count()
    wall = time.perf_counter() - t0
    print(
        f"skewed build: {N} convs / {n_turns} turns -> "
        f"{n_edges} edges / {n_nodes} nodes in {wall:.1f}s",
        file=sys.stderr,
    )

    app_id = _get("/applications")[0]["id"]
    stages = _get(f"/applications/{app_id}/stages?status=COMPLETE")
    rows = []
    worst = (0.0, None)
    failures = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        n_tasks = st.get("numCompleteTasks", 0)
        if n_tasks < 2:
            continue
        try:
            summ = _get(
                f"/applications/{app_id}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.0,0.5,1.0"
            )
        except Exception:  # noqa: BLE001 — stage evicted from the UI store
            continue
        lo, med, hi = summ["executorRunTime"]
        # med == 0 with a real max IS maximally skewed; use a large FINITE
        # sentinel so the verdict line stays strict JSON (inf -> Infinity
        # is not parseable by non-Python consumers)
        ratio = (hi / med) if med > 0 else (0.0 if hi == 0 else 1e9)
        material = hi >= MATERIAL_MS
        rows.append((sid, st["name"].split(" ")[0], n_tasks, med, hi, ratio,
                     material))
        if material and ratio > worst[0]:
            worst = (ratio, sid)
        if material and ratio >= RATIO_MAX:
            failures.append(
                {"stage": sid, "name": st["name"].split(" ")[0],
                 "tasks": n_tasks, "median_ms": med, "max_ms": hi,
                 "ratio": round(ratio, 2)}
            )

    print("\n| stage | op | tasks | median ms | max ms | max/med | material |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|---|", file=sys.stderr)
    for sid, name, n_tasks, med, hi, ratio, material in sorted(
        rows, key=lambda r: -r[4]
    )[:25]:
        print(
            f"| {sid} | {name} | {n_tasks} | {med:.0f} | {hi:.0f} "
            f"| {ratio:.2f} | {'Y' if material else '-'} |",
            file=sys.stderr,
        )

    verdict = {
        "n_convs": N,
        "n_turns": n_turns,
        "cpus": CPUS,
        "build_sec": round(wall, 1),
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "stages_checked": len(rows),
        "material_worst_ratio": round(worst[0], 2),
        "material_worst_stage": worst[1],
        "ratio_max": RATIO_MAX,
        "material_ms": MATERIAL_MS,
        "failures": failures,
        "pass": not failures,
    }
    print(json.dumps(verdict))
    spark.stop()
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
