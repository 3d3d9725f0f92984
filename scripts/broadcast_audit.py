"""Catalog-wide BROADCAST audit against the 100x fixture (plan-only, no
execution): the q95/q167 melt class — Catalyst mis-sizes a derived frame
(exploded shingles were the observed case) and broadcasts something
data-sized — is invisible at sf0.001/sf0.01 because there everything
broadcasts legitimately, and invisible to 10x probes that happen to fit
in memory.  Planning against the materialized 100x parquet gives the
optimizer REAL leaf statistics, so whatever it still chooses to
broadcast is what it would broadcast at scale.

Flags, per query:
- explode-broadcast: a BroadcastExchange whose subtree contains a
  Generate/explode node (estimates after explode are unreliable;
  the observed OOM class);
- fact-broadcast: a BroadcastExchange whose subtree scans one of the
  big tables with NO aggregation/limit between scan and exchange
  (a full fact-sized build side).

Requires .bench_scaled/sf0.1x100 (materialized by any BENCH_SCALE=100
probe).  Exit 1 on any explode-broadcast; fact-broadcast sites print
for review (panel filters legitimately shrink a fact scan).

    python scripts/broadcast_audit.py [name-filters...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get(
    "BROADCAST_AUDIT_SF",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_scaled", "sf0.1x100"),
)
BIG_TABLES = ("documents", "embeddings", "events", "lineitem", "orders")
SHRINKERS = ("HashAggregate", "TakeOrderedAndProject", "CollectLimit",
             "GlobalLimit", "LocalLimit", "SortAggregate",
             "ObjectHashAggregate")


def _content_start(line: str) -> int:
    """Tree depth of a plan line = column where the node text begins."""
    m = re.search(r"[+*]- |^(\s*)(?=\S)", line)
    if "+- " in line:
        return line.index("+- ") + 3
    s = line.lstrip(": ")
    return len(line) - len(s)


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines belonging to the subtree rooted at lines[i]."""
    root = _content_start(lines[i])
    out = []
    for j in range(i + 1, len(lines)):
        if not lines[j].strip():
            continue
        if _content_start(lines[j]) <= root:
            break
        out.append(lines[j])
    return out


def audit_plan(plan: str) -> tuple[list[str], list[str]]:
    lines = plan.splitlines()
    explode_hits, fact_hits = [], []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        sub = _subtree(lines, i)
        text = "\n".join(sub)
        # only an explode of a data-built ARRAY COLUMN (a bare column
        # reference like `explode(sh#13)`) is the data-dependent
        # blow-up class; `explode([...])` literals (q60's ±1 bands) and
        # `explode(array(expr, ...))` constant-width fan-outs (the
        # multiprobe bucket sets over pinned panels, q160/q164) are
        # bounded by construction
        data_explodes = re.findall(
            r"Generate explode(?:_outer)?\([a-zA-Z_][a-zA-Z0-9_]*#\d+[,)]",
            text,
        )
        if data_explodes and not any(s in text for s in SHRINKERS):
            # an aggregate between explode and exchange bounds the build
            # side (q91's ≤m-row bloom bit table); only the UNaggregated
            # exploded frame is the q95/q167 melt class
            explode_hits.append(line.strip()[:90])
            continue
        scans = [
            t for t in BIG_TABLES
            if re.search(rf"Scan parquet[^\n]*[/ ]{t}", text)
            or re.search(rf"FileScan parquet[^\n]*{t}", text)
        ]
        if scans and not any(s in text for s in SHRINKERS):
            fact_hits.append(f"{','.join(scans)}: {line.strip()[:80]}")
    return explode_hits, fact_hits


def main() -> int:
    from pyspark.sql import SparkSession

    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

    from nyc_tlc_analytics_pipeline_spark.core.session import build_session

    only = sys.argv[1:]
    if not os.path.exists(os.path.join(SF, "_ALL_TABLES_DONE")):
        print(f"100x fixture missing at {SF}; run a BENCH_SCALE=100 probe first")
        return 2
    # the tuned session (8g driver): some builders run real driver-side
    # jobs at build time (ivf_centroids' k-row collect), and a 1g
    # default driver dies planning the 100x catalog
    spark = build_session(app_name="broadcast-audit", master="local[8]")

    n_explode, n_fact, n_err = 0, 0, 0
    names = [n for n in QUERIES if not only or any(f in n for f in only)]
    for name in names:
        try:
            plan = (
                QUERIES[name]
                .build(spark, SF)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — audit keeps going
            print(
                f"ERR  {name}: {type(ex).__name__}: {str(ex)[:120]}",
                flush=True,
            )
            n_err += 1
            # some builders EXECUTE at build time (connected_components'
            # eager fixpoint checkpoints); an executor OOM there kills
            # the whole local JVM and every later query would read as
            # ConnectionRefused — probe the session and rebuild if dead
            try:
                spark.range(1).count()
            except Exception:  # noqa: BLE001 — JVM is gone
                try:
                    spark.stop()
                except Exception:  # noqa: BLE001
                    pass
                spark = build_session(
                    app_name="broadcast-audit", master="local[8]"
                )
                print(f"     (session died on {name}; rebuilt)", flush=True)
            continue
        ex_hits, fact_hits = audit_plan(plan)
        if ex_hits:
            n_explode += len(ex_hits)
            for h in ex_hits:
                print(f"EXPLODE-BROADCAST {name}: {h}", flush=True)
        if fact_hits:
            n_fact += len(fact_hits)
            for h in fact_hits:
                print(f"fact-broadcast    {name}: {h}", flush=True)
    print(
        f"\naudited {len(names)} queries at 100x: "
        f"{n_explode} explode-broadcasts, {n_fact} fact-broadcasts, {n_err} errors"
    )
    spark.stop()
    return 1 if n_explode else 0


if __name__ == "__main__":
    raise SystemExit(main())
