"""Benchmark harness. Runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Materialization uses the noop sink (full execution, no driver collect) so
timings measure the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from noaa_etl_daily_spark.registry import load_all
from noaa_etl_daily_spark.session import get_spark

# Headline set: one representative per operator family; kept in sync with
# the registry as waves land. Overridable: bench.py q1 q2 ...
DEFAULT_HEADLINE = [
    "agg_groupby_multi",
    "join_broadcast_chain",
    "join_asof",
    "win_topk_per_group",
    "agg_pivot",
    "topk_limit",
    "agg_count_distinct",
    "filter_compound",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = sys.argv[1:] or [n for n in DEFAULT_HEADLINE if n in registry]
    unknown = [n for n in names if n not in registry]
    if unknown or not names:
        sys.exit(
            f"unknown queries: {unknown or '(none requested)'}; "
            f"available: {sorted(registry)}"
        )

    spark = get_spark(app_name="noaa-etl-daily-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: touch every fixture table (parquet footers + schema
    # inference) and run one query end-to-end (JVM JIT, codegen cache) so
    # per-query times measure the plan, not first-touch overhead.
    from noaa_etl_daily_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()
    registry[names[0]].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in names:
        df = registry[name].builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
