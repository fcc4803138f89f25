"""Registry-wide physical-strategy audit: every registered query
executed under the session default AND under an adversarial physical
conf set, canonical results compared.

Usage: [SPARK_GRAFT_AUDIT_MODE=<mode>] python tools_strategy_audit.py [key ...]

Modes: smj (default; broadcasts disabled, sort-merge preferred),
shj (broadcasts disabled, shuffle-hash preferred), rowreader (all
vectorized parquet/ORC readers off), sortagg (ObjectHashAggregate off +
hash-to-sort aggregate replacement on), nocodegen (whole-stage codegen
off, interpreted expression evaluation).

The standing per-run sweep (tests/test_physical_strategy_invariance.py)
covers the 18 join-bearing representatives on every suite run; this
tool is the full-registry one-off for round audits — same spirit as
the round-6 hostile differential's first full run. Sketch keys whose
merge tree is layout-dependent by design (the partition-invariance
whitelist) are compared by the same named bounds there, so they are
EXCLUDED here rather than re-whitelisted.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession  # noqa: F401  (session via engine)

sys.path.insert(0, ".")

from noaa_etl_daily_spark.registry import load_all  # noqa: E402
from noaa_etl_daily_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

#: Merge-tree-dependent-by-design sketches (named bounds asserted in
#: tests/test_partition_invariance.py and
#: tests/test_physical_strategy_invariance.py instead of
#: bit-equality). agg_hll_sketch_merge joined the list as a LIVE
#: round-9 finding: DataSketches HLL union estimates moved 2000→1999
#: under forced SortAggregate (merge-order sensitivity the layout and
#: retry axes never exposed).
SKIP = {
    "agg_kll_quantile_sketch",
    "agg_approx_quantile",
    "agg_freq_items",
    "agg_hll_sketch_merge",
    # KLL-edge PSI: the sketch's compaction tree (hence the exact edge
    # values, hence razor-edge bin assignments) is merge-order
    # dependent; the layout-free bound is the property test
    # (partition exactness + PSI within 0.002 of the exact key)
    "agg_psi_kll_edges",
}

import os  # noqa: E402

_MODES = {
    "smj": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "shj": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
    "rowreader": {
        "spark.sql.parquet.enableVectorizedReader": "false",
        "spark.sql.parquet.enableNestedColumnVectorizedReader": "false",
        "spark.sql.orc.enableVectorizedReader": "false",
        "spark.sql.inMemoryColumnarStorage.enableVectorizedReader": "false",
    },
    "sortagg": {
        "spark.sql.execution.useObjectHashAggregateExec": "false",
        "spark.sql.execution.replaceHashWithSortAgg": "true",
    },
    "nocodegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
}

MODE = os.environ.get("SPARK_GRAFT_AUDIT_MODE", "smj")
if MODE not in _MODES:
    sys.exit(
        f"unknown SPARK_GRAFT_AUDIT_MODE={MODE!r}; "
        f"valid modes: {', '.join(sorted(_MODES))}"
    )
SMJ = _MODES[MODE]


def canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


def main() -> None:
    spark = get_spark(app_name="strategy-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    keys = sys.argv[1:] or [k for k in sorted(reg) if k not in SKIP]
    bad = 0
    for name in keys:
        try:
            base = canon(reg[name].builder(spark, SF))
            prior = {k: spark.conf.get(k, None) for k in SMJ}
            try:
                for k, v in SMJ.items():
                    spark.conf.set(k, v)
                smj = canon(reg[name].builder(spark, SF))
            finally:
                for k, v in prior.items():
                    spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}", flush=True)
            bad += 1
            continue
        if base != smj:
            print(
                f"DIVERGED {name}: default {len(base)} rows vs {MODE} "
                f"{len(smj)} rows", flush=True,
            )
            bad += 1
        else:
            print(f"ok [{MODE}] {name} ({len(base)} rows)", flush=True)
    print(f"done: {len(keys) - bad}/{len(keys)} ok")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
