"""Dump explain("formatted") for the headline queries to plans/r13/.

Usage: python tools_plans_r13.py before|after [query ...]

Writes plans/r13/<query>_<tag>.txt with the formatted physical plan as
produced under the bench session configuration (same conf path bench.py
uses: AQE off below 1 GB input, shuffle partitions sized to input), so
the committed plans match what the bench actually executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import DEFAULT_HEADLINE, input_bytes, sized_shuffle_partitions
from noaa_etl_daily_spark.registry import load_all
from noaa_etl_daily_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    names = sys.argv[2:] or [n for n in DEFAULT_HEADLINE if n in registry]

    if input_bytes(sf_dir) < (1 << 30):
        os.environ["SPARK_GRAFT_AQE"] = "false"
    spark = get_spark(app_name="noaa-etl-daily-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(sized_shuffle_partitions(sf_dir))
    )

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = registry[name].builder(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_exchange = text.count("Exchange")
        n_py = text.count("EvalPython") + text.count("MapInPandas") + text.count(
            "ArrowEvalPython"
        )
        print(f"{name}: wrote {path} (Exchange={n_exchange}, PyNodes={n_py})")
    spark.stop()


if __name__ == "__main__":
    main()
