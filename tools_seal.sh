#!/usr/bin/env bash
# End-of-round SEAL RITUAL (VERDICT r5, task 3) — run before the final
# commit of a round. Encodes the checks that must not be skippable by
# memory, in the order cheapest-fail-first:
#
#   1. full local suite at sf0.01 (differential + property + plan lint)
#   2. the 10x-scale Spark-vs-DuckDB value diff at sf0.1 — the only
#      check where the scale_rank range shuffles genuinely split data
#   3. regenerate CERTIFIED.md from the driver record
#   4. one headline bench line (sanity, not the official record)
#
# Usage: bash tools_seal.sh
set -euo pipefail
cd "$(dirname "$0")"

echo "== seal 1/4: full suite (sf0.01) =="
python -m pytest tests/ -x -q

echo "== seal 2/4: sf0.1 full differential (oracle value-diff at 10x) =="
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 \
    python -m pytest tests/test_oracle.py -x -q

echo "== seal 3/4: regenerate CERTIFIED.md =="
python tools_certified.py

echo "== seal 4/4: bench sanity line =="
python bench.py

echo "SEAL COMPLETE"
