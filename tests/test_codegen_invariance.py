"""Codegen-path invariance (round 8; SURVEY §5.3 layer 15).

Whole-stage codegen is not all-or-nothing in production: Spark
SILENTLY falls back to interpreted execution per-stage when a
generated method exceeds the JVM's 64 KB bytecode limit or the
generated class blows the constant pool — which happens exactly on
the WIDE plans a 100 TB pipeline accumulates (many-column projections,
deep case-when chains, big HOF lambdas). So on a real cluster some
partitions of a query's lifetime run compiled and others interpreted,
and any divergence between the two expression paths (a codegen
template bug, an eval-vs-doGenCode mismatch in a builtin) silently
corrupts results mid-job.

This layer runs representative expression-heavy keys under
CODEGEN_ONLY and NO_CODEGEN (+ wholeStage off) and requires bit-equal
results — on the clean fixture AND the hostile corpus (NULLs,
malformed JSON, extreme magnitudes: where eval/doGenCode edge cases
live). All runtime-settable confs, restored after each run.
"""

from __future__ import annotations

import pytest

from noaa_etl_daily_spark.registry import load_all

from .conftest import SF_DIR
from .test_hostile_inputs import build_hostile_fixture

from ._sampling import default_sample

REGISTRY = load_all()

#: Representative keys per expression family most at risk of
#: eval-vs-codegen divergence: arithmetic/rounding, conditionals,
#: string kernels, datetime parsing, JSON, HOF lambdas, window frames,
#: hash kernels, entropy/log math, and a multi-stage pipeline.
CODEGEN_KEYS = [
    "agg_groupby_multi",
    "agg_percentile",
    "fn_math",
    "fn_rounding_modes",
    "fn_conditional",
    "fn_string_basic",
    "fn_string_codec",
    "fn_datetime_format_patterns",
    "fn_json_roundtrip_nested",
    "fn_array_higher_order",
    "fn_hash",
    "win_running_sum",
    "win_range_frame",
    "llm_text_char_entropy",
    "llm_dedup_near_minhash",
    "pipeline_regional_volume",
]

_MODES = {
    "compiled": {
        "spark.sql.codegen.wholeStage": "true",
        "spark.sql.codegen.factoryMode": "CODEGEN_ONLY",
    },
    "interpreted": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
}


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    return build_hostile_fixture(str(tmp_path_factory.mktemp("cg_hostile")))


def _canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


def _run_mode(spark, name, sf, mode):
    prior = {k: spark.conf.get(k) for k in _MODES[mode]}
    try:
        for k, v in _MODES[mode].items():
            spark.conf.set(k, v)
        return _canon(REGISTRY[name].builder(spark, sf))
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", default_sample(CODEGEN_KEYS, 2, salt="cg"))
def test_codegen_vs_interpreted_clean(spark, name):
    compiled = _run_mode(spark, name, SF_DIR, "compiled")
    interpreted = _run_mode(spark, name, SF_DIR, "interpreted")
    assert compiled == interpreted, (
        f"{name}: compiled and interpreted expression paths disagree"
    )
    assert len(compiled) > 0


@pytest.mark.parametrize("name", default_sample(CODEGEN_KEYS, 2, salt="cg"))
def test_codegen_vs_interpreted_hostile(spark, hostile_dir, name):
    compiled = _run_mode(spark, name, hostile_dir, "compiled")
    interpreted = _run_mode(spark, name, hostile_dir, "interpreted")
    assert compiled == interpreted, (
        f"{name}: paths disagree on the hostile corpus"
    )
