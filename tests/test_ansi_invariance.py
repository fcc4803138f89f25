"""ANSI-mode invariance (round 8; SURVEY §5.3 layer 14).

``spark.sql.ansi.enabled`` is the one session conf a cluster admin
most commonly flips (Spark 4 defaults it ON; many 3.x-migrated estates
pin it OFF), and it changes EXPRESSION semantics, not plans: non-ANSI
casts silently NULL instead of erroring, integral arithmetic wraps
instead of raising, ``element_at``/``substring`` edge behavior shifts.
An engine whose answers depend on the flag is not portable across
deployments — and the dependence hides exactly where inputs are ugly,
so the sweep runs on BOTH the clean fixture and the poisoned hostile
corpus (malformed JSON, 1e12 prices, dangling FKs, far-future
timestamps — the inputs non-ANSI semantics silently swallow).

Representative keys, one per expression family that ANSI touches:
try_* arithmetic, casts/codecs, rounding, bitwise, datetime parsing,
intervals, array indexing/HOFs, percentiles/ntile (integer division),
log/entropy math, modular checksums, and the Markov/attribution chain
(division-heavy). The engine's own discipline (try_divide, try_cast,
explicit rounding) is what SHOULD make these identical; this layer
makes that claim executable.
"""

from __future__ import annotations

import pytest

from noaa_etl_daily_spark.registry import load_all

from .conftest import SF_DIR
from .test_hostile_inputs import build_hostile_fixture

from ._sampling import default_sample

REGISTRY = load_all()

ANSI_KEYS = [
    "fn_try_arithmetic",
    "fn_math",
    "fn_array_basic",
    "fn_array_higher_order",
    "fn_rounding_modes",
    "fn_bitwise",
    "fn_datetime_format_patterns",
    "fn_interval_arithmetic",
    "fn_string_codec",
    "fn_luhn_checksum",
    "fn_conditional",
    "fn_json_roundtrip_nested",
    "fn_map_from_json",
    "agg_groupby_multi",
    "agg_percentile",
    "agg_log2_histogram_percentiles",
    "win_rank_dense_ntile",
    "evt_markov_removal_attribution",
    "llm_text_char_entropy",
    "llm_interpolated_lm_ppl",
    # the 20 keys the one-off registry-wide ANSI audit (round 8) found
    # divergent on the hostile corpus — ALL via one root cause,
    # size(NULL) = legacy -1 when spark.sql.legacy.sizeOfNull tracks
    # ansi=false. Fixed by pinning the conf in configure_session;
    # these stay here as the regression set.
    "llm_annotation_kappa",
    "llm_context_bucket_waste",
    "llm_dataset_card_stats",
    "llm_dataset_mixture_weights",
    "llm_eval_winrate",
    "llm_eval_winrate_atscale",
    "llm_feature_hashing_vector",
    "llm_multimodal_audio_chunks",
    "llm_pack_token_shards",
    "llm_quality_composite_filter",
    "llm_readability_complexity",
    "llm_safety_keyword_filter",
    "llm_score_calibration_ece",
    "llm_segment_dedup_global",
    "llm_text_lang_stats",
    "llm_text_langid",
    "llm_token_budget_selection",
    "llm_token_budget_selection_atscale",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    return build_hostile_fixture(str(tmp_path_factory.mktemp("ansi_hostile")))


def _canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


def _both_modes(spark, name, sf):
    prior = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        on = _canon(REGISTRY[name].builder(spark, sf))
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = _canon(REGISTRY[name].builder(spark, sf))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)
    return on, off


@pytest.mark.parametrize("name", default_sample(ANSI_KEYS, 2, salt="ansi"))
def test_ansi_mode_invariant_clean(spark, name):
    on, off = _both_modes(spark, name, SF_DIR)
    assert on == off, f"{name}: answer depends on spark.sql.ansi.enabled"
    assert len(on) > 0


@pytest.mark.parametrize("name", default_sample(ANSI_KEYS, 2, salt="ansi"))
def test_ansi_mode_invariant_hostile(spark, hostile_dir, name):
    """Same invariance where it actually hides: the poisoned corpus's
    malformed/overflow/dangling inputs are exactly what non-ANSI
    semantics silently swallow instead of erroring."""
    on, off = _both_modes(spark, name, hostile_dir)
    assert on == off, (
        f"{name}: hostile-corpus answer depends on spark.sql.ansi.enabled"
    )
