"""Scalar functions: string / date / math / conditional / array / json /
hash (SURVEY.md §2.8).

All eleven queries use only built-in ``pyspark.sql.functions`` — they stay
JVM-side inside WholeStageCodegen, and predicates/projections over them
remain Catalyst-optimizable. At 100 TB this whole surface is "free": scalar
expressions pipeline inside the scan stage with zero shuffles.

Cross-dialect discipline (SURVEY.md §7.4 G4):

- ``dayofweek``: Spark is Sun=1..Sat=7, DuckDB is Sun=0..Sat=6 — the oracle
  adds 1.
- DuckDB ``year``/``length``/``len``/``date_diff`` return BIGINT where Spark
  returns INT; DuckDB ``ceil``/``floor`` return DOUBLE where Spark returns
  BIGINT — the oracle CASTs to Spark's types so the driver's schema check
  passes.
- Transcendentals (``ln``/``pow``) are rounded on both sides: Java Math and
  C libm may differ in the last ulp.
- Regexes keep to the dialect-common subset (anchors, classes, groups — no
  lookaround), per G4.
- Hash inputs avoid double columns (double→string rendering differs between
  engines); int/string renderings are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS INTEGER) AS name_len,
           trim(' ' || p_name || ' ') AS name_trimmed,
           substring(p_type, 1, 5) AS type_prefix,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           concat_ws('-', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/length/lpad/concat_ws — the station-name
    / code normalization surface of a NOAA-style ETL."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "fn_string_split_regex",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           regexp_extract(text, '^([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(substring(text, 1, 40), '[aeiou]', '*', 'g') AS devoweled
    FROM documents
    """,
)
def fn_string_split_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / regexp_extract / regexp_replace over the document corpus —
    the tokenization primitives under §2.10's text analysis. Note Spark's
    regexp_replace is global by default; DuckDB needs the 'g' flag."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        # NULL-guarded: bare size(NULL) is ANSI-MODE-DEPENDENT (NULL
        # under ansi=true, legacy -1 under ansi=false) — caught by the
        # round-8 ANSI invariance sweep on the hostile NULL-text doc;
        # DuckDB len(NULL) is NULL, so the guard is also oracle parity
        F.when(toks.isNotNull(), F.size(toks)).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.regexp_extract(F.col("text"), r"^([a-z]+) ([a-z]+)", 2).alias(
            "second_word"
        ),
        F.regexp_replace(F.substring("text", 1, 40), r"[aeiou]", "*").alias(
            "devoweled"
        ),
    )


@register(
    "fn_date_parts",
    oracle="""
    SELECT event_id,
           CAST(year(ts)  AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS mo,
           CAST(day(ts)   AS INTEGER) AS d,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(ts) AS INTEGER) AS doy,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(minute(ts) AS INTEGER) AS mi
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    """,
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar part extraction (the per-day bucketing every daily ETL
    does). dayofweek numbering differs across engines (Spark Sun=1,
    DuckDB Sun=0) — reconciled in the oracle, G4."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
    )


@register(
    "fn_date_trunc_diff",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           date_trunc('month', l_shipdate) AS ship_month,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', l_shipdate)
                AS INTEGER) AS days_since_epoch_start,
           CAST(l_shipdate + INTERVAL 3 MONTH AS DATE) AS ship_plus_3mo
    FROM lineitem
    """,
)
def fn_date_trunc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc + day arithmetic + calendar-month addition. DuckDB
    ``date_diff(part, start, end)`` computes end-start (opposite arg order
    to Spark's ``datediff(end, start)``) — G4. Spark ``add_months`` and
    DuckDB ``+ INTERVAL MONTH`` agree on end-of-month clamping (both
    post-Spark-3.0 semantics)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        F.datediff(
            F.col("l_shipdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_epoch_start"),
        F.add_months(F.col("l_shipdate"), 3).alias("ship_plus_3mo"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000.0) AS abs_centered,
           -- + 0.0 normalizes -0.0 (negative price x zero discount) to
           -- +0.0, matching Spark's BigDecimal round (G14b)
           round(l_extendedprice * l_discount, 4) + 0.0 AS rounded_disc,
           CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_floor,
           -- domain guards (G11): ln/sqrt of a negative hostile row is
           -- NULL on both engines, not a DuckDB Out-of-Range / a
           -- Spark NaN
           CASE WHEN l_extendedprice + 1.0 > 0
                THEN round(ln(l_extendedprice + 1.0), 8) END AS log_price,
           CASE WHEN l_quantity >= 0
                THEN round(sqrt(l_quantity), 8) END AS sqrt_qty,
           round(pow(l_discount + 1.0, 2.0), 8) AS disc_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/sqrt/pow/sign/mod — the unit-scaling math of
    the GHCN value/10 pattern. Transcendentals rounded to 8 decimals on
    both sides (last-ulp libm drift, G2); ceil/floor CAST in the oracle
    (DuckDB returns DOUBLE, Spark BIGINT)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_centered"),
        # round to 4: price (2 decimals) × discount (2 decimals) has exactly
        # 4 decimal digits, so 4-digit rounding is exact on both engines;
        # rounding to 3 would land on .xxx5 midpoints where Spark
        # (BigDecimal HALF_UP) and DuckDB (C-library) tie-break differently.
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "rounded_disc"
        ),
        F.ceil(F.col("l_extendedprice") / 100.0).alias("price_ceil"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("price_floor"),
        # domain guards (G11): ln/sqrt of a negative hostile row is
        # NULL on both engines (Spark would otherwise emit NULL/NaN
        # while DuckDB raises Out of Range)
        F.when(
            F.col("l_extendedprice") + 1.0 > 0,
            F.round(F.log(F.col("l_extendedprice") + 1.0), 8),
        ).alias("log_price"),
        F.when(
            F.col("l_quantity") >= 0, F.round(F.sqrt("l_quantity"), 8)
        ).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_discount") + 1.0, 2.0), 8).alias("disc_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 20 THEN 'standard'
                ELSE 'small' END AS qty_band,
           coalesce(nullif(l_returnflag, 'N'), 'no-return') AS return_kind,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0.0 END
               AS finished_price
    FROM lineitem
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains, coalesce/nullif, greatest/least — the quality-flag
    branching of a validation stage. All conditions on raw columns so
    Catalyst can still prune/push around them."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 20, "standard")
        .otherwise("small")
        .alias("qty_band"),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("no-return")
        ).alias("return_kind"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice"))
        .otherwise(0.0)
        .alias("finished_price"),
    )


@register(
    "fn_array_basic",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           coalesce(list_contains(toks, 'join'), FALSE) AS has_join,
           toks[1] AS first_tok,
           coalesce(array_to_string(toks[2:4], ' '), '') AS toks_2_to_4,
           coalesce(array_to_string(list_sort(toks[1:5]), ' '), '')
             AS first5_sorted
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def fn_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_contains / element_at / slice / sort_array. Spark
    element_at and DuckDB list indexing are both 1-based; Spark
    slice(arr, start, length) maps to DuckDB's inclusive arr[start:end].
    Array-valued results cross the oracle boundary serialized with
    array_join/array_to_string (SURVEY §7.4 G7): the comparator
    canonicalizes via pandas sort_values, which cannot hash list cells.
    Tokens are space-split so a space joiner is collision-free."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # coalesce mirrors the oracle's: a NULL-text doc renders '' /
    # false on BOTH engines instead of a dtype-unstable NULL cell
    return docs.select(
        "doc_id",
        # NULL-guarded size: see fn_string_split_regex (ANSI-mode
        # dependence of size(NULL); DuckDB len(NULL) is NULL)
        F.when(toks.isNotNull(), F.size(toks)).alias("n_tokens"),
        F.coalesce(F.array_contains(toks, "join"), F.lit(False)).alias(
            "has_join"
        ),
        F.try_element_at(toks, F.lit(1)).alias("first_tok"),
        F.coalesce(F.array_join(F.slice(toks, 2, 3), " "), F.lit("")).alias(
            "toks_2_to_4"
        ),
        F.coalesce(
            F.array_join(F.sort_array(F.slice(toks, 1, 5)), " "), F.lit("")
        ).alias("first5_sorted"),
    )


@register(
    "fn_array_explode",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           CAST(unnest(range(0, len(string_split(text, ' ')))) AS INTEGER)
               AS pos
    FROM documents
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → one row per element with its 0-based position.
    The DuckDB oracle zips two parallel unnests (token + range index) —
    DuckDB aligns same-SELECT unnests positionally. At 100 TB explode is
    a narrow (no-shuffle) row multiplier; memory scales per-row, not
    per-partition."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    ).select("doc_id", "token", "pos")


@register(
    "fn_array_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(
               list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
               'sum'), 4) AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
               AS n_positive,
           round(list_aggregate(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               'max'), 6) AS max_val
    FROM embeddings
    """,
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate) over
    the embedding vectors — JVM-side lambdas, no Python boundary. Both
    engines fold the 64-element list left-to-right so the double sum is
    order-identical; rounded anyway per G2."""
    emb = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double") * x
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias(
            "n_positive"
        ),
        F.round(
            F.array_max(dbl),
            6,
        ).alias("max_val"),
    )


@register(
    "fn_map_from_json",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract(props, '$.k') END
                    AS BIGINT) AS k_typed,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS k_pointed
    FROM events
    """,
)
def fn_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access over events.props (the API-payload pattern):
    full parse via from_json→map plus point access via get_json_object.
    DuckDB json_extract returns a JSON value needing CAST — G4. Dirty
    payloads (malformed JSON, non-numeric values) parse to NULL, not a
    job kill: try_cast on the Spark side ≡ json_valid + TRY_CAST on the
    oracle side (G11; canonical integer grammar only, G14c)."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.element_at(
            F.from_json(F.col("props"), "map<string,bigint>"), "k"
        ).alias("k_typed"),
        F.get_json_object(F.col("props"), "$.k").try_cast("bigint").alias(
            "k_pointed"
        ),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sha256(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                            CAST(l_linenumber AS VARCHAR), l_returnflag,
                            l_linestatus)) AS row_sha,
           md5(concat_ws('|', CAST(l_orderkey AS VARCHAR), l_returnflag))
               AS short_md5
    FROM lineitem
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable cross-engine row hashing — the basis of exact dedup at scale
    (§2.10). sha256/md5 hex output is identical across engines; inputs are
    int/string only (double→string rendering differs, G4). Spark's
    xxhash64 is faster JVM-side but seed/spec-specific — not
    cross-checkable, so not used in oracled queries."""
    li = load(spark, sf_dir, "lineitem")
    ow = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sha2(ow, 256).alias("row_sha"),
        F.md5(
            F.concat_ws("|", F.col("l_orderkey").cast("string"), F.col("l_returnflag"))
        ).alias("short_md5"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 15 AS with_low_bits,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS mixed,
           l_orderkey << 2 AS shifted_up,
           l_orderkey >> 3 AS shifted_down
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (&, |, xor, shifts) — flag-mask decoding, the
    packed-fields surface of sensor/format headers. Pure codegen
    arithmetic; int64 two's-complement semantics agree across engines
    for non-negative keys."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("low_byte"),
        (F.col("l_orderkey").bitwiseOR(F.lit(15))).alias("with_low_bits"),
        (
            F.col("l_orderkey").bitwiseXOR(
                F.col("l_linenumber").cast("bigint")
            )
        ).alias("mixed"),
        F.shiftleft("l_orderkey", 2).alias("shifted_up"),
        F.shiftright("l_orderkey", 3).alias("shifted_down"),
    )


@register(
    "fn_levenshtein_fuzzy_match",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
)
def fn_levenshtein_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: nation-name pairs within
    Levenshtein distance 4 — the primitive behind station-name /
    entity reconciliation (IRAN↔IRAQ-style near-misses). Both engines
    implement classic Levenshtein, so the ints match exactly. The
    self-join is id-ordered over a *dimension* table; at 100 TB you
    never all-pairs a fact table — you block first (prefix/phonetic/
    length bucket) exactly like the MinHash band join, then compute
    distance only within blocks."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    a = nation.select(
        F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a")
    )
    b = nation.select(
        F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b")
    )
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 4)
    )


@register(
    "fn_haversine_distance",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey,
             radians(CAST(s_suppkey * 7 % 180 - 90 AS DOUBLE)) AS lat,
             radians(CAST(s_suppkey * 13 % 360 - 180 AS DOUBLE)) AS lon
      FROM supplier
    )
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           round(2 * 6371.0 * asin(sqrt(
               pow(sin((b.lat - a.lat) / 2), 2)
               + cos(a.lat) * cos(b.lat)
                 * pow(sin((b.lon - a.lon) / 2), 2))), 2) AS dist_km
    FROM pts a JOIN pts b ON a.s_suppkey < b.s_suppkey
    WHERE a.s_suppkey <= 20 AND b.s_suppkey <= 20
    """,
)
def fn_haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine great-circle distance between station coordinates —
    THE geo primitive of a NOAA pipeline (nearest-station lookup,
    radius filters). The fixtures carry no lat/lon, so deterministic
    pseudo-coordinates derive from supplier keys; the formula is the
    standard 2R·asin(√…) in double on both engines, rounded at 2dp
    (≈10 m) so last-ulp libm differences in sin/cos/asin can't split
    the hash. Pairwise over a 20-station subset — at scale the join is
    blocked by geohash/grid cell first, same discipline as every other
    pair-space in this repo."""
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey")
    pts = supplier.where(F.col("s_suppkey") <= 20).select(
        "s_suppkey",
        F.radians((F.col("s_suppkey") * 7 % 180 - 90).cast("double")).alias(
            "lat"
        ),
        F.radians((F.col("s_suppkey") * 13 % 360 - 180).cast("double")).alias(
            "lon"
        ),
    )
    a = pts.select(
        F.col("s_suppkey").alias("supp_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = pts.select(
        F.col("s_suppkey").alias("supp_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    hav = (
        F.pow(F.sin((F.col("lat_b") - F.col("lat_a")) / 2), 2)
        + F.cos("lat_a")
        * F.cos("lat_b")
        * F.pow(F.sin((F.col("lon_b") - F.col("lon_a")) / 2), 2)
    )
    return a.join(b, F.col("supp_a") < F.col("supp_b")).select(
        "supp_a",
        "supp_b",
        F.round(2 * 6371.0 * F.asin(F.sqrt(hav)), 2).alias("dist_km"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS k_val,
           coalesce(json_valid(props), FALSE) AS is_valid,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.missing') END
                    AS BIGINT) AS missing_val
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the Spark 4 VARIANT type:
    ``parse_json`` once into a binary variant, then typed point reads
    with ``variant_get`` / ``try_variant_get``. Unlike the string-typed
    ``get_json_object`` path (fn_map_from_json), variant parses the
    JSON ONCE into a binary-encoded tree; repeated field reads skip
    re-parsing — at 100 TB of event payloads that is the difference
    between one parse per row and one per extraction. Missing paths
    come back NULL from try_variant_get, mirroring the oracle's NULL
    json_extract; validity uses try_parse_json (NULL, not error, on
    malformed payloads) so is_valid=false matches the oracle's
    json_valid even on dirty input."""
    events = load(spark, sf_dir, "events")
    # try_parse_json + try_variant_get end to end: a malformed payload
    # or a non-numeric field value is NULL, never a job kill (G11) —
    # mirrored by json_valid + TRY_CAST on the oracle side; NULL props
    # reads as is_valid=false on both engines
    v = F.expr("try_parse_json(props)")
    return events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.expr("try_parse_json(props) IS NOT NULL").alias("is_valid"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_val"),
    )


@register(
    "fn_collation_lcase",
    oracle="""
    SELECT lower(o_orderpriority) AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM (
      SELECT CASE WHEN o_orderkey % 2 = 1 THEN upper(o_orderpriority)
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders
    )
    GROUP BY 1
    """,
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: grouping under UTF8_LCASE treats 'URGENT'
    and 'urgent' as the same key INSIDE the hash aggregate — no
    lower() normalization column, and any join/sort on the collated
    column inherits the semantics. The mixed-case input is synthesized
    deterministically (odd keys upper-cased); the output key is
    re-lowered for display because a collated group surfaces an
    arbitrary representative casing. The oracle gets identical groups
    with explicit lower()."""
    orders = load(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 2 == 1, F.upper("o_orderpriority")
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority")
    )
    return (
        orders.groupBy(
            F.expr("collate(o_orderpriority, 'UTF8_LCASE')").alias("pri_ci")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.lower(F.col("pri_ci").cast("string")).alias("priority"),
            "n_orders",
        )
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((CASE WHEN l_discount <> 0.0
                 THEN l_extendedprice / l_discount END) * 10000) / 10000
             AS safe_ratio,
           TRY_CAST(CASE WHEN l_linenumber % 3 = 0
                THEN CAST(l_shipdate AS VARCHAR)
                ELSE l_linestatus END AS TIMESTAMP) AS maybe_date,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 1
                    THEN CAST(l_orderkey AS VARCHAR)
                    ELSE l_returnflag END AS BIGINT) AS parsed,
           [l_quantity, l_extendedprice][l_linenumber] AS picked
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation family: ``try_divide`` (NULL on /0),
    ``try_to_date`` (NULL on unparseable dates), ``try_cast`` (NULL on
    unparseable numbers), and ``try_element_at`` (NULL past the end —
    line numbers 3..7 index past the 2-element array). The point of
    this surface at 100 TB: one dirty row NULLs out instead of killing
    the whole stage under ``spark.sql.ansi.enabled``. The oracle
    mirrors each with short-circuiting CASE / TRY_CAST since DuckDB
    errors eagerly. (``try_add``/``try_multiply`` overflow-NULL
    semantics only engage under ANSI mode, which this engine does not
    force session-wide — so they are deliberately not claimed here.) The ratio is truncated to 4 places via
    floor(x*1e4)/1e4 rather than round(): floor of the same IEEE
    double is bit-identical across engines while round's half-boundary
    handling is decimal-string-based in Spark and binary in DuckDB."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.try_divide("l_extendedprice", "l_discount") * 10000)
            / 10000
        ).alias("safe_ratio"),
        F.try_to_date(
            F.when(
                F.col("l_linenumber") % 3 == 0, F.col("l_shipdate").cast("string")
            ).otherwise(F.col("l_linestatus"))
        )
        .cast("timestamp_ntz")
        .alias("maybe_date"),
        F.when(F.col("l_linenumber") % 2 == 1, F.col("l_orderkey").cast("string"))
        .otherwise(F.col("l_returnflag"))
        .try_cast("long")
        .alias("parsed"),
        F.try_element_at(
            F.array("l_quantity", "l_extendedprice"), F.col("l_linenumber")
        ).alias("picked"),
    )


@register(
    "fn_string_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(
               c_mktsegment, '[A-Z]', '*', 'g'), '[a-z]', '*', 'g'),
               '[0-9]', '#', 'g') AS segment_masked
    FROM customer
    """,
)
def fn_string_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``mask()`` — char-class redaction (upper→X, lower→x,
    digit→n, punctuation kept) plus a custom-char variant. The JVM-native sibling of llm_text_pii_redact's regex
    pipeline: zero exchanges, whole-stage codegen, and the oracle
    reproduces it with three global regexp_replace passes."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.mask(
            "c_mktsegment",
            upperChar=F.lit("*"),
            lowerChar=F.lit("*"),
            digitChar=F.lit("#"),
        ).alias("segment_masked"),
    )


@register(
    "fn_string_codec",
    oracle="""
    SELECT c_custkey,
           base64(encode(c_name)) AS name_b64,
           decode(from_base64(base64(encode(c_name)))) AS name_roundtrip,
           CAST(ascii(c_name) AS INTEGER) AS first_code,
           chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS bucket_char
    FROM customer
    """,
)
def fn_string_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/text codec surface: base64 encode + decode round-trip
    (the wire format for binary payloads in JSON/CSV interchange),
    ascii code of the first char, and chr bucketing. All scan-stage
    scalar expressions; the round-trip column proves encode/decode are
    inverses byte-for-byte on both engines."""
    cust = load(spark, sf_dir, "customer")
    b64 = F.base64(F.encode("c_name", "UTF-8"))
    return cust.select(
        "c_custkey",
        b64.alias("name_b64"),
        F.decode(F.unbase64(b64), "UTF-8").alias("name_roundtrip"),
        F.ascii("c_name").alias("first_code"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("bucket_char"),
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT c_custkey, c_name, c_mktsegment,
             'https://data.example.com/' || c_mktsegment || '/c?id=' ||
             CAST(c_custkey AS VARCHAR) || '&seg=' || lower(c_mktsegment)
               AS url
      FROM customer
    )
    SELECT c_custkey,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, 'id=([^&]*)', 1) AS id_param,
           replace(c_name, '#', '%23') AS name_encoded,
           c_name AS name_roundtrip
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar family — ``parse_url`` (HOST / PATH / per-key QUERY
    extraction) plus ``url_encode``/``url_decode`` round-trip: the
    log-processing surface of any clickstream ETL. All scan-stage;
    DuckDB has no URL functions, so the oracle re-derives each piece
    with regexes over the same constructed URL (the fixture charset
    makes form-encoding equal a single '#'→'%23' replace, which keeps
    the encode column oracle-able)."""
    cust = load(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://data.example.com/"),
        F.col("c_mktsegment"),
        F.lit("/c?id="),
        F.col("c_custkey").cast("string"),
        F.lit("&seg="),
        F.lower("c_mktsegment"),
    )
    return cust.select(
        "c_custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.url_encode("c_name").alias("name_encoded"),
        F.url_decode(F.url_encode("c_name")).alias("name_roundtrip"),
    )


@register(
    "fn_array_setops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
      FROM documents
    ), ab AS (
      SELECT doc_id,
             tk[1:least(6, len(tk))] AS a,
             tk[greatest(len(tk) - 5, 1):len(tk)] AS b
      FROM t
    )
    SELECT doc_id,
           coalesce(array_to_string(
             list_sort(list_distinct(list_cat(a, b))), ' '), '')
             AS union_sorted,
           coalesce(array_to_string(
             list_sort(list_intersect(a, b)), ' '), '')
             AS inter_sorted,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
                                 x -> NOT list_contains(b, x))), ' '), '')
             AS except_sorted,
           coalesce(len(list_intersect(a, b)) > 0, FALSE) AS overlaps
    FROM ab
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — ``array_union`` / ``array_intersect`` /
    ``array_except`` / ``arrays_overlap`` over each doc's first-6 and
    last-6 token windows. All four dedup their output (set semantics);
    results are ``array_sort``-ed on both engines because the engines'
    native output ORDERS differ (Spark preserves first-seen order,
    DuckDB's list reconstruction doesn't) while the SETS are identical
    — the sort is the canonicalization, not a semantic change.  The
    sorted arrays then cross the oracle boundary space-joined (SURVEY
    §7.4 G7: the comparator cannot canonicalize list cells)."""
    docs = load(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    n = F.size(tk)
    ab = docs.select(
        "doc_id",
        F.slice(tk, 1, F.least(F.lit(6), F.greatest(n, F.lit(1)))).alias("a"),
        F.slice(tk, F.greatest(n - 5, F.lit(1)), F.lit(6)).alias("b"),
    )
    # coalesce mirrors the oracle's: a NULL-text doc renders '' / false
    # on BOTH engines instead of a dtype-unstable NULL cell
    return ab.select(
        "doc_id",
        F.coalesce(
            F.array_join(F.array_sort(F.array_union("a", "b")), " "),
            F.lit(""),
        ).alias("union_sorted"),
        F.coalesce(
            F.array_join(F.array_sort(F.array_intersect("a", "b")), " "),
            F.lit(""),
        ).alias("inter_sorted"),
        F.coalesce(
            F.array_join(F.array_sort(F.array_except("a", "b")), " "),
            F.lit(""),
        ).alias("except_sorted"),
        F.coalesce(F.arrays_overlap("a", "b"), F.lit(False)).alias(
            "overlaps"
        ),
    )


@register(
    "fn_map_higher_order",
    oracle="""
    WITH per_line AS (
      SELECT l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      GROUP BY l_orderkey, l_linenumber
    ), m AS (
      SELECT l_orderkey,
             map_from_entries(list_transform(
                 list_sort(list(struct_pack(k := l_linenumber, v := qty))),
                 s -> struct_pack(k := s.k, v := s.v))) AS qty_map
      FROM per_line
      GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(cardinality(qty_map) AS INT) AS n_lines,
           CAST(coalesce(qty_map[1][1], 0) AS BIGINT) AS line1_qty,
           CAST(list_sum(map_values(qty_map)) AS BIGINT) AS total_qty,
           CAST(len(list_filter(map_values(qty_map), v -> v >= 25))
                AS INT) AS n_bulk_lines
    FROM m
    """,
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + access + higher-order traversal: build a
    per-order map of line number → quantity (map_from_entries over a
    sorted entry list so construction order is deterministic), then
    read it back with size / element_at / value folds / value filters.

    Scale shape: one groupBy(l_orderkey) builds the map from
    collect_list partials; every downstream measure is a scan-stage
    expression over the in-row map — maps here are a per-row container
    (bounded by lines-per-order), never a shuffle key. Outputs are all
    scalars, sidestepping cross-engine map-ordering comparison
    hazards (the map itself would compare nondeterministically)."""
    li = load(spark, sf_dir, "lineitem")
    # the fixture allows repeated line numbers within an order, and map
    # keys must be unique — reduce to one entry per (order, line) first
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    m = per_line.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("k"),
                        F.col("qty").alias("v"),
                    )
                )
            )
        ).alias("qty_map")
    )
    vals = F.map_values(F.col("qty_map"))
    return m.select(
        "l_orderkey",
        F.size("qty_map").alias("n_lines"),
        F.coalesce(
            F.element_at(F.col("qty_map"), F.lit(1)), F.lit(0)
        ).alias("line1_qty"),
        F.aggregate(vals, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "total_qty"
        ),
        F.size(F.filter(vals, lambda v: v >= 25)).alias("n_bulk_lines"),
    )


@register(
    "fn_json_roundtrip_nested",
    oracle="""
    WITH built AS (
      SELECT o_orderkey,
             to_json(struct_pack(
                 orderkey := o_orderkey,
                 status := o_orderstatus,
                 lines := lines
             )) AS doc
      FROM (
        SELECT o_orderkey, o_orderstatus,
               list_sort(list(struct_pack(ln := l_linenumber,
                                          qty := CAST(l_quantity AS BIGINT))))
                   AS lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey % 100 = 0
        GROUP BY o_orderkey, o_orderstatus
      )
    )
    SELECT o_orderkey,
           json_extract_string(doc, '$.status') AS status_back,
           CAST(json_array_length(doc, '$.lines') AS INT) AS n_lines,
           CAST(json_extract(doc, '$.lines[0].qty') AS BIGINT)
               AS first_qty
    FROM built
    """,
)
def fn_json_roundtrip_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON round trip: build a document (struct with an array
    of line structs) from relational rows with ``to_json``, then read
    it back with JSON point/path access — the export-then-reingest
    fidelity check every JSON interchange boundary needs.

    Scale shape: one orderkey groupBy assembles the nested docs
    (sorted entry lists for deterministic serialization); both the
    serialization and the path reads are scan-stage expressions. The
    oracle builds byte-compatible documents with DuckDB's struct_pack/
    to_json and must extract identical values — JSON *semantics*, not
    formatting, is what's asserted (each engine parses its own
    serialization)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 100 == 0
    )
    built = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").cast("long").alias("qty"),
                    )
                )
            ).alias("lines")
        )
        .select(
            "o_orderkey",
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("orderkey"),
                    F.col("o_orderstatus").alias("status"),
                    F.col("lines"),
                )
            ).alias("doc"),
        )
    )
    return built.select(
        "o_orderkey",
        F.get_json_object("doc", "$.status").alias("status_back"),
        F.json_array_length(F.get_json_object("doc", "$.lines")).alias(
            "n_lines"
        ),
        F.get_json_object("doc", "$.lines[0].qty")
        .cast("long")
        .alias("first_qty"),
    )


@register(
    "fn_string_format",
    oracle="""
    SELECT s_suppkey,
           printf('SUP-%05d', s_suppkey) AS supp_code,
           -- coalesce: Spark's format_string renders a NULL arg as
           -- the literal 'null' (Java printf) while DuckDB's printf
           -- is NULL-strict (G4c) — a missing name renders empty
           printf('%s (nation %02d)', coalesce(s_name, ''), s_nationkey)
               AS display,
           printf('%.2f', s_acctbal) AS balance_str
    FROM supplier
    """,
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style string formatting (format_string ↔ printf): zero-padded
    code minting, display-name composition, fixed-decimal rendering —
    the ID/label normalization surface of every ETL. Both engines
    implement the same printf conversions, so outputs are
    byte-identical (%.2f formatting of a double is locale-free
    shortest-round rendering on both JVMs and C — the one subtlety
    worth the oracle). Pure scan-stage, zero exchanges."""
    supp = load(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.format_string("SUP-%05d", F.col("s_suppkey")).alias("supp_code"),
        # coalesce: Spark's format_string renders a NULL arg as the
        # literal 'null' (Java printf) while DuckDB's printf is
        # NULL-strict (G4c) — a missing name renders empty
        F.format_string(
            "%s (nation %02d)",
            F.coalesce(F.col("s_name"), F.lit("")),
            F.col("s_nationkey"),
        ).alias("display"),
        F.format_string("%.2f", F.col("s_acctbal")).alias("balance_str"),
    )


@register(
    "fn_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY            AS due_ts,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS review_date,
           last_day(CAST(o_orderdate AS DATE))      AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2024-12-31') AS INTEGER) AS days_to_eoy
    FROM orders
    """,
)
def fn_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic — SLA due dates (+30 days),
    end-of-month clamping semantics (add_months(Jan 31, 1) → Feb 29 on
    both engines), last_day, and day-count to a fixed horizon. All four
    are scan-stage expressions inside WholeStageCodegen — zero exchanges
    at any scale. Cross-dialect notes (G4): Spark ``make_interval`` ↔
    DuckDB ``INTERVAL n DAY`` over timestamps; Spark ``add_months`` /
    ``last_day`` return DATE, mirrored by the oracle's CASTs; DuckDB
    date_diff returns BIGINT, cast to Spark's INT."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.make_interval(days=F.lit(30))).alias("due_ts"),
        F.add_months("o_orderdate", 3).alias("review_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.lit("2024-12-31").cast("date"), F.col("o_orderdate")).alias(
            "days_to_eoy"
        ),
    )


@register(
    "fn_timezone_convert",
    oracle="""
    SELECT event_id,
           timezone('America/New_York', ts) AT TIME ZONE 'UTC' AS ny_to_utc,
           timezone('UTC', ts) AT TIME ZONE 'Asia/Kolkata'     AS utc_to_ist,
           timezone('UTC', ts) AT TIME ZONE 'Australia/Sydney' AS utc_to_syd
    FROM events
    """,
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion of naive event timestamps — the "sensor
    clocks are local, the warehouse is UTC" normalization every
    multi-site ETL performs. Exercises a DST zone (America/New_York),
    a half-hour-offset zone (Asia/Kolkata) and a southern-hemisphere
    DST zone (Australia/Sydney), so the oracle cross-checks the two
    engines' independent tzdata interpretations, not just arithmetic.
    Scan-stage only, zero exchanges. G4: Spark
    ``to_utc_timestamp(ts, tz)`` ↔ DuckDB session-independent chain
    ``timezone(tz, ts) AT TIME ZONE 'UTC'`` (and the reverse for
    ``from_utc_timestamp``) — both interpret the naive value in ``tz``
    and re-render naive, never touching the session zone."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.to_utc_timestamp("ts", "America/New_York").alias("ny_to_utc"),
        F.from_utc_timestamp("ts", "Asia/Kolkata").alias("utc_to_ist"),
        F.from_utc_timestamp("ts", "Australia/Sydney").alias("utc_to_syd"),
    )


@register(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[bs][a-z]+')) AS INTEGER)
             AS n_matches,
           coalesce(regexp_extract_all(text, '[bs][a-z]+')[1], '')
             AS first_match,
           -- coalesce: DuckDB renders an EMPTY match list as NULL
           -- where Spark's array_join gives ''; NULL text stays NULL
           -- on both engines
           CASE WHEN text IS NOT NULL THEN
             coalesce(array_to_string(
                 regexp_extract_all(text, '[bs][a-z]+'), '|'), '')
           END AS all_matches
    FROM documents
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — ALL matches of a pattern per row (the
    multi-capture sibling of fn_string_split_regex's single-capture
    extract): match count, first match, and the full match list
    serialized with array_join (G7: nested outputs never reach the
    driver's value hash). The pattern keeps to the dialect-common
    subset (character classes, no lookaround, G4). Scan-stage only —
    zero exchanges at any scale."""
    docs = load(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(F.col("text"), F.lit("[bs][a-z]+"), F.lit(0))
    # try_element_at: a zero-match doc must yield NULL→'' rather than
    # an ANSI array-index kill (G11); NULL text gates the count because
    # Spark size(NULL)=-1 where DuckDB len(NULL)=NULL
    return docs.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), F.size(matches)).alias("n_matches"),
        F.coalesce(F.try_element_at(matches, F.lit(1)), F.lit("")).alias(
            "first_match"
        ),
        F.array_join(matches, "|").alias("all_matches"),
    )


@register(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id, text AS decrypted, CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt → aes_decrypt
    round-trip (GCM mode, the at-rest/PII-column pattern). DuckDB has
    no AES functions, so the oracle is the IDENTITY check — the
    decrypted text must equal the original column byte-for-byte (the
    same round-trip-fidelity oracle style as scan_binary_files). The
    key is a literal here; in production it arrives per-task from a
    KMS callback, but the plan shape is identical: both functions are
    scan-stage expressions, zero exchanges at any scale. GCM is
    randomized (fresh IV per row per run), so ciphertexts are
    intentionally NOT part of the output — only the invariant is."""
    docs = load(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key literal
    cipher = F.aes_encrypt(F.col("text").cast("binary"), key.cast("binary"))
    plain = F.aes_decrypt(cipher, key.cast("binary"))
    return docs.select(
        "doc_id",
        plain.cast("string").alias("decrypted"),
        F.length("text").alias("n_chars"),
    )


@register(
    "fn_datetime_format_patterns",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m')                AS month_key,
           strftime(ts, '%Y-%m-%d %H:%M')       AS minute_key,
           strftime(ts, '%a')                   AS dow_short,
           strftime(ts, '%j')                   AS day_of_year,
           strftime(ts, '%H')                   AS hour_24
    FROM events
    """,
)
def fn_datetime_format_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → string rendering (``date_format`` ↔ ``strftime``) —
    the partition-key and report-label minting surface of every ETL.
    The two engines use DIFFERENT pattern languages (JDK
    DateTimeFormatter 'yyyy-MM' vs C strftime '%Y-%m'); this op pins
    the cross-dialect pattern map for the common keys: month bucket,
    minute bucket, abbreviated weekday (locale-stable for en), zero-
    padded day-of-year and 24h hour. Scan-stage only, zero exchanges;
    byte-identical outputs are the oracle claim."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM").alias("month_key"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_key"),
        F.date_format("ts", "EEE").alias("dow_short"),
        F.date_format("ts", "DDD").alias("day_of_year"),
        F.date_format("ts", "HH").alias("hour_24"),
    )
