"""LLM-data-pipeline operators over ``documents`` / ``embeddings``
(SURVEY.md §2.10 — the BASELINE.json north-star mandate).

These are the training-data-pipeline primitives: dedup (exact hash +
banded MinHash), similarity search (exact cosine top-k + LSH-bucketed
approximate), text analysis (tokenize, n-grams, per-language stats), and
multimodal struct/binary columns.

Scale design (100 TB corpus):

- **Exact dedup** is one hash-shuffle: ``sha2(normalize(text))`` →
  keep-first window per hash. No text comparison ever crosses the wire,
  only 32-byte digests and doc ids.
- **Near-dup MinHash is banded, never all-pairs.** Signatures are H
  per-doc min-hashes computed shuffle-free as
  ``array_min(transform(...))`` over the per-doc shingle array — the
  exploded shingle stream never crosses an exchange; candidates come
  from a self-equi-join on (band_id, band_signature) — a hash shuffle
  whose key cardinality grows with the corpus, so Catalyst executes it
  as an ordinary scalable hash join. The O(n²) pair space is never
  materialized.
- **Cosine top-k (exact)** broadcasts the small query-vector set against
  the corpus — a map-only pass, no shuffle except the final per-query
  top-k window over ≤|queries|×|corpus| rows. It is the *oracled exact
  baseline*; the 100 TB path is the LSH variant.
- **LSH approximate NN** buckets both sides by L×(sign-bit) random
  hyperplane codes; candidate generation is an equi-join on
  (table_id, bucket) — shuffle cost proportional to bucket collision
  count, not n². Hyperplanes are deterministic module constants so plans
  are reproducible across runs/executors.
- Everything stays in built-in functions (JVM codegen); no Python UDFs
  in any hot path.

Cross-engine discipline: hashes are md5/sha2 hex (identical bytes in
both engines); float reductions are computed in double with identical
fold order Spark-vs-DuckDB and rounded before comparison (SURVEY §7.4
G2/G3); rank ties break on ids.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import REGISTRY, register
from ..tables import load
from .materialize import input_size_bytes, pin

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition before CPU-heavy per-row compute (explode/md5/dot
    products) — ONLY when the input is under-parallel. The fixture
    tables arrive as a single parquet file with a handful of row
    groups, so without this the whole explode pipeline runs on 1-3
    cores; in that regime the exchange buys full-cluster parallelism
    (hash-partitioning on the grouping key also lets the downstream
    groupBy reuse it instead of adding one).

    Optimization r12 (guide §2.4): the unconditional form paid a full
    corpus-grain shuffle of the text/embedding payloads at ANY scale —
    at 100 TB, where the scan already has thousands of splits, that is
    a pure multi-TB waste (plus the sort-before-repartition tax,
    SPARK-23207) that the old docstring wrongly called "a no-op
    cost-wise". Now the repartition is skipped whenever the physical
    scan already has >= defaultParallelism partitions, so the operator
    plans are unchanged on the bench fixtures (1-3 splits < n) and
    shuffle-free at scale. Results are partitioning-independent
    throughout (every consumer re-establishes its own keyed exchanges),
    Streaming inputs keep the unconditional repartition: micro-batch
    partition counts are not knowable at plan time (`.rdd` is illegal
    on a streaming frame) and each micro-batch is small."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming and df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)


def _tokens(col: str = "text"):
    """Whitespace tokens of lower-cased text, empty strings dropped."""
    return F.filter(F.split(F.lower(F.col(col)), " "), lambda t: t != "")


@register(
    "llm_text_tokenize_counts",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def llm_text_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word-frequency table: tokenize + explode + groupBy.

    At scale this is the canonical map-side-combinable aggregation: the
    explode happens inside the scan stage and partial counts combine
    before the single shuffle on ``word``."""
    docs = _spread(load(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@register(
    "llm_text_ngrams",
    oracle="""
    SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
    FROM (
      SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS ngram
      FROM (SELECT list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents)
    )
    GROUP BY ngram
    """,
)
def llm_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word trigram frequencies via higher-order array functions.

    ``transform(sequence(...)) + slice`` builds the n-gram list inside
    codegen — no Python, no extra shuffle beyond the count aggregation.
    The ``size >= 3`` guard matters: Spark's ``sequence(1, 0)`` counts
    *down* ([1, 0]) rather than producing an empty list."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    ngrams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(ngrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "llm_text_lang_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                    t -> t <> ''))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang
    """,
)
def llm_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (doc counts, char stats, token totals)
    — the summary a data curator reads before sampling a training mix.
    Single hash aggregation; token counting is array-length, not a second
    explode."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.size(_tokens())).alias("total_tokens"),
    )


@register(
    "llm_text_quality_score",
    oracle="""
    SELECT doc_id, lang, n_tokens, uniq_ratio, stop_ratio,
           round(0.4 * least(n_tokens / 400.0, 1.0)
                 + 0.4 * uniq_ratio + 0.2 * (1.0 - stop_ratio),
                 4) AS quality
    FROM (
      SELECT doc_id, lang,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             round(len(list_distinct(toks)) * 1.0 / len(toks), 4)
                 AS uniq_ratio,
             round(len(list_filter(toks,
                       t -> list_contains(['the','a','of','and','to'], t)))
                   * 1.0 / len(toks), 4) AS stop_ratio
      FROM (SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents)
      WHERE len(toks) > 0
    )
    """,
)
def llm_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score (length + lexical diversity +
    stopword ratio), the standard pre-training filter signal. Pure
    array-expression arithmetic inside the scan stage — zero shuffles,
    so at 100 TB it runs at scan speed."""
    docs = load(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    toks = _tokens()
    n = F.size(toks)
    uniq = F.round(F.size(F.array_distinct(toks)) / n, 4)
    stop_ratio = F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))) / n, 4
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            n.alias("n_tokens"),
            uniq.alias("uniq_ratio"),
            stop_ratio.alias("stop_ratio"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "quality",
            F.round(
                0.4 * F.least(F.col("n_tokens") / 400.0, F.lit(1.0))
                + 0.4 * F.col("uniq_ratio")
                + 0.2 * (1.0 - F.col("stop_ratio")),
                4,
            ),
        )
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "llm_dedup_exact_text",
    oracle="""
    SELECT doc_id, lang, content_sha
    FROM (
      SELECT doc_id, lang,
             sha256(lower(trim(text))) AS content_sha,
             row_number() OVER (PARTITION BY sha256(lower(trim(text)))
                                ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    """,
)
def llm_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: normalize → sha256 → keep lowest doc_id per
    digest. The only shuffle is on the 32-byte digest (perfectly
    distributed by construction), and the window is per-digest so no
    skew: this is the pattern that dedups a 100 TB corpus in one pass."""
    docs = load(spark, sf_dir, "documents")
    sha = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        docs.select("doc_id", "lang", sha.alias("content_sha"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("content_sha").orderBy("doc_id")
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


_MINHASH_H = 8  # minhash functions; banded 4 × 2
_MINHASH_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]


def _trigram_shingle_expr():
    """Word-trigram shingle array of ``text`` (duplicates kept), built
    with two ``zip_with`` pairwise concats over shifted slices —
    ~2× cheaper than the naive per-position ``slice``+``concat_ws``
    (2 slices + 2n concats instead of n 3-element slices), measured at
    sf0.1. zip_with pads the shorter side with nulls, making the last
    two entries null; the final slice to n-2 trims them."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    n = F.size(toks)
    z = F.zip_with(
        F.zip_with(toks, F.slice(toks, 2, n - 1), lambda a, b: F.concat(a, F.lit(" "), b)),
        F.slice(toks, 3, n - 2),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 3, F.slice(z, 1, n - 2)).otherwise(
        F.array().cast("array<string>")
    )


def _shingles(docs: DataFrame) -> DataFrame:
    """Word-trigram shingles per doc, WITH duplicates — no distinct
    shuffle: min-hash over the multiset equals min-hash over the set,
    and the consumer's collect_set dedups for the Jaccard side."""
    return _spread(docs, "doc_id").select(
        "doc_id", F.explode(_trigram_shingle_expr()).alias("sh")
    )


def _shingle_arrays(docs: DataFrame) -> DataFrame:
    """Per-doc word-trigram shingle ARRAY (duplicates kept) — the
    shuffle-free sibling of ``_shingles``. Keeping shingles as an array
    column lets every per-doc statistic (min-hash signatures, distinct
    shingle set) be a higher-order function evaluated inside the scan's
    whole-stage-codegen stage, so the ~10×-larger exploded shingle
    stream never crosses an exchange.

    Docs with <3 tokens keep an EMPTY array rather than being filtered
    out: a ``where(size(sh) > 0)`` here would be pushed below the
    round-robin exchange by Catalyst, forcing the whole shingle
    expression to be evaluated a second time inside the (single-split)
    scan task — consumers rely on empty→null band signatures never
    matching an equi-join instead, which drops those docs for free."""
    return _spread(docs).select("doc_id", _trigram_shingle_expr().alias("sh"))


def _minhash_sig_cols() -> list:
    """The H min-hash signature columns over the ``sh`` array column:
    ``array_min(transform(sh, s -> md5(s || '#i')))`` — min over the
    multiset equals min over the set, and array_min of md5 hex is the
    same lexicographic reduction the exploded groupBy(min) computed,
    with zero shuffle."""
    def one(tag: str):
        # NB: the lambda must take exactly ONE arg — a two-arg lambda
        # would be called by transform() as (element, index).
        return F.transform("sh", lambda s: F.md5(F.concat(s, F.lit(tag))))

    return [F.array_min(one(f"#{i}")).alias(f"h{i}") for i in range(_MINHASH_H)]


def _explode_bands(per_doc: DataFrame, carry: list | None = None) -> DataFrame:
    """Explode the h0..h7 signature columns into (band_id, sig) rows —
    one row per doc per band — carrying any extra columns through so
    the band self-join needs no second trip back to the per-doc table."""
    extra = carry or []
    return per_doc.select(
        "doc_id",
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat(F.col(f"h{i}"), F.col(f"h{j}")).alias("sig"),
                    )
                    for b, (i, j) in enumerate(_MINHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", *extra, "band.band_id", "band.sig")


@register(
    "llm_dedup_near_minhash",
    oracle="""
    WITH shingles AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents)
    ), per_doc AS (
      SELECT doc_id,
             min(md5(sh || '#0')) AS h0, min(md5(sh || '#1')) AS h1,
             min(md5(sh || '#2')) AS h2, min(md5(sh || '#3')) AS h3,
             min(md5(sh || '#4')) AS h4, min(md5(sh || '#5')) AS h5,
             min(md5(sh || '#6')) AS h6, min(md5(sh || '#7')) AS h7,
             list(DISTINCT sh) AS hs,
             count(DISTINCT sh) AS n_sh
      FROM shingles GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, band_id, sig FROM per_doc, LATERAL (VALUES
        (0, h0 || h1), (1, h2 || h3),
        (2, h4 || h5), (3, h6 || h7)) AS b(band_id, sig)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig
                  AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(pa.hs, pb.hs)) * 1.0
                 / (pa.n_sh + pb.n_sh
                    - len(list_intersect(pa.hs, pb.hs))), 4) AS jaccard
    FROM cand c
    JOIN per_doc pa ON pa.doc_id = c.doc_a
    JOIN per_doc pb ON pb.doc_id = c.doc_b
    """,
)
def llm_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash over word
    trigrams, with exact shingle-set Jaccard computed *only for
    candidates*.

    Scale shape: (1) the per-doc min-hash signatures are computed
    SHUFFLE-FREE as ``array_min(transform(...))`` higher-order
    functions over the per-doc shingle array, inside the scan stage's
    whole-stage codegen — the exploded shingle stream (~10× the text
    bytes) never crosses an exchange, and the md5 pipeline runs ONCE
    (the band self-join's two sides are byte-identical subplans ending
    in the same hashpartitioning exchange, so ReuseExchange shares it;
    the shuffle_hash hint keeps AQE from "optimizing" into a broadcast
    that would duplicate the pipeline — and a corpus-scale signature
    table could never broadcast anyway). (2) candidates come from the
    self-equi-join on (band_id, band_signature) over SLIM rows
    (doc_id, band_id, sig ≈ 80 bytes) — the LSH bucket join, never the
    O(n²) pair space, and never shuffling shingle payloads. (3) exact
    Jaccard fetches the two docs' distinct-shingle sets by joining the
    (small) candidate list back to an md5-free shingle-array pass —
    two cheap corpus scans instead of shuffling every doc's shingle
    set 4× through the band join. Min-hash = lexicographic min of md5
    hex (identical bytes in Spark and DuckDB, so the whole pipeline is
    oracled)."""
    docs = load(spark, sf_dir, "documents")
    cand = _minhash_edges(spark, sf_dir)

    hs_tbl = _shingle_arrays(docs).select(
        "doc_id", F.array_distinct("sh").alias("hs")
    )
    # Melt each candidate pair into two (pair, doc_id) rows so BOTH
    # sides' shingle sets come from a single join against one hs pass —
    # one corpus scan and (at scale) one hs shuffle instead of two.
    # The regroup touches candidate rows only (2 per pair).
    melted = cand.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    )
    pair = (
        melted.join(hs_tbl, "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max(F.when(F.col("doc_id") == F.col("doc_a"), F.col("hs"))).alias("hs_a"),
            F.max(F.when(F.col("doc_id") == F.col("doc_b"), F.col("hs"))).alias("hs_b"),
        )
    )

    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    n_a, n_b = F.size(F.col("hs_a")), F.size(F.col("hs_b"))
    return pair.select(
        "doc_a",
        "doc_b",
        F.round(inter / (n_a + n_b - inter), 4).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _dot(a, b):
    """Sequential-fold double dot product — identical order to the
    DuckDB oracle's list_sum(list_transform(...)), so results match to
    the last bit before rounding."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dbl_array_lit(a):
    """(Possibly nested) Python float sequence as ONE parsed SQL array
    literal of doubles.

    Optimization r12 (guide §7.3 driver-side planning cost): the
    previous idiom, ``F.array(*[F.lit(float(x)) for x in ...])``,
    makes ~2 py4j round-trips per element — ≈1 ms each, so a trained
    8×32×8 PQ codebook (2048 leaves) burned ~2 s of single-threaded
    driver time on EVERY query build, and the LSH/k-means plane and
    centroid literals paid the same per-element tax. One ``F.expr``
    string parse builds the identical literal in <10 ms. Values are
    bit-identical: ``repr(float)`` is the shortest decimal that
    round-trips to the same IEEE double, and the exponent suffix makes
    the SQL parser read it via Double.parseDouble (exponent-form
    literals are DOUBLE-typed, never DECIMAL)."""

    def render(v) -> str:
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array(%s)" % ",".join(render(x) for x in v)
        r = repr(float(v))
        return r if ("e" in r or "E" in r) else r + "E0"

    return F.expr(render(a))


def _sim_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table restricted to vectors admissible on a
    similarity surface: a zero-norm vector has UNDEFINED cosine, and
    under ANSI mode the cosine division raises DIVIDE_BY_ZERO mid-job
    (hostile-input sweep) — at 100 TB one all-zeros row (a failed
    embedder output, a padding artifact) must not kill the stage.
    Excluding them at the scan is the semantically correct treatment
    (they are not 'similar to nothing', they are outside the metric);
    the official fixture contains none, so every oracle is unchanged.
    The filter is scan-stage arithmetic (one fold per row)."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.filter(_dot(F.col("embedding"), F.col("embedding")) > 0)


_COSINE_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), d AS (
      SELECT vec_id, e,
             list_sum(list_transform(e, x -> x * x)) AS nrm
      FROM v
    )
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           round(list_sum(list_transform(generate_series(1, len(q.e)),
                                         i -> q.e[i] * c.e[i]))
                 / sqrt(q.nrm * c.nrm), 4) AS sim
    FROM d q JOIN d c ON c.vec_id <> q.vec_id
    WHERE q.vec_id % 100 = 0
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY round(list_sum(list_transform(generate_series(1, len(q.e)),
                                               i -> q.e[i] * c.e[i]))
                       / sqrt(q.nrm * c.nrm), 4) DESC,
                 c.vec_id) <= 5
"""


@register("llm_sim_topk_cosine", oracle=_COSINE_ORACLE)
def llm_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbours for each query vector (every 100th
    vec_id) — the brute-force baseline the LSH variant is measured
    against.

    The query set is tiny by construction so Spark broadcasts it: the
    join is map-only over the corpus (no shuffle of the big side), and
    the only exchange is the per-query top-k window. Similarity is
    rounded to 1e-4 and ranked on the *rounded* value with vec_id
    tie-break (SURVEY §7.4 G2/G3), so rank order is engine-independent."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    q = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_e"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = d.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        joined.select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# Deterministic random hyperplanes for sign-bit LSH: L tables × B bits
# over 64-dim embeddings. Module constants (seeded) so every executor,
# run, and test sees the same plans.
_LSH_TABLES = 3
_LSH_BITS = 4
_LSH_DIM = 64
_LSH_PLANES = (
    np.random.RandomState(7)
    .standard_normal((_LSH_TABLES, _LSH_BITS, _LSH_DIM))
    .round(6)
)


def _lsh_bucket(col, table: int):
    """Bucket id in [0, 2^BITS) from sign bits of hyperplane dots."""
    code = F.lit(0)
    for b in range(_LSH_BITS):
        plane = _dbl_array_lit(_LSH_PLANES[table, b])
        code = code + F.when(_dot(col, plane) > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
    return code


@register("llm_sim_lsh_approx", tags=("approx", "rows-only"))
def llm_sim_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbours via random-hyperplane
    (sign-bit) LSH: 3 tables × 4 bits.

    This is the 100 TB path: each vector maps to one bucket per table
    (pure codegen arithmetic in the scan stage); candidate pairs come
    from an equi-join on (table_id, bucket), so comparison cost scales
    with bucket collisions, not n². Exact cosine is then computed only
    within buckets and the union of tables is deduped before the final
    per-query top-k. Recall vs the exact variant is property-tested in
    tests/test_properties.py (no DuckDB oracle — approximate by
    design)."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    buckets = d.select(
        "vec_id",
        "embedding",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        _lsh_bucket(F.col("embedding"), t).alias("bucket"),
                    )
                    for t in range(_LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", "nrm", "tb.table_id", "tb.bucket")

    q = buckets.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_e"),
        F.col("nrm").alias("q_nrm"),
        "table_id",
        "bucket",
    )
    cand = (
        buckets.join(F.broadcast(q), ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_e", "q_nrm", "vec_id", "embedding", "nrm")
        .dropDuplicates(["query_id", "vec_id"])
    )
    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# Multiprobe parameterization: the 100 TB shape is MORE bits (smaller,
# more selective buckets — the per-bucket candidate count stays bounded
# as n grows) with the lost recall bought back by probing the query's
# neighboring buckets (Hamming distance ≤ 2 on the bucket code) instead
# of adding whole tables. Query-side fan-out only: the corpus still
# writes ONE row per table — at 100 TB that corpus index is the thing
# you can't afford to fan out, while the query side is tiny.
_LSH_MP_TABLES = 2
_LSH_MP_BITS = 8
_LSH_MP_PLANES = (
    np.random.RandomState(11)
    .standard_normal((_LSH_MP_TABLES, _LSH_MP_BITS, _LSH_DIM))
    .round(6)
)


def _mp_bucket(col, table: int):
    code = F.lit(0)
    for b in range(_LSH_MP_BITS):
        plane = _dbl_array_lit(_LSH_MP_PLANES[table, b])
        code = code + F.when(_dot(col, plane) > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
    return code


def _mp_probe_masks() -> list[int]:
    """XOR masks for Hamming-distance ≤ 2 multiprobe."""
    masks = [0]
    masks += [1 << i for i in range(_LSH_MP_BITS)]
    masks += [
        (1 << i) | (1 << j)
        for i in range(_LSH_MP_BITS)
        for j in range(i + 1, _LSH_MP_BITS)
    ]
    return masks


@register("llm_sim_lsh_multiprobe", tags=("approx", "rows-only"))
def llm_sim_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbours via MULTIPROBE sign-bit LSH:
    2 tables × 8 bits, query probes every bucket within Hamming
    distance 2 of its own code (1+8+28 = 37 probes per table).

    Why this exists next to ``llm_sim_lsh_approx`` (3×4 bits, single
    probe): at corpus scale the 4-bit buckets hold n/16 vectors each —
    the candidate set grows linearly with n and the "approximate"
    search degenerates to a partial brute force. 8-bit buckets hold
    n/256, bounding per-bucket work 16× tighter; multiprobe recovers
    the recall that narrower buckets lose WITHOUT growing the corpus
    index (probes fan out the ~1%-of-corpus query side only). The
    recall-vs-scan-budget trade across the two parameterizations is
    property-tested in tests/test_properties.py. Rows-only for the
    driver (approximate by design)."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    corpus = d.select(
        "vec_id",
        "embedding",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        _mp_bucket(F.col("embedding"), t).alias("bucket"),
                    )
                    for t in range(_LSH_MP_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", "nrm", "tb.table_id", "tb.bucket")

    masks = _mp_probe_masks()
    q = (
        d.where(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_e"),
            F.col("nrm").alias("q_nrm"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_id"),
                            _mp_bucket(F.col("embedding"), t).alias("code"),
                        )
                        for t in range(_LSH_MP_TABLES)
                    ]
                )
            ).alias("tb"),
        )
        .select(
            "query_id",
            "q_e",
            "q_nrm",
            "tb.table_id",
            F.explode(
                F.array(
                    *[F.col("tb.code").bitwiseXOR(F.lit(m)) for m in masks]
                )
            ).alias("bucket"),
        )
    )
    cand = (
        corpus.join(F.broadcast(q), ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_e", "q_nrm", "vec_id", "embedding", "nrm")
        .dropDuplicates(["query_id", "vec_id"])
    )
    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        cand.select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# multimodal + embedding aggregation
# ---------------------------------------------------------------------------


@register(
    "llm_multimodal_struct",
    oracle="""
    SELECT doc_id,
           lang AS meta_lang,
           CAST(n_chars AS BIGINT) AS meta_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def llm_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record shape: opaque binary payload + typed metadata
    struct, then the leaf columns projected back out (structs/binaries
    are compared via leaves + digest, not whole-value — SURVEY §7.4 G7).

    The payload here is the utf-8 text bytes standing in for an
    image/audio blob; real decode is a Pandas-UDF stage (see
    streaming/multimodal tests) — the engine-side contract (binary
    column + metadata struct + content digest) is what this query
    locks down."""
    docs = load(spark, sf_dir, "documents")
    rec = docs.select(
        "doc_id",
        F.struct(
            F.col("lang").alias("lang"), F.col("n_chars").alias("n_chars")
        ).alias("meta"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("text"),
    )
    return rec.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.n_chars").alias("meta_chars"),
        F.octet_length(F.col("payload")).cast("bigint").alias("payload_bytes"),
        F.sha2(F.col("text"), 256).alias("payload_sha"),
    )


@register(
    "llm_embed_label_knn_agg",
    oracle="""
    SELECT label, i AS pos,
           round(avg(embedding[i]), 6) AS centroid_val,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
    GROUP BY label, i
    """,
)
def llm_embed_label_knn_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid as (label, pos, value) rows: posexplode →
    groupBy(label, pos) → avg. This is the scale-safe array aggregation
    — partial sums combine map-side per (label, pos), so a billion
    vectors reduce in one shuffle of |labels|×dim cells; no
    collect_list of whole vectors ever builds up."""
    emb = _spread(load(spark, sf_dir, "embeddings"))
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos0", "val")
        )
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias(
                "centroid_val"
            ),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


# ---------------------------------------------------------------------------
# additional dedup / text-analysis family (BASELINE.json north-star list:
# SimHash, embedding-cosine near-dup, language-ID, doc fingerprinting)
# ---------------------------------------------------------------------------


@register(
    "llm_dedup_simhash",
    oracle="""
    WITH hashed AS (
      SELECT doc_id,
             list_transform(list_filter(string_split(lower(text), ' '),
                                        t -> t <> ''),
                            t -> md5(t)) AS hs
      FROM documents
    )
    SELECT doc_id, """
    + " || ".join(
        "(CASE WHEN 2 * len(list_filter(hs, h -> substr(h, {j}, 1) IN "
        "('8','9','a','b','c','d','e','f'))) - len(hs) > 0 "
        "THEN '1' ELSE '0' END)".format(j=j)
        for j in range(1, 33)
    )
    + """ AS simhash32
    FROM hashed
    """,
)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash document fingerprint: each md5-hex nibble's high
    bit votes +1/-1 per token occurrence; the fingerprint is the sign
    vector. Near-dup docs differ in few bits (small Hamming distance),
    so at scale candidates come from banding the bit string (equal
    8-bit band → join), exactly like the MinHash path.

    Computed SHUFFLE-FREE: the 32 bit-votes are ``aggregate(...)``
    higher-order folds over the per-doc md5'd token array inside the
    scan stage — no explode, no groupBy, the token-hash stream never
    crosses an exchange (vs the naive explode+groupBy, which shuffles
    ~2× the corpus text bytes in md5 hex). Every doc gets a
    fingerprint (zero tokens → all-zero sign vector). Portable bit
    arithmetic: the hex-nibble high bit is a substring test both
    engines share."""
    docs = _spread(load(spark, sf_dir, "documents"))
    hs = F.transform(_tokens(), lambda t: F.md5(t))
    hashed = docs.select("doc_id", hs.alias("hs"))
    high = ("8", "9", "a", "b", "c", "d", "e", "f")

    def vote(j: int):
        # fold: +1 per token whose j-th hex nibble has its high bit set,
        # -1 otherwise; sign of the fold is bit j of the fingerprint
        return F.aggregate(
            "hs",
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, j, 1).isin(*high), 1).otherwise(-1),
        )

    fp = F.concat(
        *[
            F.when(vote(j) > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(1, 33)
        ]
    )
    return hashed.select("doc_id", fp.alias("simhash32"))


@register(
    "llm_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           -- coalesce: DuckDB's array_to_string renders the EMPTY
           -- sketch as NULL where Spark's concat_ws gives '' — short
           -- docs must hash the empty string on both engines
           md5(coalesce(
               array_to_string(list_slice(list_sort(hd), 1, 5), ''), ''))
               AS fingerprint,
           CAST(len(hd) AS BIGINT) AS n_shingles
    FROM (
      SELECT doc_id,
             list_distinct(list_transform(
                 list_transform(generate_series(1, len(toks) - 2),
                                i -> array_to_string(toks[i:i+2], ' ')),
                 s -> md5(s))) AS hd
      -- coalesce: a NULL-text doc hashes the empty sketch exactly
      -- like Spark's when(n >= 3, …).otherwise(empty) guard, instead
      -- of cascading NULL through len/generate_series
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(coalesce(text, '')), ' '),
                               t -> t <> '') AS toks
            FROM documents)
    )
    """,
)
def llm_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (k=5) sketch fingerprint over rolling word-trigram
    hashes — the winnowing-style document signature: the k smallest
    shingle hashes are stable under small edits, so equal fingerprints
    (or overlapping bottom-k sets) flag near-identical docs without
    comparing text. Computed SHUFFLE-FREE as higher-order functions
    over the per-doc shingle array (no explode/groupBy — the shingle
    stream never crosses an exchange); every doc gets a fingerprint
    (docs under 3 tokens hash the empty sketch, n_shingles = 0). The
    sketch is 5 hashes per doc no matter the doc length, so the dedup
    join state at 100 TB is O(docs), not O(text)."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingle_arrays(docs)
    hd = F.array_distinct(F.transform("sh", lambda s: F.md5(s)))
    return sh.select(
        "doc_id",
        F.md5(F.concat_ws("", F.slice(F.array_sort(hd), 1, 5))).alias(
            "fingerprint"
        ),
        F.size(hd).cast("bigint").alias("n_shingles"),
    )


_LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
    "de": ("der", "die", "und"),
    "zh": ("de5", "shi4", "le5"),
}


@register(
    "llm_text_langid",
    oracle="""
    WITH scored AS (
      SELECT lang,
             len(list_filter(toks, t -> list_contains(['the','a','of'], t)))
                 AS s_en,
             len(list_filter(toks, t -> list_contains(['le','la','et'], t)))
                 AS s_fr,
             len(list_filter(toks, t -> list_contains(['el','los','que'], t)))
                 AS s_es,
             len(list_filter(toks, t -> list_contains(['der','die','und'], t)))
                 AS s_de,
             len(list_filter(toks, t -> list_contains(['de5','shi4','le5'], t)))
                 AS s_zh
      FROM (SELECT lang, list_filter(string_split(lower(text), ' '),
                                     t -> t <> '') AS toks
            FROM documents)
    )
    SELECT lang,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0
                     AND s_zh = 0 THEN 'und'
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de
                     AND s_en >= s_zh THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh
                     THEN 'fr'
                WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh' END AS predicted,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
)
def llm_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic, reported as a (true lang ×
    predicted lang) confusion table. Deterministic priority order
    (en>fr>es>de>zh) breaks score ties so both engines agree exactly.

    NOTE: the synthetic fixture draws every language's text from one
    shared English-ish vocabulary, so accuracy here is chance-level by
    construction — the deliverable is the scoring pipeline (per-doc
    marker counting is a zero-shuffle scan-stage computation; the
    confusion rollup is one small aggregation), which is exactly the
    shape of a real stopword/n-gram language classifier at 100 TB."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()

    def marker_count(markers):
        arr = F.array(*[F.lit(w) for w in markers])
        # one-arg lambda: a default-arg closure would make PySpark read
        # the arity as 2 and pass the element index as the second param
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {
        lang: marker_count(markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    scored = docs.select(
        "lang", *[s.alias(f"s_{lang}") for lang, s in scores.items()]
    )
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] == 0)
            & (s["fr"] == 0)
            & (s["es"] == 0)
            & (s["de"] == 0)
            & (s["zh"] == 0),
            "und",
        )
        .when(
            (s["en"] >= s["fr"])
            & (s["en"] >= s["es"])
            & (s["en"] >= s["de"])
            & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )
    return (
        scored.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


#: Sign-LSH blocking for the *oracled* embed-cosine dedup: table t
#: reads the sign bits of embedding dims [4t, 4t+4).  Axis-aligned
#: hyperplanes are statistically equivalent to random ones on isotropic
#: embeddings and — unlike the `_LSH_PLANES` float matrices — are
#: exactly expressible in the DuckDB oracle, so the blocked candidate
#: set itself is hash-checkable.
_EMB_DEDUP_TABLES = 3
_EMB_DEDUP_BITS = 4


def _axis_bucket(col, table: int):
    """Bucket id in [0, 2^bits) from sign bits of 4 embedding dims."""
    code = F.lit(0)
    for b in range(_EMB_DEDUP_BITS):
        idx = table * _EMB_DEDUP_BITS + b + 1  # element_at is 1-based
        code = code + F.when(
            F.element_at(col, idx) > 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
    return code


@register(
    "llm_dedup_embed_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), d AS (
      SELECT vec_id, e, list_sum(list_transform(e, x -> x * x)) AS nrm
      FROM v
    ), bk AS (
      SELECT vec_id, t.table_id,
             (CASE WHEN e[t.table_id * 4 + 1] > 0 THEN 1 ELSE 0 END
            + CASE WHEN e[t.table_id * 4 + 2] > 0 THEN 2 ELSE 0 END
            + CASE WHEN e[t.table_id * 4 + 3] > 0 THEN 4 ELSE 0 END
            + CASE WHEN e[t.table_id * 4 + 4] > 0 THEN 8 ELSE 0 END)
               AS bucket
      FROM d, (SELECT unnest([0, 1, 2]) AS table_id) t
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bk a JOIN bk b
        ON a.table_id = b.table_id AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           round(list_sum(list_transform(generate_series(1, len(x.e)),
                                         i -> x.e[i] * y.e[i]))
                 / sqrt(x.nrm * y.nrm), 4) AS sim
    FROM cand c
    JOIN d x ON c.vec_a = x.vec_id
    JOIN d y ON c.vec_b = y.vec_id
    WHERE round(list_sum(list_transform(generate_series(1, len(x.e)),
                                        i -> x.e[i] * y.e[i]))
                / sqrt(x.nrm * y.nrm), 4) >= 0.25
    """,
)
def llm_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-BLOCKED (the shape
    you run at 100 TB): candidates come from an equi-join on
    (table_id, bucket) over 3 sign-bit tables, exact cosine is
    computed only on bucket-mates, and the blocking is deterministic
    (axis-aligned sign bits) so the WHOLE pipeline — blocking included
    — is replicated by the DuckDB oracle and hash-checked.

    Plan shape: bucket codes are pure scan-stage arithmetic on slim
    (vec_id, table, bucket) rows; the only shuffles are the candidate
    equi-join and the pair dedup — never an all-pairs product (the
    brute-force O(n²) form is registered separately as
    ``llm_dedup_embed_cosine_bruteforce``). Embeddings are fetched for
    the surviving candidate pairs via two hash joins on vec_id, so the
    64-float vectors cross the wire O(candidates), not O(n²).

    Recall is governed by bits×tables exactly as in
    ``llm_sim_lsh_approx``: at the fixture's demonstration threshold
    (0.25 on random vectors) blocking keeps ~30% of qualifying pairs —
    at a production near-dup threshold (0.95+) the same 3×4
    parameterization retains ≈96% and more tables push it arbitrarily
    close to 1. The oracle checks the *blocked* semantics, so the
    match is exact, not approximate.

    r13 (VERDICT r12 item 7 — the r12 audit left this key's 3
    payload re-scans unmeasured): quiet-box A/B at sf0.1 read re-scan
    0.703 s vs pinned payload 0.589 s, so the (vec_id, embedding, nrm)
    frame is now pinned through the SIZE-GATED helper — one evaluation
    while embeddings is small, recompute (the r12 re-scan behavior,
    correct and payload-spill-free) at corpus scale where pinning
    vector payloads in executor blocks is the documented §5
    liability."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = pin(
        emb.select("vec_id", "embedding", nrm.alias("nrm")),
        approx_input_bytes=input_size_bytes(sf_dir, "embeddings"),
    )
    slim = d.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        _axis_bucket(F.col("embedding"), t).alias("bucket"),
                    )
                    for t in range(_EMB_DEDUP_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.table_id", "tb.bucket")

    a = slim.select(
        F.col("vec_id").alias("vec_a"), "table_id", "bucket"
    )
    b = slim.select(
        F.col("vec_id").alias("vec_b"), "table_id", "bucket"
    )
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )

    x = d.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
        F.col("nrm").alias("nrm_a"),
    )
    y = d.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = F.round(
        _dot(F.col("e_a"), F.col("e_b"))
        / F.sqrt(F.col("nrm_a") * F.col("nrm_b")),
        4,
    )
    return (
        cand.join(x, "vec_a")
        .join(y, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.25)
    )


@register(
    "llm_dedup_embed_cosine_bruteforce",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), d AS (
      SELECT vec_id, e, list_sum(list_transform(e, x -> x * x)) AS nrm
      FROM v
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_sum(list_transform(generate_series(1, len(a.e)),
                                         i -> a.e[i] * b.e[i]))
                 / sqrt(a.nrm * b.nrm), 4) AS sim
    FROM d a JOIN d b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(generate_series(1, len(a.e)),
                                        i -> a.e[i] * b.e[i]))
                / sqrt(a.nrm * b.nrm), 4) >= 0.25
    """,
)
def llm_dedup_embed_cosine_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-cosine near-dup pairs, BRUTE FORCE: all id-ordered
    pairs with rounded cosine ≥ threshold. This is the exact
    correctness baseline (100% recall by construction) used to measure
    the blocked primary's recall in tests/test_properties.py — the
    O(n²) non-equi self-join is deliberate here and NOT the production
    path; ``llm_dedup_embed_cosine`` (LSH-blocked, equi-join only) is.
    Same double fold order as the oracle, so sims match to the last
    bit before rounding."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    a = d.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = d.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = F.round(
        _dot(F.col("e_a"), F.col("e_b"))
        / F.sqrt(F.col("nrm_a") * F.col("nrm_b")),
        4,
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.25)
    )


# ---------------------------------------------------------------------------
# corpus curation: deterministic sampling / splitting / shard packing
# ---------------------------------------------------------------------------


@register(
    "llm_sample_stratified_hash",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
    GROUP BY lang
    """,
)
def llm_sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~19% corpus sample (md5 first hex digit ∈ {0,1,2} —
    3/16) summarized per language. Hash-based sampling is how a
    training-data pipeline samples reproducibly at 100 TB: no RNG state,
    no sort, stable under reruns and repartitioning, and any engine can
    re-derive membership (unlike ``df.sample`` whose output depends on
    partitioning). Filter evaluates in the scan stage; one small
    aggregation follows."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        docs.where(bucket.isin("0", "1", "2"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "llm_split_train_test",
    oracle="""
    SELECT CASE WHEN b < 8 THEN 'train'
                WHEN b = 8 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 10 AS b
      FROM documents
    )
    GROUP BY 1, 2
    """,
)
def llm_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-free key
    hash (md5 of doc_id → 16-bit int → bucket mod 10), reported as a
    per-split-per-language profile. The split is a pure scan-stage
    expression: membership never changes across reruns, engines, or
    cluster layouts — the property that keeps eval sets uncontaminated
    when the corpus is rebuilt. (conv(hex)/DuckDB '0x' cast agree on
    16-bit values exactly.)"""
    docs = load(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    split = (
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "llm_pack_token_shards",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t <> '')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens) / 2000.0)
                  AS INTEGER) AS shard_id
      FROM toks
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed GROUP BY shard_id
    """,
)
def llm_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2000-token training shards: running token
    count over a stable doc order, shard = floor(prefix_sum/budget) —
    the standard sequence-packing preprocessing step.

    The global-ordered running sum runs as a DISTRIBUTED prefix sum
    (scale_rank.with_cumsum: range-repartition + per-partition running
    sums + broadcast partition offsets), never a single-partition
    window — exact, so the oracle is unchanged. At 100 TB you
    additionally shard the order key first (pack per day/source
    partition, how sequence packing is run in practice) so even the
    range shuffle is per-partition."""
    from .scale_rank import with_cumsum

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(_tokens()).alias("n_tokens")
    )
    cum = with_cumsum(
        toks, [F.col("doc_id").asc()], ["n_tokens"], ["__cum_incl"]
    )
    running = F.col("__cum_incl") - F.col("n_tokens")
    packed = cum.withColumn(
        "shard_id", F.floor(running / 2000.0).cast("int")
    )
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# dedup clustering (iterative) + TF-IDF
# ---------------------------------------------------------------------------


def _minhash_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate edges (doc_a < doc_b) from the banded MinHash
    pipeline — same construction as llm_dedup_near_minhash."""
    docs = load(spark, sf_dir, "documents")
    sigs = _shingle_arrays(docs).select("doc_id", *_minhash_sig_cols())
    bands = _explode_bands(sigs)
    return (
        bands.alias("a")
        .hint("shuffle_hash")
        .join(bands.alias("b"), ["band_id", "sig"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


@register(
    "llm_dedup_cluster_components",
    oracle="""
    WITH RECURSIVE shingles AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS toks
            FROM documents)
    ), per_doc AS (
      SELECT doc_id,
             min(md5(sh || '#0')) AS h0, min(md5(sh || '#1')) AS h1,
             min(md5(sh || '#2')) AS h2, min(md5(sh || '#3')) AS h3,
             min(md5(sh || '#4')) AS h4, min(md5(sh || '#5')) AS h5,
             min(md5(sh || '#6')) AS h6, min(md5(sh || '#7')) AS h7
      FROM shingles GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, band_id, sig FROM per_doc, LATERAL (VALUES
        (0, h0 || h1), (1, h2 || h3),
        (2, h4 || h5), (3, h6 || h7)) AS b(band_id, sig)
    ), edges AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig
                               AND a.doc_id < b.doc_id
    ), sym AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges
    ), reach(u, label) AS (
      SELECT DISTINCT u, u AS label FROM sym
      UNION
      SELECT s.u, r.label FROM sym s JOIN reach r ON r.u = s.v
    )
    SELECT u AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
    FROM reach GROUP BY u
    """,
)
def llm_dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup candidate graph: every doc
    in a duplicate cluster gets the cluster's min doc_id as its label —
    the step that turns pairwise near-dup hits into 'keep one per
    cluster'. Implemented as iterative min-label propagation (each pass:
    label(u) = min(label(u), min over neighbors label(v))) with
    ``localCheckpoint`` truncating lineage per round; converges in
    O(component diameter) joins — candidate clusters are tiny by
    construction, so 2-3 rounds in practice. (Web-scale graphs would use
    the large-star/small-star variant; the loop skeleton is the same.)
    Oracle: DuckDB recursive CTE reachability with min-label
    aggregation."""
    edges = _minhash_edges(spark, sf_dir)
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    sym = sym.localCheckpoint()

    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    while True:
        neighbor = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("vlabel")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
    )


@register(
    "llm_text_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                              t -> t <> '')) AS word
            FROM documents)
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.word,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df ON df.word = tf.word CROSS JOIN n
    )
    SELECT doc_id, word, tfidf
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, word) <= 3
    """,
)
def llm_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic salient-term
    extraction. Three aggregations (term frequency, document frequency,
    corpus size) and one top-k window; df and the 1-row corpus count
    broadcast onto the tf table, so the heavy side shuffles once.
    Ranked on the rounded score with a word tiebreak so rank order is
    engine-independent (ln() differs by ≤1 ulp across libm
    implementations; 6dp rounding absorbs it)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@register("llm_multimodal_frame_sample", tags=("rows-only",))
def llm_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: treat each document's utf-8 payload as
    an opaque media blob, cut it into fixed 64-byte 'frames', and keep
    every 4th frame with typed metadata — the exact plumbing shape of
    video frame-sampling / audio windowing (the real decoder is a
    library call inside the same mapInPandas; stubbed deterministically
    here because media libs aren't in this container, per the survey's
    stub policy).

    The Spark-side contract this locks: binary columns survive Arrow
    batching, the expansion is 1→N per row with bounded batch memory,
    and per-frame digests are computable for downstream exact dedup.
    Rows-only (binary slicing has no DuckDB twin here);
    tests/test_properties.py derives the expected frame inventory from
    payload lengths."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def sample_frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame_bytes": [], "frame_sha": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                import hashlib

                # missing payload → empty blob, never a batch-killing
                # AttributeError (hostile-input sweep)
                blob = (text or "").encode("utf-8")
                n_frames = (len(blob) + 63) // 64
                for i in range(0, n_frames, 4):  # every 4th frame
                    frame = blob[i * 64 : (i + 1) * 64]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        sample_frames,
        "doc_id long, frame_no int, frame_bytes int, frame_sha string",
    )


@register(
    "llm_decontaminate_overlap",
    oracle="""
    WITH shingles AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS toks
            FROM documents)
    ), eval_sh AS (
      SELECT DISTINCT sh FROM shingles WHERE doc_id % 50 = 0
    ), train_hits AS (
      SELECT s.doc_id, count(DISTINCT s.sh) AS n_shared
      FROM shingles s JOIN eval_sh e ON e.sh = s.sh
      WHERE s.doc_id % 50 <> 0
      GROUP BY s.doc_id
    )
    SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared
    FROM train_hits WHERE n_shared >= 3
    """,
)
def llm_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing ≥3
    distinct word-trigrams with any held-out eval document (doc_id %
    50 = 0 stands in for the benchmark set) — the n-gram-overlap
    contamination check every serious pre-training pipeline runs.

    Scale shape: the eval shingle set is small by construction
    (benchmarks are tiny relative to the corpus), so it broadcasts; the
    train side streams through one explode + broadcast-semi-join +
    groupBy — the 100 TB corpus is scanned once and never shuffles its
    raw text, only (doc_id, matched-shingle) pairs."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    eval_sh = (
        sh.where(F.col("doc_id") % 50 == 0).select("sh").distinct()
    )
    return (
        sh.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


@register(
    "llm_mix_sampling_weights",
    oracle="""
    WITH actual AS (
      SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
      FROM documents GROUP BY lang
    ), totals AS (
      SELECT sum(total_chars) AS corpus_chars FROM actual
    )
    SELECT a.lang,
           CAST(a.n_docs AS BIGINT) AS n_docs,
           round(a.total_chars * 1.0 / t.corpus_chars, 6) AS actual_share,
           round(0.2 / (a.total_chars * 1.0 / t.corpus_chars), 6)
               AS sample_weight
    FROM actual a CROSS JOIN totals t
    """,
)
def llm_mix_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing weights: given a uniform 20%-per-language
    target, compute each language's actual character share and the
    per-doc sampling weight (target/actual) that achieves the target mix
    — the arithmetic behind every data-mixture config. One small
    aggregation + a 1-row total broadcast; the weights then drive a
    weighted sampler (e.g. the md5-hash sampler in
    llm_sample_stratified_hash with per-lang thresholds)."""
    docs = load(spark, sf_dir, "documents")
    actual = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    totals = actual.agg(F.sum("total_chars").alias("corpus_chars"))
    share = F.col("total_chars") / F.col("corpus_chars")
    return actual.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_docs",
        F.round(share, 6).alias("actual_share"),
        F.round(F.lit(0.2) / share, 6).alias("sample_weight"),
    )


# Common-subset PII patterns (no lookaround/backrefs, so Java regex in
# Spark and RE2 in DuckDB agree byte-for-byte on every match).
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{4}\b"


@register(
    "llm_text_pii_redact",
    oracle="""
    WITH seeded AS (
      -- coalesce pins the NULL-concat divergence: Spark's concat is
      -- NULL-on-any-NULL, DuckDB's skips NULL operands (G4) — without
      -- it a NULL-text doc redacts on one engine only
      SELECT doc_id,
             concat(coalesce(text, ''), ' contact user',
                    CAST(doc_id AS VARCHAR),
                    '@mail.example or call 555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    ' now') AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(t, '"""
    + _PII_EMAIL
    + """', '[EMAIL]', 'g'), '"""
    + _PII_PHONE
    + """', '[PHONE]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(t, '"""
    + _PII_EMAIL
    + """')) + len(regexp_extract_all(t, '"""
    + _PII_PHONE
    + """')) AS INTEGER) AS n_redactions
    FROM seeded
    """,
)
def llm_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every pre-training corpus
    runs before tokenization. The fixture corpus carries no real PII,
    so deterministic contact strings (email + phone keyed by doc_id)
    are seeded first, then scrubbed with common-subset regexes and
    counted. Pure regexp_replace/regexp_count inside the scan stage:
    zero shuffles, runs at scan speed at 100 TB, and the match count
    feeds the audit metric (#redactions/doc) that QC dashboards track."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        # coalesce pins the NULL-concat divergence: Spark's concat is
        # NULL-on-any-NULL, DuckDB's skips NULL operands (G4)
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), _PII_EMAIL, "[EMAIL]"),
        _PII_PHONE,
        "[PHONE]",
    )
    n_red = (
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL))
        + F.regexp_count(F.col("t"), F.lit(_PII_PHONE))
    ).cast("int")
    return seeded.select(
        "doc_id",
        clean.alias("clean_text"),
        n_red.alias("n_redactions"),
    )


#: IVF cells probed per query — shared by llm_sim_ivf_topk and the
#: recall@5 property test so the documented recall floor can't drift
#: from the executed plan.
_IVF_NPROBE = 3


@register("llm_sim_ivf_topk", tags=("approx", "rows-only"))
def llm_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbour — the
    disk-scale ANN path, complementing llm_sim_lsh_approx.

    Classic IVF: (1) learn a small coarse codebook, (2) assign every
    corpus vector to its nearest centroid ("cell"), (3) at query time
    search only the ``_IVF_NPROBE`` = 3 most promising cells (the same
    constant drives the probe filter below and the recall floor in
    tests/test_properties.py). The codebook here is
    one k-means step from the labelled init (per-label mean via
    posexplode + groupBy(label, pos) — map-side combinable, one
    shuffle of K*dim tiny rows). Assignment is a broadcast of the
    K-row codebook against the corpus (map-only) followed by a single
    max_by groupBy per vector; at 100 TB the cell id would be written
    as a partition column so a query touches only nprobe partitions —
    the whole point of IVF. Candidates per query ≈ nprobe/K of the
    corpus, a 5× scan cut here and arbitrarily larger with a bigger
    codebook. Approx by nature → rows-only for the driver; recall@5 vs
    the exact llm_sim_topk_cosine is property-tested in pytest."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    d = emb.select(
        "vec_id",
        "label",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )

    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            F.col("label").alias("cell"),
            F.transform("pm", lambda s: s["m"]).alias("c_e"),
        )
        .withColumn("c_nrm", _dot(F.col("c_e"), F.col("c_e")))
    )

    csim = F.round(
        _dot(F.col("embedding"), F.col("c_e"))
        / F.sqrt(F.col("nrm") * F.col("c_nrm")),
        6,
    )
    scored = d.join(F.broadcast(cent)).select(
        "vec_id", "embedding", "nrm", "cell", csim.alias("csim")
    )

    # Corpus-side: each vector lives in exactly its best cell
    # (tie-break: smaller cell id).
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            "cell", F.struct(F.col("csim"), (-F.col("cell")).alias("nc"))
        ).alias("cell"),
        F.first("embedding").alias("embedding"),
        F.first("nrm").alias("nrm"),
    )

    # Query-side: every 100th vector probes its _IVF_NPROBE best cells.
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell")
    )
    qprob = (
        scored.where(F.col("vec_id") % 100 == 0)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_e"),
            F.col("nrm").alias("q_nrm"),
            "cell",
        )
    )

    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        best.join(F.broadcast(qprob), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "llm_embed_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM v
    ), q AS (
      SELECT vec_id, e, scale,
             list_transform(e, x -> CASE WHEN scale = 0 THEN 0.0
                                         ELSE floor(x / scale + 0.5) END) AS qv
      FROM s
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           round(sqrt(list_sum(list_transform(
               generate_series(1, len(e)),
               i -> (e[i] - qv[i] * scale) * (e[i] - qv[i] * scale)))
               / len(e)), 6) AS rms_err
    FROM q
    """,
)
def llm_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage/serving compression every vector corpus applies (4x smaller
    than float32, 8x than float64): per-vector scale = max|x|/127,
    quantized code = floor(x/scale + 0.5), plus the RMS reconstruction
    error so a pipeline can gate on quality. All higher-order functions
    inside the scan stage — zero shuffles, embarrassingly parallel at
    any corpus size. floor(x+0.5) is used instead of round() on BOTH
    engines because round()'s half-away vs half-even tie rules differ
    cross-engine (SURVEY §7.4 G2); sums fold sequentially to match
    DuckDB's list_sum bit-for-bit before the final display round."""
    emb = _spread(load(spark, sf_dir, "embeddings"))
    e = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select("vec_id", e.alias("e"))
    s = v.select(
        "vec_id",
        "e",
        (F.array_max(F.transform("e", lambda x: F.abs(x))) / 127.0).alias(
            "scale"
        ),
    )
    qv = F.transform(
        "e",
        lambda x: F.when(F.col("scale") == 0, 0.0).otherwise(
            F.floor(x / F.col("scale") + 0.5).cast("double")
        ),
    )
    q = s.select("vec_id", "e", "scale", qv.alias("qv"))
    sq_err = F.aggregate(
        F.zip_with(
            "e",
            F.transform("qv", lambda c: c * F.col("scale")),
            lambda a, r: (a - r) * (a - r),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # NB: the rounded scale gets its display alias in a SEPARATE select —
    # putting `round(scale) AS scale` in the same projection as sq_err
    # makes Spark's lateral-column-alias resolution rebind the
    # F.col("scale") references inside sq_err to the ROUNDED alias,
    # silently changing the error sum (verified on Spark 4.1.2).
    out = q.select(
        "vec_id",
        "scale",
        F.aggregate("qv", F.lit(0.0), lambda acc, x: acc + x)
        .cast("bigint")
        .alias("q_sum"),
        F.sqrt(sq_err / F.size("e")).alias("rms_raw"),
    )
    return out.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "q_sum",
        F.round("rms_raw", 6).alias("rms_err"),
    )


@register(
    "llm_multimodal_decode_features",
    oracle="""
    WITH bytes AS (
      -- coalesce: a missing payload decodes to the empty blob on both
      -- engines (G11); bins are CODEPOINT-based with saturation at 7
      -- so non-ASCII units are counted identically on both sides
      SELECT doc_id,
             list_transform(
                 list_filter(string_split(coalesce(text, ''), ''),
                             c -> c <> ''),  -- split('','') gives ['']
                 c -> least(ascii(c) // 32, 7)) AS bins,
             length(coalesce(text, '')) AS n_bytes
      FROM documents
    )
    SELECT doc_id,
           CAST(1 + doc_id % 64 AS INTEGER) AS width,
           CAST(1 + doc_id % 48 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           array_to_string(
             [CAST(len(list_filter(bins, b -> b = 0)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 1)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 2)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 3)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 4)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 5)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 6)) AS BIGINT),
              CAST(len(list_filter(bins, b -> b = 7)) AS BIGINT)], ',')
               AS feat
    FROM bytes
    """,
)
def llm_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode → feature-extract → resize plumbing over
    mapInPandas: binary payloads cross the Arrow boundary in batches,
    a (gated) decoder produces typed image metadata, and an 8-bin byte
    histogram stands in for the feature vector.  The histogram crosses
    the oracle boundary as a comma-joined string (SURVEY §7.4 G7: the
    comparator cannot canonicalize list cells).

    The real decoder (PIL/cv2) is probed behind an import-try per the
    survey's stub policy — absent in this container, the DETERMINISTIC
    fallback derives dimensions from the doc id and histograms the raw
    payload bytes, so the whole pipeline (binary column in, metadata
    struct + array feature column out, bounded Arrow batches) is real
    and fully ORACLED: the byte histogram is exact integer counts that
    DuckDB recomputes with ascii()//32 — no float tolerance anywhere.
    At 100 TB this is embarrassingly parallel; the only cross-executor
    bytes are the emitted features (~64 B/doc), never the media."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def decode(batches):
        try:  # pragma: no cover - media libs absent in this container
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            rows = {
                "doc_id": [],
                "width": [],
                "height": [],
                "channels": [],
                "n_bytes": [],
                "feat": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # a missing/corrupt payload decodes to an empty blob
                # instead of killing the whole Arrow batch — at 100 TB
                # one bad object must not fail the stage
                blob = text or ""
                # have_pil branch would Image.open(io.BytesIO(blob));
                # the fixture payloads are TEXT standing in for binary,
                # so the deterministic fake decode bins CODEPOINTS
                # (saturating at bin 7) — the unit the oracle's
                # ascii()-per-character recomputation can mirror; real
                # media would bin raw bytes the same way
                width, height, channels = 1 + doc_id % 64, 1 + doc_id % 48, 3
                hist = [0] * 8
                for ch in blob:
                    hist[min(ord(ch) // 32, 7)] += 1
                rows["doc_id"].append(doc_id)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["channels"].append(channels)
                rows["n_bytes"].append(len(blob))  # code units (see above)
                rows["feat"].append(",".join(str(c) for c in hist))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        decode,
        "doc_id long, width int, height int, channels int, "
        "n_bytes long, feat string",
    )


@register(
    "llm_dedup_ngram_jaccard",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS hs
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ), ex AS (
      SELECT doc_id, sh,
             row_number() OVER (PARTITION BY doc_id ORDER BY md5(sh)) AS rn,
             len(hs) AS n
      FROM (SELECT doc_id, hs, unnest(hs) AS sh FROM per_doc)
    ), prefix AS (
      SELECT doc_id, sh FROM ex
      WHERE rn <= greatest(1, n - CAST(ceil(n * 0.8) AS BIGINT) + 1)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             len(list_intersect(pa.hs, pb.hs)) AS i,
             len(pa.hs) + len(pb.hs) - len(list_intersect(pa.hs, pb.hs)) AS u
      FROM cand
      JOIN per_doc pa ON pa.doc_id = doc_a
      JOIN per_doc pb ON pb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, round(i * 1.0 / u, 4) AS jaccard
    FROM verified WHERE 5 * i >= 4 * u
    """,
)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (word-trigram) Jaccard near-dup pairs at threshold
    0.8 via a PREFIX-FILTERED set-similarity self-join (PPJoin-style),
    the third candidate-generation strategy in the dedup family next to
    banded MinHash (probabilistic) and SimHash (bit-vote).

    Prefix filter: order each doc's distinct shingles by a global total
    order (md5 hex); two sets with Jaccard >= t MUST share at least one
    of each other's first ``n - ceil(t*n) + 1`` shingles, so only that
    ~(1-t)*n-sized prefix is exploded into the inverted index — at
    t=0.8 the index (and the self-equi-join's shuffle) carries ~20% of
    the shingle stream, and the O(sum c^2) candidate blow-up of the
    naive share-a-shingle join collapses (11k -> ~hundreds of candidate
    pairs at sf0.01 on this corpus). The per-doc ordered prefix is
    computed SHUFFLE-FREE as array_sort over md5-tagged shingles inside
    the scan stage (same HOF discipline as the MinHash signatures);
    only the slim (doc_id, shingle) prefix rows are exchanged.
    Verification fetches both docs' shingle sets through ONE melt-join
    against a single shingle-array pass, and the >= 0.8 decision is
    integer-exact (5*intersect >= 4*union) — no float-boundary risk
    against the oracle."""
    docs = load(spark, sf_dir, "documents")
    per_doc = _shingle_arrays(docs).select(
        "doc_id", F.array_distinct("sh").alias("hs")
    )

    n = F.size("hs")
    plen = F.greatest(
        F.lit(1).cast("long"), n - F.ceil(n * F.lit(0.8)) + F.lit(1)
    )
    # md5-tag, sort, slice the prefix, untag — all inside the scan stage
    tagged = F.array_sort(
        F.transform("hs", lambda s: F.concat(F.md5(s), F.lit("|"), s))
    )
    prefix = per_doc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(tagged, F.lit(1), plen),
                lambda x: F.substring(x, 34, 1 << 20),
            )
        ).alias("sh"),
    )

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    melted = cand.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    )
    pair = (
        melted.join(per_doc, "doc_id")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max(F.when(F.col("doc_id") == F.col("doc_a"), F.col("hs"))).alias("hs_a"),
            F.max(F.when(F.col("doc_id") == F.col("doc_b"), F.col("hs"))).alias("hs_b"),
        )
    )
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return pair.where(inter * 5 >= union * 4).select(
        "doc_a",
        "doc_b",
        F.round(inter / union, 4).alias("jaccard"),
    )


# GPT-2-style pre-tokenizer, ASCII dialect-common subset: a token is an
# (optionally space-prefixed) letter run, digit run, or punctuation run,
# or a bare space run. Kept free of \p classes and lookarounds so the
# Java (Spark) and RE2 (DuckDB) engines match byte-for-byte (G4).
_BPE_PAT = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


@register(
    "llm_text_bpe_token_estimate",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
             AS BIGINT) AS n_ws_tokens,
           floor(len(regexp_extract_all(text, '{_BPE_PAT}')) * 10000.0
                 / len(list_filter(string_split(text, ' '), t -> t <> '')))
             / 10000 AS fertility
    FROM documents
    """,
)
def llm_text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-cost token estimation with a BPE-ish regex
    pre-tokenizer (GPT-2's shape: space-prefixed letter/digit/punct
    runs) next to the plain whitespace count, plus the fertility ratio
    (BPE tokens per word) that data-mix planners budget with.

    All three columns are scan-stage scalar expressions — zero
    exchanges, no UDF: regexp_extract_all runs inside whole-stage
    codegen, so at 100 TB token accounting rides the ingest scan for
    free. The ratio is floor-truncated (not rounded) for cross-engine
    bit-identity."""
    docs = load(spark, sf_dir, "documents")
    # NULL text: Spark size(NULL array) is -1 where DuckDB len() is
    # NULL — gate on isNotNull so both report NULL counts; zero words
    # makes fertility undefined: try_divide ≡ DuckDB's
    # NULL-on-zero-division (G11)
    notnull = F.col("text").isNotNull()
    n_bpe = F.when(
        notnull,
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))),
    )
    n_ws = F.when(notnull, F.size(_tokens("text")))
    return docs.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_ws.cast("long").alias("n_ws_tokens"),
        (F.floor(F.try_divide(n_bpe * 10000.0, n_ws)) / 10000).alias(
            "fertility"
        ),
    )


@register(
    "llm_dedup_survivors",
    oracle="""
    WITH RECURSIVE shingles AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS toks
            FROM documents)
    ), per_doc AS (
      SELECT doc_id,
             min(md5(sh || '#0')) AS h0, min(md5(sh || '#1')) AS h1,
             min(md5(sh || '#2')) AS h2, min(md5(sh || '#3')) AS h3,
             min(md5(sh || '#4')) AS h4, min(md5(sh || '#5')) AS h5,
             min(md5(sh || '#6')) AS h6, min(md5(sh || '#7')) AS h7
      FROM shingles GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, band_id, sig FROM per_doc, LATERAL (VALUES
        (0, h0 || h1), (1, h2 || h3),
        (2, h4 || h5), (3, h6 || h7)) AS b(band_id, sig)
    ), edges AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.sig = b.sig
                               AND a.doc_id < b.doc_id
    ), sym AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION ALL SELECT doc_b, doc_a FROM edges
    ), reach(u, label) AS (
      SELECT DISTINCT u, u AS label FROM sym
      UNION
      SELECT s.u, r.label FROM sym s JOIN reach r ON r.u = s.v
    ), clusters AS (
      SELECT u AS doc_id, min(label) AS cluster_id FROM reach GROUP BY u
    ), allc AS (
      SELECT d.doc_id,
             CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           first_value(doc_id) OVER (
               PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS survivor_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) = 1 AS kept
    FROM allc
    """,
)
def llm_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last step of the dedup pipeline: candidate pairs → connected
    components → ONE canonical survivor per cluster (longest doc wins,
    doc_id tiebreak), with every corpus doc labelled kept/dropped.
    Composes llm_dedup_cluster_components' min-label propagation with a
    per-cluster ranking window; singleton docs are their own cluster
    and always survive.

    Scale: the ranking window partitions on cluster_id — clusters are
    tiny by construction and singletons are 1-row partitions, so the
    per-partition sort is O(cluster size), no skew. The expensive part
    (candidate graph + components) is shared machinery already audited
    in PLANS.md; the survivor selection adds ONE corpus-sized window
    after a left join against the (small) clustered-doc label table."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labels = llm_dedup_cluster_components(spark, sf_dir)
    allc = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return allc.select(
        "doc_id",
        "cluster_id",
        F.first("doc_id").over(frame).alias("survivor_id"),
        (F.row_number().over(w) == 1).alias("kept"),
    )


@register(
    "llm_text_repetition_filter",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS toks
            FROM documents)
    ), counts AS (
      SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY doc_id, sh
    ), agg AS (
      SELECT doc_id, max(c) AS top_count, CAST(sum(c) AS BIGINT) AS n_tri
      FROM counts GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_tri, 0) AS BIGINT) AS n_trigrams,
           CAST(COALESCE(a.top_count, 0) AS BIGINT) AS top_trigram_count,
           CASE WHEN a.n_tri > 0
                THEN floor(a.top_count * 10000.0 / a.n_tri) / 10000
                ELSE 0.0 END AS repetition_ratio,
           COALESCE(a.top_count * 5 >= a.n_tri, FALSE) AS flagged
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
)
def llm_text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: the share of a doc's
    word-trigrams taken by its single most-repeated trigram; docs where
    one trigram is ≥20% of all trigrams get flagged (boilerplate,
    keyword stuffing, degenerate generations).

    Computed SHUFFLE-FREE: sort the per-doc shingle array, mark
    equal-adjacent pairs with zip_with, and fold the longest run with
    ``aggregate`` — max run length + 1 IS the top trigram count, all
    inside the scan stage's codegen (same HOF discipline as the MinHash
    signatures; the naive explode → groupBy(doc, trigram) → max ships
    the 10×-text shingle stream through two exchanges). The flag
    threshold is integer-exact (top*5 >= n). Oracle uses the explode
    form — different construction, same numbers."""
    docs = load(spark, sf_dir, "documents")
    per_doc = _shingle_arrays(docs)
    srt = F.array_sort("sh")
    n = F.size("sh")
    # greatest(n-1, 0): slice() raises on negative length for the
    # empty shingle arrays of <3-token docs
    flags = F.zip_with(
        srt,
        F.slice(srt, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.when(a == b, F.lit(1)).otherwise(F.lit(0)),
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("run"), F.lit(0).cast("int").alias("best")
    )
    best_run = F.aggregate(
        flags,
        zero,
        lambda acc, x: F.struct(
            F.when(x == 1, acc.run + 1).otherwise(F.lit(0)).alias("run"),
            F.greatest(
                acc.best, F.when(x == 1, acc.run + 1).otherwise(F.lit(0))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    top = F.when(n > 0, best_run + 1).otherwise(F.lit(0)).cast("long")
    return per_doc.select(
        "doc_id",
        n.cast("long").alias("n_trigrams"),
        top.alias("top_trigram_count"),
        F.when(n > 0, F.floor(top * 10000.0 / n) / 10000)
        .otherwise(F.lit(0.0))
        .alias("repetition_ratio"),
        F.when(n > 0, top * 5 >= n).otherwise(F.lit(False)).alias("flagged"),
    )


@register("llm_embed_pca_project", tags=("rows-only", "approx"))
def llm_embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the 64-dim embedding corpus onto its top-2
    principal components — the dimensionality reduction step before
    visualization / coarse clustering of a training corpus.

    Distributed linear algebra, Spark-shaped: (1) each Arrow batch
    computes its PARTIAL Gram matrix X^T X, mean-sum and count with one
    BLAS call (mapInArrow — 64×64 floats per batch, no per-row Python);
    (2) the shuffle carries only 4096-row partials which a groupBy
    sums — at 100 TB the reduce traffic is partitions × 33 KB,
    independent of corpus size; (3) the driver eigensolves the tiny
    64×64 covariance (the ONLY driver-side compute — fixed-size, not
    corpus-size) and the two eigenvectors return as broadcast literals
    folded into a scan-stage zip_with dot product. No oracle: eigen
    results are float-iteration artifacts DuckDB cannot reproduce
    bit-wise; invariants (explained-variance ordering, component
    orthogonality, projection centering) are pytest properties."""
    import numpy as np

    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings")
    dim = 64

    def gram_partials(batches):
        for batch in batches:
            x = np.vstack(
                batch.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            g = x.T @ x
            i, j = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pa.RecordBatch.from_pydict(
                {
                    "i": i.ravel().astype("int32"),
                    "j": j.ravel().astype("int32"),
                    "g": g.ravel(),
                    "s": np.tile(x.sum(axis=0), dim),   # mean-sum rides along
                    "n": np.full(dim * dim, len(x), dtype="int64"),
                }
            )

    partials = emb.select("embedding").mapInArrow(
        gram_partials, "i int, j int, g double, s double, n long"
    )
    agg = (
        partials.groupBy("i", "j")
        .agg(F.sum("g").alias("g"), F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    G = np.zeros((dim, dim))
    S = np.zeros(dim)
    n = 0
    for r in agg:
        G[r.i, r.j] = r.g
        if r.i == 0:
            S[r.j] = r.s
            n = r.n  # each (0,j) partial row carries the batch count once
    if n < 2:
        # degenerate corpus (0 or 1 vectors): no covariance exists —
        # center on the lone vector (or zero) and project onto the
        # first two basis axes, deterministically, instead of feeding
        # NaNs to the eigensolver
        mu = S / n if n else S
        pcs = [
            [1.0 if d == 0 else 0.0 for d in range(dim)],
            [1.0 if d == 1 else 0.0 for d in range(dim)],
        ]
    else:
        mu = S / n
        cov = (G - n * np.outer(mu, mu)) / (n - 1)
        vals, vecs = np.linalg.eigh(cov)
        pcs = []
        for k in (dim - 1, dim - 2):  # eigh sorts ascending
            v = vecs[:, k]
            v = v if v[int(np.abs(v).argmax())] > 0 else -v  # deterministic sign
            pcs.append([float(x) for x in v])

    mu_col = _dbl_array_lit(mu)
    centered = F.zip_with("embedding", mu_col, lambda a, b: a - b)

    def project(pc):
        pc_col = _dbl_array_lit(pc)
        return F.round(
            F.aggregate(
                F.zip_with(centered, pc_col, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    return emb.select(
        "vec_id",
        "label",
        project(pcs[0]).alias("pc1"),
        project(pcs[1]).alias("pc2"),
    )


@register(
    "llm_dataset_card_stats",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                    t -> t <> ''))) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dup_docs
    FROM documents
    """,
)
def llm_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card one-liner: corpus size, token and char volume,
    language/source diversity, and exact-duplicate count — the summary
    row every training-data release publishes. ONE scan: token counts
    are scan-stage HOFs and the exact-dup count rides the same
    aggregate as count(distinct md5). The multi-distinct Expand is over
    a 1-group aggregation, so the shuffle is a handful of rows per
    partition at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens("text"))).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias(
            "n_exact_dup_docs"
        ),
    )


@register(
    "llm_doc_chunking",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(s AS INTEGER) AS start_tok,
             tk[s:least(s + 49, len(tk))] AS ck
      FROM toks, LATERAL unnest(generate_series(1, greatest(len(tk), 1), 40))
           AS u(s)
    )
    SELECT doc_id, start_tok,
           CAST(len(ck) AS INTEGER) AS n_tokens,
           array_to_string(ck, ' ') AS chunk_text
    FROM chunks WHERE len(ck) > 0
    """,
)
def llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (50-token chunks, stride 40 →
    10-token overlap) — the split step every RAG index and
    long-document training pipeline runs before embedding.

    Scan-stage HOFs end to end: token array → ``sequence`` of chunk
    starts → ``explode`` → ``slice`` — the chunk text is materialized
    from the SAME in-memory token array, never re-tokenized, and the
    1→N expansion happens inside the scan's codegen with no exchange
    (at 100 TB chunking is a map-only pass that writes straight to the
    partitioned sink). ``greatest(n, 1)`` keeps the sequence ascending
    for empty docs (Spark's sequence counts DOWN if stop < start), and
    empty chunks are filtered identically on both engines."""
    docs = load(spark, sf_dir, "documents")
    tk = _tokens("text")
    n = F.size(tk)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(40))
    chunks = docs.select(
        "doc_id",
        tk.alias("tk"),
        F.explode(starts).alias("start_tok"),
    ).select(
        "doc_id",
        "start_tok",
        F.slice("tk", F.col("start_tok"), F.lit(50)).alias("ck"),
    )
    return chunks.where(F.size("ck") > 0).select(
        "doc_id",
        "start_tok",
        F.size("ck").alias("n_tokens"),
        F.array_join("ck", " ").alias("chunk_text"),
    )


@register("llm_embed_kmeans", tags=("rows-only", "approx"))
def llm_embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (K=8, 5 iterations, euclidean) over the
    embedding corpus — iterative ML expressed as DataFrame ops.

    Per iteration: (1) ASSIGN is map-only — the K×64 codebook rides
    into the scan as literal arrays, each vector's nearest centroid is
    an argmin over a ``transform`` of squared distances, zero
    exchanges; (2) UPDATE is one map-combinable shuffle of posexploded
    (cell, pos, x) rows whose reduce output is K×64 rows regardless of
    corpus size; the new codebook (a few KB) returns via collect — the
    same fixed-size driver hop as the PCA eigensolve, never
    corpus-sized. Init is DETERMINISTIC: the K vectors with the
    smallest md5(vec_id) seed the codebook, so reruns and the pytest
    numpy replication converge identically. Rows-only for the driver;
    invariants (monotone inertia, exact agreement with a same-init
    numpy Lloyd's) are property-tested."""
    import numpy as np

    K, ITERS, DIM = 8, 5, 64
    emb = _spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )

    seeds = (
        emb.select("vec_id", "embedding", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(K)
        .collect()
    )
    cents = [[float(x) for x in r.embedding] for r in sorted(seeds, key=lambda r: r.h)]
    if not cents:
        # empty corpus: no seeds exist — zero assignment rows with the
        # same (vec_id, cell) schema instead of an untypable empty
        # codebook literal
        return emb.select(
            "vec_id", F.lit(None).cast("bigint").alias("cell")
        )

    def assign_col(cents_):
        cent_lit = _dbl_array_lit(cents_)
        dists = F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with("embedding", c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        # array_position is 1-based; ties break to the lowest cell id
        return (F.array_position(dists, F.array_min(dists)) - 1).alias("cell")

    for _ in range(ITERS):
        assigned = emb.select("vec_id", "embedding", assign_col(cents))
        rows = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = np.array(cents)
        for r in rows:
            new[r.cell][r.pos] = r.m
        cents = [[float(x) for x in row] for row in new]

    return emb.select("vec_id", assign_col(cents))


@register(
    "llm_dedup_incremental_batch",
    oracle="""
    WITH shingles AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS toks
            FROM documents)
    ), per_doc AS (
      SELECT doc_id,
             min(md5(sh || '#0')) AS h0, min(md5(sh || '#1')) AS h1,
             min(md5(sh || '#2')) AS h2, min(md5(sh || '#3')) AS h3,
             min(md5(sh || '#4')) AS h4, min(md5(sh || '#5')) AS h5,
             min(md5(sh || '#6')) AS h6, min(md5(sh || '#7')) AS h7
      FROM shingles GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, band_id, sig FROM per_doc, LATERAL (VALUES
        (0, h0 || h1), (1, h2 || h3),
        (2, h4 || h5), (3, h6 || h7)) AS b(band_id, sig)
    ), hits AS (
      SELECT DISTINCT b.doc_id
      FROM bands b JOIN bands c ON b.band_id = c.band_id AND b.sig = c.sig
      WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
    )
    SELECT d.doc_id,
           d.doc_id IN (SELECT doc_id FROM hits) AS is_near_dup_of_corpus
    FROM documents d WHERE d.doc_id % 5 = 0
    """,
)
def llm_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dedup: screen a new ingest batch (doc_id%5=0,
    standing in for today's crawl) against the EXISTING corpus without
    re-deduping the corpus against itself — the production shape, where
    the corpus's band signatures are a precomputed, persisted index and
    each day's cost is O(batch) signature computation plus a
    batch×index bucket join. The join is band-equi (never all-pairs)
    and one-directional (batch rows probe corpus buckets; corpus-corpus
    and batch-batch pairs are excluded by the parity predicates), so a
    10^5-doc batch against a 10^10-doc index touches only colliding
    buckets. Every batch doc comes back with a keep/quarantine flag."""
    docs = load(spark, sf_dir, "documents")
    sigs = _shingle_arrays(docs).select("doc_id", *_minhash_sig_cols())
    bands = _explode_bands(sigs)
    batch_bands = bands.where(F.col("doc_id") % 5 == 0)
    corpus_bands = bands.where(F.col("doc_id") % 5 != 0).select(
        "band_id", "sig"
    )
    hits = (
        batch_bands.hint("shuffle_hash")
        .join(corpus_bands.distinct(), ["band_id", "sig"])
        .select("doc_id")
        .distinct()
        .withColumn("is_near_dup_of_corpus", F.lit(True))
    )
    batch = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    return batch.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("is_near_dup_of_corpus", F.lit(False)).alias(
            "is_near_dup_of_corpus"
        ),
    )


@register(
    "llm_text_perplexity_proxy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, u.w AS word, u.i AS pos
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
            FROM documents) d,
           LATERAL (SELECT unnest(d.tk) AS w,
                           unnest(generate_series(1, len(d.tk))) AS i) u
      WHERE u.w <> ''
    ), freq AS (
      SELECT word, CAST(count(*) AS DOUBLE) AS cnt FROM toks GROUP BY word
    ), tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM toks
    ), scored AS (
      SELECT t.doc_id, t.pos,
             floor(ln(f.cnt / tot.n) * 1000000) / 1000000 AS lp
      FROM toks t JOIN freq f ON t.word = f.word CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor(list_sum(list(lp ORDER BY pos)) / count(*) * 10000) / 10000
               AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def llm_text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy — the classic cheap quality signal
    for training-data filtering: score each document by the mean log
    probability of its tokens under the corpus's own unigram
    distribution (low = rare/garbled text, the rows a perplexity filter
    drops).

    Scale shape: the unigram table is one map-combinable groupBy
    (vocabulary-sized, tiny vs the corpus); token rows join it on the
    word hash; the per-doc score folds token log-probs in POSITION
    order (array_sort on (pos, lp) then a sequential aggregate()), so
    the float sum is bit-identical on both engines — a plain SUM would
    be order-nondeterministic. Each token's ln() is floor-truncated to
    1e-6 first: ln is the one non-IEEE-exact op in the pipeline
    (libm implementations may differ in the last ulp), truncation
    quantizes that away; the per-doc mean is floor-truncated at 1e-4
    the same way. At 100 TB the freq table is broadcast and the whole
    score pipeline is scan + one hash join + one doc-keyed
    aggregation."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    freq = toks.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    lp = F.floor(F.log(F.col("cnt") / F.col("n")) * 1e6) / 1e6
    scored = (
        toks.join(freq, "word")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "pos", lp.alias("lp"))
    )
    fold = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lp"))),
            lambda s: s["lp"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.floor(fold / F.count(F.lit(1)) * 1e4) / 1e4).alias("avg_logprob"),
    )


@register(
    "llm_embed_matryoshka_truncate",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), d AS (
      SELECT vec_id,
             list_sum(list_transform(e, x -> x * x)) AS full_sq,
             list_sum(list_transform(e[1:16], x -> x * x)) AS trunc_sq
      FROM v
    )
    SELECT vec_id,
           floor(sqrt(trunc_sq) * 1000000) / 1000000 AS trunc_norm,
           floor(trunc_sq / full_sq * 1000000) / 1000000 AS energy_kept
    FROM d
    """,
)
def llm_embed_matryoshka_truncate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style embedding truncation: keep the first 16 of 64
    dims and report the retained norm and energy fraction — the
    bookkeeping behind two-stage retrieval (cheap truncated-dim
    prefilter over the whole corpus, full-dim rerank on the shortlist;
    recall of that cascade is property-tested in
    tests/test_properties.py).

    Scale shape: pure scan-stage higher-order functions (slice +
    zip-free square folds), zero exchanges — truncation at 100 TB is a
    map-only rewrite that cuts vector bytes 4× before any index build.
    All arithmetic is IEEE-exact (mul/add fold in array order + sqrt),
    floor-truncated for display."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    full_sq = F.aggregate(
        F.transform(e, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    trunc_sq = F.aggregate(
        F.transform(F.slice(e, 1, 16), lambda x: x * x),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # zero-norm vectors have no defined energy ratio: try_divide ≡
    # DuckDB's NULL-on-zero-division (G11)
    return emb.select(
        "vec_id",
        (F.floor(F.sqrt(trunc_sq) * 1e6) / 1e6).alias("trunc_norm"),
        (F.floor(F.try_divide(trunc_sq, full_sq) * 1e6) / 1e6).alias(
            "energy_kept"
        ),
    )


@register(
    "llm_embed_norm_outliers",
    oracle="""
    WITH d AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(
                 list_transform(embedding, x -> CAST(x AS DOUBLE)),
                 x -> x * x))) AS nrm
      FROM embeddings
    ), stats AS (
      SELECT avg(nrm) AS mu, stddev_samp(nrm) AS sigma FROM d
    )
    SELECT vec_id,
           floor(nrm * 10000) / 10000 AS norm,
           floor((nrm - mu) / sigma * 100) / 100 AS z,
           abs((nrm - mu) / sigma) > 2.5 AS is_outlier
    FROM d CROSS JOIN stats
    """,
)
def llm_embed_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus hygiene: per-vector L2 norm z-scored against
    the corpus distribution, flagging degenerate vectors (zero/huge
    norms — the typical symptom of failed inference or truncated
    uploads that silently poison cosine search).

    Scale shape: norms are scan-stage folds; (mu, sigma) is ONE tiny
    global aggregate broadcast back onto the corpus (the 1-row scalar
    join — O(n)·1 by construction); the z-score and flag evaluate in
    the joined scan stage. Same pattern as evt_anomaly_zscore, applied
    to the vector corpus. Norm fold order is fixed (array order) so
    cross-engine floats agree; z floor-truncated at 1e-2 because
    stddev_samp's update order can differ in the last ulp."""
    emb = load(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    d = emb.select("vec_id", nrm.alias("nrm"))
    stats = d.agg(
        F.avg("nrm").alias("mu"), F.stddev_samp("nrm").alias("sigma")
    )
    z = (F.col("nrm") - F.col("mu")) / F.col("sigma")
    return d.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        (F.floor(F.col("nrm") * 1e4) / 1e4).alias("norm"),
        (F.floor(z * 100) / 100).alias("z"),
        (F.abs(z) > 2.5).alias("is_outlier"),
    )


@register(
    "llm_anchor_negative_triplets",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), d AS (
      SELECT vec_id, e, list_sum(list_transform(e, x -> x * x)) AS nrm
      FROM v
    ), anchors AS (
      SELECT vec_id AS anchor_id, e AS a_e, nrm AS a_nrm
      FROM d WHERE vec_id % 100 = 0
    ), scored AS (
      SELECT anchor_id, vec_id AS cand_id,
             round(list_sum(list_transform(generate_series(1, len(a_e)),
                                           i -> a_e[i] * e[i]))
                   / sqrt(a_nrm * nrm), 4) AS sim,
             md5(CAST(anchor_id AS VARCHAR) || ':'
                 || CAST(vec_id AS VARCHAR)) AS h
      FROM anchors JOIN d ON vec_id <> anchor_id
    ), pos AS (
      SELECT anchor_id, cand_id AS positive_id, sim AS pos_sim
      FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                         ORDER BY sim DESC, cand_id) AS rn
            FROM scored) WHERE rn = 1
    ), neg AS (
      SELECT anchor_id, cand_id AS negative_id, sim AS neg_sim
      FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                         ORDER BY h, cand_id) AS rn
            FROM scored WHERE sim < 0.1) WHERE rn = 1
    )
    SELECT p.anchor_id, p.positive_id, p.pos_sim,
           n.negative_id, n.neg_sim
    FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    """,
)
def llm_anchor_negative_triplets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive-training triplet mining: for each anchor vector, one
    POSITIVE (its nearest neighbour) and one pseudo-random NEGATIVE
    drawn deterministically (md5 order) from the candidates below a
    similarity ceiling — the (anchor, positive, negative) rows an
    embedding-model trainer consumes.

    Scale shape: anchors are ~1% of the corpus and BROADCAST against
    it (map-only scoring, same discipline as llm_sim_topk_cosine);
    both the positive top-1 and the hash-ordered negative pick are
    windows partitioned by anchor. Deterministic end to end: cosine
    fold order fixed, ties broken on ids, 'randomness' is md5 — a
    reproducible corpus build, not a sampled one. At 100 TB the
    negative pool would come from the LSH buckets' complement instead
    of a full scan (anchor count, not corpus size, bounds the
    broadcast)."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    anchors = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_e"),
        F.col("nrm").alias("a_nrm"),
    )
    sim = F.round(
        _dot(F.col("a_e"), F.col("embedding"))
        / F.sqrt(F.col("a_nrm") * F.col("nrm")),
        4,
    )
    scored = (
        d.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("cand_id"),
            sim.alias("sim"),
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("anchor_id").cast("string"),
                    F.col("vec_id").cast("string"),
                )
            ).alias("h"),
        )
    )
    wp = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    pos = (
        scored.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("positive_id"),
            F.col("sim").alias("pos_sim"),
        )
    )
    wn = Window.partitionBy("anchor_id").orderBy("h", "cand_id")
    neg = (
        scored.where(F.col("sim") < 0.1)
        .withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("negative_id"),
            F.col("sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, "anchor_id")


@register(
    "llm_dedup_containment",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), chunks AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(tk[g.i:g.i+3], ' ')) AS h
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(tk) - 3)) AS i) g
    ), freq AS (
      SELECT h, CAST(count(*) AS BIGINT) AS df FROM chunks GROUP BY h
    ), informative AS (
      SELECT c.doc_id, c.h FROM chunks c JOIN freq f ON c.h = f.h
      WHERE f.df <= 25
    ), doc_sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
      FROM informative GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM informative a JOIN informative b
        ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.doc_a, s.doc_b, s.n_shared,
           floor(s.n_shared * 1000000.0
                 / least(x.n_chunks, y.n_chunks)) / 1000000 AS containment
    FROM shared s
    JOIN doc_sizes x ON s.doc_a = x.doc_id
    JOIN doc_sizes y ON s.doc_b = y.doc_id
    WHERE s.n_shared * 2 >= least(x.n_chunks, y.n_chunks)
    """,
)
def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document CONTAINMENT dedup: sliding 4-word chunk hashes,
    pairs of documents sharing ≥50% of the smaller document's chunks —
    the signal that catches partial-overlap duplication (quotes,
    mirrored sections, wrapped reposts) that whole-document hashing and
    even MinHash-over-the-full-text miss.

    The load-bearing scale guard is the BOILERPLATE EXCLUSION: a chunk
    appearing in more than ``df_cap`` documents (site chrome, license
    headers) is dropped BEFORE the self-join — ubiquitous chunks are
    precisely the ones that would turn the hash join into an O(df²)
    hot-key blowup, and they carry no dedup signal. What remains
    joins on rare hashes (bounded fan-out by construction), reduces to
    per-pair counts, and normalizes by the smaller doc's chunk count.
    Integer counts + floor-truncated ratio → engine-exact."""
    docs = _spread(load(spark, sf_dir, "documents"))
    # chunk = 4-word sliding shingle (the corpus is a word stream with
    # no sentence punctuation; a real corpus would chunk on sentences
    # or fixed token windows the same way)
    chunks = (
        docs.select("doc_id", _tokens().alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    # sequence(1, 0) DESCENDS in Spark — emit an empty
                    # shingle list for docs shorter than the window
                    F.when(
                        F.size("tk") >= 4,
                        F.sequence(F.lit(1), F.size("tk") - 3),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("tk"), i, 4)
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.md5("s").alias("h"))
        .distinct()
        # r12 (census + plan audit): this subtree (tokenize + shingle
        # explode + md5 + distinct shuffle) was re-planned per reference
        # — freq, the df-cap join, doc_sizes and both self-join sides
        # re-scanned documents 8 times in the physical plan. r13: the
        # frame is doc×distinct-shingle grain — CORPUS-PROPORTIONAL,
        # not bounded — so the pin is size-gated: one pinned evaluation
        # while documents is small, recompute at scale. Same rows,
        # integer/hash arithmetic → bit-identical output either way.
        .transform(
            pin, approx_input_bytes=input_size_bytes(sf_dir, "documents")
        )
    )
    freq = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    informative = chunks.join(
        freq.where(F.col("df") <= 25).select("h"), "h"
    ).transform(pin, approx_input_bytes=input_size_bytes(sf_dir, "documents"))
    doc_sizes = informative.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    a = informative.select(F.col("doc_id").alias("doc_a"), "h")
    b = informative.select(F.col("doc_id").alias("doc_b"), "h")
    shared = (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    x = doc_sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("na")
    )
    y = doc_sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("nb")
    )
    small = F.least(F.col("na"), F.col("nb"))
    return (
        shared.join(x, "doc_a")
        .join(y, "doc_b")
        .where(F.col("n_shared") * 2 >= small)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (F.floor(F.col("n_shared") * 1000000.0 / small) / 1000000).alias(
                "containment"
            ),
        )
    )


@register(
    "llm_quality_composite_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '')
                 AS toks
      FROM documents
    ), sig AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM scored
    ), flagged AS (
      SELECT doc_id, n_tokens, n_unique,
             n_tokens < 30 AS too_short,
             n_tokens > 0
               AND n_unique * 5 < n_tokens AS too_repetitive
      FROM sig
    )
    SELECT CASE WHEN too_short THEN 'reject:too_short'
                WHEN too_repetitive THEN 'reject:too_repetitive'
                ELSE 'keep' END AS disposition,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT) AS sample_doc
    FROM flagged
    GROUP BY 1
    """,
)
def llm_quality_composite_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation funnel's decision layer: every document gets a
    DISPOSITION (keep, or the FIRST failing rule as a reject reason) —
    minimum length, then lexical-diversity floor (unique/total token
    ratio ≥ 1/5, the degenerate-repetition guard). The per-reason
    census with token totals is the report a corpus build publishes
    next to its dataset card: what was dropped, why, and how many
    tokens it cost.

    Scale shape: every signal is a scan-stage array expression over
    the one tokenization (no signal re-tokenizes); the funnel is a
    CASE ladder (first-match-wins keeps reasons disjoint, so the
    census partitions the corpus exactly); one tiny groupBy on the
    disposition label. Adding a rule = adding a CASE branch, never a
    pass. Thresholds here are demo-tuned to the synthetic corpus; the
    shape is what a production filter (Gopher rules, C4 filters) runs
    at 100 TB."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()
    sig = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
    )
    flagged = sig.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") < 30).alias("too_short"),
        (
            (F.col("n_tokens") > 0)
            & (F.col("n_unique") * 5 < F.col("n_tokens"))
        ).alias("too_repetitive"),
    )
    disposition = (
        F.when(F.col("too_short"), "reject:too_short")
        .when(F.col("too_repetitive"), "reject:too_repetitive")
        .otherwise("keep")
    )
    return flagged.groupBy(disposition.alias("disposition")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("sample_doc"),
    )


@register(
    "llm_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(tk[g.i:g.i+3], ' ')) AS h
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(tk) - 3)) AS i) g
    ), first_seen AS (
      SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           floor(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 * 1000000.0 / count(*)) / 1000000 AS novelty
    FROM sh s JOIN first_seen f ON s.h = f.h
    GROUP BY s.doc_id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY against the corpus processed in
    doc_id order: the fraction of a document's distinct 4-grams whose
    FIRST occurrence is this document — low novelty flags near-copies
    and templated boilerplate; the curation metric behind 'is this doc
    adding anything'.

    Scale shape: first-occurrence attribution is one min-aggregate on
    the shingle hash (map-combinable — never a sort or window over the
    shingle stream), joined back on the same hash key, then a per-doc
    reduce. Integer counts, floor-truncated exact division. At 100 TB
    the first_seen table IS the dedup index the incremental-batch op
    probes."""
    docs = _spread(load(spark, sf_dir, "documents"))
    sh = (
        docs.select("doc_id", _tokens().alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.when(
                        F.size("tk") >= 4,
                        F.sequence(F.lit(1), F.size("tk") - 3),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, 4)),
                )
            ).alias("s"),
        )
        .select("doc_id", F.md5("s").alias("h"))
        .distinct()
    )
    first_seen = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first_seen, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            novel.alias("n_novel"),
            (F.floor(novel * 1000000.0 / F.count(F.lit(1))) / 1000000).alias(
                "novelty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# round 4: URL canonicalization dedup + audio chunk plumbing
# ---------------------------------------------------------------------------


@register(
    "llm_url_canonicalize_dedup",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'HTTPS://' || upper(source) || '.Example.COM:443/' || lang ||
             '/page-' || CAST(doc_id % 40 AS VARCHAR) ||
             '?utm_source=feed&utm_campaign=c' ||
             CAST(doc_id % 3 AS VARCHAR) || '&id=' ||
             CAST(doc_id % 40 AS VARCHAR) || '#frag' AS raw_url
      FROM documents
    ), canon AS (
      SELECT doc_id, raw_url,
             lower(regexp_extract(raw_url, '^([a-zA-Z]+)://', 1)) || '://' ||
             lower(regexp_replace(
                 regexp_extract(raw_url, '://([^/?#]+)', 1),
                 ':(443|80)$', '')) ||
             regexp_replace(
                 regexp_extract(raw_url, '://[^/?#]+([^?#]*)', 1),
                 '/$', '') ||
             CASE WHEN regexp_replace(regexp_replace(
                      coalesce(regexp_extract(raw_url, '\\?([^#]*)', 1), ''),
                      '(^|&)utm_[^&]*', '', 'g'), '^&', '') <> ''
                  THEN '?' || regexp_replace(regexp_replace(
                      regexp_extract(raw_url, '\\?([^#]*)', 1),
                      '(^|&)utm_[^&]*', '', 'g'), '^&', '')
                  ELSE '' END AS canon_url
      FROM urls
    )
    SELECT canon_url,
           CAST(count(*) AS BIGINT) AS n_dupes,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc
    FROM canon
    GROUP BY canon_url
    """,
)
def llm_url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-style URL canonicalization + dedup: scheme/host lowercased,
    default ports (:80/:443) stripped, trailing path slash stripped,
    ``utm_*`` tracking params removed (other params kept), fragment
    dropped — then group by the canonical form keeping the lowest
    doc_id as the canonical fetch.  The fixture has no URL column, so
    raw URLs are synthesized DETERMINISTICALLY from (source, lang,
    doc_id) with deliberate case/port/tracking noise; both engines
    build and canonicalize the same strings, so the oracle is exact.

    Scale shape: canonicalization is pure scan-stage string work (zero
    Python); the only exchange is the groupBy on the canonical URL —
    the same single-shuffle digest-dedup shape as llm_dedup_exact_text,
    and the canonical key is what you'd range-partition a 100 TB crawl
    frontier on."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/page-"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?utm_source=feed&utm_campaign=c"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&id="),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("#frag"),
    )
    scheme = F.lower(F.regexp_extract(F.col("raw_url"), r"^([a-zA-Z]+)://", 1))
    host = F.lower(
        F.regexp_replace(
            F.regexp_extract(F.col("raw_url"), r"://([^/?#]+)", 1),
            r":(443|80)$",
            "",
        )
    )
    path = F.regexp_replace(
        F.regexp_extract(F.col("raw_url"), r"://[^/?#]+([^?#]*)", 1), r"/$", ""
    )
    query_kept = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(F.col("raw_url"), r"\?([^#]*)", 1),
            r"(^|&)utm_[^&]*",
            "",
        ),
        r"^&",
        "",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query_kept != "", F.concat(F.lit("?"), query_kept)).otherwise(
            F.lit("")
        ),
    )
    return (
        docs.select("doc_id", raw.alias("raw_url"))
        .select("doc_id", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )


@register(
    "llm_multimodal_audio_chunks",
    oracle="""
    WITH pcm AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), c -> ascii(c)) AS samples
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(unnest(range(0, (len(samples) + 399) // 400)) AS BIGINT)
                 AS chunk_id,
             samples
      FROM pcm
    )
    SELECT doc_id, chunk_id,
           CAST(chunk_id * 400 AS BIGINT) AS start_sample,
           CAST(least(400, len(samples) - chunk_id * 400) AS BIGINT)
               AS n_samples,
           CAST(list_aggregate(
               samples[chunk_id * 400 + 1 : chunk_id * 400 + 400], 'sum')
               AS BIGINT) AS amp_sum,
           CAST(list_aggregate(
               samples[chunk_id * 400 + 1 : chunk_id * 400 + 400], 'max')
               AS BIGINT) AS amp_peak
    FROM chunks
    """,
)
def llm_multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio ingestion plumbing: fixed-size frame chunking of an opaque
    payload (here the utf-8 bytes of ``text`` standing in for PCM
    samples, per the survey's stub policy — a real build swaps the
    byte source for a soundfile decode behind the same signature) into
    400-sample chunks with per-chunk start offset, length, amplitude
    sum and peak — the windowed feature pass every audio pipeline runs
    before VAD / transcription.

    All integer byte math, so the oracle recomputes it exactly with
    ascii()+list slices.  Scale shape: chunking is a narrow row
    multiplier in the scan stage (posexplode over a computed frame
    index — no shuffle, no Python); per-chunk reductions are
    higher-order aggregates over bounded 400-element slices, and only
    the ~24 B/chunk metadata ever leaves the stage.  Chunk provenance
    (doc_id, start_sample) supports random access back into the blob
    store exactly like llm_doc_chunking's (doc_id, chunk_id)."""
    docs = load(spark, sf_dir, "documents")
    # utf-8 bytes as int samples; fixture text is ascii so split-on-''
    # chars == bytes on both engines
    base = docs.select(
        "doc_id",
        F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c)).alias(
            "samples"
        ),
    )
    n_chunks = F.ceil(F.size("samples") / F.lit(400)).cast("int")
    chunked = base.select(
        "doc_id", "samples", F.posexplode(F.sequence(F.lit(1), n_chunks))
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("chunk_id"),
        F.slice(F.col("samples"), F.col("pos") * 400 + 1, 400).alias("frame"),
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * 400).alias("start_sample"),
        F.size("frame").cast("bigint").alias("n_samples"),
        F.aggregate(
            "frame", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("amp_sum"),
        F.aggregate(
            "frame",
            F.lit(0).cast("bigint"),
            lambda a, x: F.greatest(a, x.cast("bigint")),
        ).alias("amp_peak"),
    )


@register(
    "llm_text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
      FROM documents
    ), hist AS (
      -- ch <> '': DuckDB's split of the EMPTY string yields [''],
      -- which must not count as a character (Spark filters it)
      SELECT doc_id, ch, count(*) AS cnt FROM chars
      WHERE ch <> '' GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, sum(cnt) AS n FROM hist GROUP BY 1
    )
    SELECT h.doc_id,
           round(-sum(CAST(round((h.cnt / t.n) * (ln(h.cnt / t.n) / ln(2))
                                 * 1000000) AS BIGINT)) / 1000000.0,
                 3) AS entropy_bits,
           CAST(count(*) AS BIGINT) AS n_distinct_chars
    FROM hist h JOIN tot t USING (doc_id)
    GROUP BY h.doc_id
    """,
)
def llm_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/boilerplate filter (random base64 blobs score high,
    repeated-template spam scores low) in LLM corpus curation.

    Scale design: the whole computation is SCAN-STAGE higher-order
    functions — char histogram via array_distinct + per-char filter
    counts (the alphabet is a small constant, so the per-doc cost is
    O(|alphabet|·len), all inside WholeStageCodegen) and the entropy
    fold via ``aggregate``. ZERO shuffles at any corpus size, unlike
    the explode→groupBy formulation the oracle uses (exchange-free vs
    two exchanges — the 100 TB win). Determinism (G2): each p·log2(p)
    term is quantized to integer micro-bits before the order-dependent
    sum; log2 is computed as ln/ln(2) on BOTH engines so the libm calls
    pair up."""
    docs = load(spark, sf_dir, "documents")
    chars = F.filter(F.split(F.lower(F.col("text")), ""), lambda c: c != "")
    n = F.size(chars).cast("double")

    def term(c):
        p = F.size(F.filter(chars, lambda x: x == c)) / n
        return F.round(p * F.log(2.0, p) * 1_000_000, 0).cast("long")

    terms = F.transform(F.array_distinct(chars), term)
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    # empty/NULL docs have no character distribution — dropped, exactly
    # as the oracle's unnest-of-nothing drops them (entropy of an empty
    # message is undefined, not zero)
    return docs.where(F.size(chars) > 0).select(
        "doc_id",
        F.round(-total / 1_000_000.0, 3).alias("entropy_bits"),
        F.size(F.array_distinct(chars)).cast("long").alias("n_distinct_chars"),
    )


@register(
    "llm_cross_source_overlap",
    oracle="""
    WITH g AS (
      SELECT DISTINCT source,
             md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3]))
               AS gh
      FROM (SELECT source,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks,
                   unnest(generate_series(
                       1, len(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) - 3)) AS i
            FROM documents)
    ), gk AS (
      SELECT source, gh FROM (
        SELECT source, gh, count(*) OVER (PARTITION BY gh) AS n_src FROM g
      ) WHERE n_src <= 15
    ), sz AS (
      SELECT source, count(*) AS n FROM gk GROUP BY source
    ), p AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS shared
      FROM gk a JOIN gk b ON a.gh = b.gh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.src_a, p.src_b, p.shared,
           round(p.shared / (x.n + y.n - p.shared), 6) AS jaccard
    FROM p JOIN sz x ON p.src_a = x.source
           JOIN sz y ON p.src_b = y.source
    """,
)
def llm_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content overlap (syndication / shared-boilerplate
    detection): per source pair, how many distinct 4-gram shingles they
    share and the Jaccard similarity of their shingle sets — the
    corpus-level diagnostic that tells a curation team which crawls
    duplicate each other before doc-level dedup even runs.

    Scale design: shingles reduce to md5 digests in the scan stage
    (text never shuffles); (source, digest) is deduped in ONE digest
    shuffle whose exchange is REUSED by the df-cap window, the
    per-source sizes and the pair self-join. The df-cap (digests in
    >15 sources dropped) is the boilerplate/hot-key guard: it bounds
    every digest's contribution to the self-join at (15 choose 2)
    pairs, so the join output is O(#digests × 105), never quadratic in
    corpus size. Output cardinality is bounded by (sources choose 2)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()
    grams = F.when(
        F.size(toks) >= 4,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 3),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, F.lit(4)))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select("source", F.explode(grams).alias("gh")).distinct()
    gk = (
        g.withColumn("n_src", F.count(F.lit(1)).over(Window.partitionBy("gh")))
        .filter(F.col("n_src") <= 15)
        .drop("n_src")
        # r12 (census + plan audit): the df-capped (source, digest)
        # frame is read by the size aggregate and BOTH self-join sides;
        # Catalyst re-planned the whole shingle pipeline per reference
        # (4 documents scans in the physical plan, against this
        # docstring's one-shuffle claim). Lazy localCheckpoint pins one
        # evaluation of the narrow digest frame — bit-identical rows.
        .transform(
            pin, approx_input_bytes=input_size_bytes(sf_dir, "documents")
        )
    )
    sz = gk.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = gk.alias("a"), gk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    x = sz.alias("x")
    y = sz.alias("y")
    return (
        pairs.join(x, F.col("src_a") == F.col("x.source"))
        .join(y, F.col("src_b") == F.col("y.source"))
        .select(
            "src_a",
            "src_b",
            "shared",
            F.round(
                F.col("shared") / (F.col("x.n") + F.col("y.n") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )


@register(
    "llm_bigram_lm",
    oracle="""
    WITH pairs AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks,
                   unnest(generate_series(
                       1, len(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) - 1)) AS i
            FROM documents)
    ), counts AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
    )
    SELECT w1, w2, n,
           round(n / sum(n) OVER (PARTITION BY w1), 6) AS cond_p
    FROM counts
    """,
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model training table: count(w1,w2) and the
    conditional probability P(w2|w1) — the n-gram LM estimation step
    behind perplexity filtering (llm_text_perplexity_proxy consumes a
    unigram version of exactly this table).

    Scale design: bigrams explode in the scan stage; ONE hash shuffle
    on (w1,w2) with map-side combine collapses the corpus stream to
    vocab² cardinality, and the P(w2|w1) normalization window runs
    over those vocab²-bounded rows partitioned by w1 — corpus size
    only affects the count values, never the post-aggregate row count.
    The conditional probability is an exact integer/integer division,
    bit-identical cross-engine (G2)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    counts = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("w1")
    return counts.select(
        "w1",
        "w2",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("cond_p"),
    )


@register(
    "llm_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS token
      FROM documents
    ), counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    )
    SELECT CAST(row_number() OVER w AS BIGINT) AS rank,
           token, cnt,
           round(sum(cnt) OVER (ORDER BY cnt DESC, token
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)
                 / sum(cnt) OVER (), 6) AS cum_share
    FROM counts
    WINDOW w AS (ORDER BY cnt DESC, token)
    """,
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: tokens ranked by frequency with the
    cumulative share of all corpus tokens they cover — the analysis
    that sizes a tokenizer vocabulary ("the top-32k types cover 99.85%
    of the stream") and exposes the Zipf tail.

    Scale design: the corpus-sized work is ONE token-count hash
    aggregate with map-side combine; the ranking/cumulative windows
    then run over VOCAB-cardinality rows (sublinear in corpus size —
    Heaps' law), so the single-partition global window is bounded by
    the type inventory, not the token stream. Ties rank
    deterministically (count desc, token asc); cumulative sums are
    integer-exact, and the share is a single integer/integer division
    (G2)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "token")
    cum = Window.orderBy(F.col("cnt").desc(), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    return counts.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "cnt",
        F.round(F.sum("cnt").over(cum) / F.sum("cnt").over(tot), 6).alias(
            "cum_share"
        ),
    )


@register(
    "llm_safety_keyword_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN ('slow', 'big'))) AS n_latency,
             len(list_filter(toks, t -> t = 'dup')) AS n_dup
      FROM (SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents)
    )
    SELECT lang,
           CASE WHEN n_dup > 0 THEN 'flag_dup'
                WHEN n_latency >= 0.10 * n_tokens THEN 'flag_latency'
                ELSE 'keep' END AS verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM scored
    GROUP BY 1, 2
    """,
)
def llm_safety_keyword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist / safety-keyword screening — the category-keyword pass
    every corpus runs before training (NSFW/violence/PII term lists in
    production; a vocabulary-appropriate stand-in list here). Each doc
    is scored against per-category term lists in ONE scan-stage pass
    (array_contains-filter counts over the token array — the list
    lives in the closure, broadcast-free because it is a literal), and
    a first-match-wins CASE ladder yields disjoint verdicts, so the
    census is one tiny (lang × verdict) aggregate. Adding a category
    adds a filter expression, never a pass over the corpus — the
    property that matters when the real blocklists hold thousands of
    terms (swap the literal array for a broadcast join at that size)."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    latency_terms = F.array(F.lit("slow"), F.lit("big"))
    n_tokens = F.size(toks)
    n_latency = F.size(F.filter(toks, lambda t: F.array_contains(latency_terms, t)))
    n_dup = F.size(F.filter(toks, lambda t: t == "dup"))
    verdict = (
        F.when(n_dup > 0, "flag_dup")
        .when(n_latency >= 0.10 * n_tokens, "flag_latency")
        .otherwise("keep")
    )
    return (
        docs.select("lang", verdict.alias("verdict"), n_tokens.alias("nt"))
        .groupBy("lang", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
        )
    )


@register(
    "llm_winnowing_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(len(hashes) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(
             list_transform(generate_series(1, len(hashes) - 4),
                            i -> list_min(hashes[i:i+4]))
           )) AS BIGINT) AS n_fingerprints,
           list_min(hashes) AS fp_min,
           round(len(list_distinct(
             list_transform(generate_series(1, len(hashes) - 4),
                            i -> list_min(hashes[i:i+4]))
           )) / (len(hashes) - 4), 6) AS density
    FROM (
      SELECT doc_id,
             list_transform(generate_series(1, len(toks) - 3),
                i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                                   toks[i+3]))) AS hashes
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents)
    )
    WHERE len(hashes) >= 5
    """,
)
def llm_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (the MOSS algorithm: Schleimer,
    Wilkerson & Aiken, SIGMOD 2003): slide a window of w=5 consecutive
    4-gram hashes and keep each window's MINIMUM — guaranteeing every
    match of length ≥ w+3 tokens shares a fingerprint, at ~2/(w+1)
    selection density. This is the position-aware upgrade of the
    bottom-k sketch in llm_doc_fingerprint: local minima cover the
    whole document, not just its globally smallest hashes.

    Scale design: the ENTIRE selection — shingle hashing, windowed
    minima, dedup, density — runs as scan-stage higher-order array
    functions; ZERO exchanges at any corpus size (the oracle's
    generate_series+list_min form mirrors it relationally). md5 hex
    strings compare lexicographically identically in both engines, so
    the selected minima are bit-identical (G3); density is
    integer/integer division (G2)."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()
    # filter BEFORE building the shingle array: a doc under 8 tokens
    # can't produce the >=5 hashes the window needs, and an unguarded
    # sequence(1, size-3) DESCENDS for short docs, driving slice(.., 0,
    # 4) into an error (hostile-input sweep). Also pushes the length
    # test into the scan stage.
    hashes = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 3),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, F.lit(4)))),
    )
    docs = (
        docs.filter(F.size(toks) >= 8)
        .select("doc_id", hashes.alias("hashes"))
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hashes") - 4),
            lambda i: F.array_min(F.slice(F.col("hashes"), i, F.lit(5))),
        )
    )
    return docs.select(
        "doc_id",
        F.size("hashes").cast("long").alias("n_grams"),
        F.size(fps).cast("long").alias("n_fingerprints"),
        F.array_min("hashes").alias("fp_min"),
        F.round(F.size(fps) / (F.size("hashes") - 4), 6).alias("density"),
    )


@register(
    "llm_length_histogram",
    oracle="""
    WITH lens AS (
      SELECT CAST(floor(log2(len(list_filter(string_split(lower(text), ' '),
                                             t -> t <> '')))) AS BIGINT)
               AS log2_bucket,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), t -> t <> '')) > 0
    )
    SELECT log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM lens
    GROUP BY log2_bucket
    """,
)
def llm_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in log2 buckets — the curation
    diagnostic behind truncation-limit and packing decisions (token
    budgets follow a power law; the linear histogram agg_histogram_bins
    runs hides the tail this one exposes). floor(log2(n)) of an
    INTEGER token count is engine-exact (log2 of an exact power-of-two
    boundary value is exact in both libms, and counts between
    boundaries have slack >> 1 ulp), so the bucketing is deterministic
    without quantization. Scan-stage tokenize + ONE tiny hash
    aggregate over ≤64 bucket rows."""
    docs = _spread(load(spark, sf_dir, "documents"))
    n = F.size(_tokens())
    lens = docs.select(
        F.floor(F.log2(n)).alias("log2_bucket"),
        n.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    return lens.groupBy("log2_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


@register(
    "pipeline_corpus_curation",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, text,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, text,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             len(list_distinct(tk)) / len(tk) AS uniq_ratio
      FROM toks WHERE len(tk) > 0
    ), quality AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 20 AND 1000 AND uniq_ratio >= 0.3
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ), sampled AS (
      SELECT * FROM deduped
      WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                 AS BIGINT) < 52429
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM sampled
    GROUP BY lang
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline — the composition proof that the
    engine's LLM operators fuse into one plan the way a real corpus
    build runs them: tokenize → quality gate (length window + lexical
    diversity) → exact dedup (keep-lowest-doc_id per content hash) →
    deterministic 80% hash sample → per-language census. One scan
    stage carries tokenize+quality+sample expressions; the ONLY
    corpus-sized exchange is the dedup's content-hash shuffle (text
    itself never shuffles beyond it); the census aggregate is
    lang-cardinality. The md5-prefix sample is the same
    seed-free reproducible device as llm_sample_stratified_hash —
    re-running the pipeline on the same corpus yields byte-identical
    training data, the property curation teams audit against."""
    docs = _spread(load(spark, sf_dir, "documents"))
    tk = _tokens()
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(tk).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(tk)) / F.size(tk)).alias("uniq_ratio"),
    ).filter(F.col("n_tokens") > 0)
    quality = scored.filter(
        F.col("n_tokens").between(20, 1000) & (F.col("uniq_ratio") >= 0.3)
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    deduped = quality.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    sampled = deduped.filter(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("long")
        < 52429  # 0.8 * 65536
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register("llm_sim_topk_cosine_local_prune", oracle=_COSINE_ORACLE)
def llm_sim_topk_cosine_local_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine — the SHUFFLE-MINIMIZED form of
    llm_sim_topk_cosine (same oracle, so the driver proves them
    equal): before the per-query ranking window, a mapInPandas pass
    keeps only each PHYSICAL PARTITION's local top-5 per query, so the
    exchange feeding the global window carries ≤ k·|queries| rows PER
    PARTITION instead of the full |queries|×|corpus| score stream. At
    100 TB that is the difference between shuffling the whole scored
    cross space and shuffling a few thousand rows. Correctness of the
    prune: any global top-5 row has at most 4 rows ranked above it
    ANYWHERE, hence at most 4 in its own partition — local top-5 can
    never drop it. Local and global ranking share the identical
    (rounded sim desc, cand_id asc) order (G2/G3), and the rolling
    per-batch compaction keeps Python memory at O(k·|queries|).

    Measured honestly at sf0.1 (bench, same session): 0.51 s vs the
    plain window's 0.31 s — below the shuffle-bound regime the Arrow
    boundary costs more than the pruned exchange saves, so the plain
    form stays the bench headline and THIS form is the one you deploy
    when the scored stream (|queries|×|corpus|) no longer fits an
    exchange."""
    import pandas as _pd

    emb = _spread(_sim_embeddings(spark, sf_dir))
    nrm = _dot(F.col("embedding"), F.col("embedding"))
    d = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    q = d.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_e"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = d.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    scored = joined.select(
        "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
    )

    def local_topk(batches):
        acc = None
        for pdf in batches:
            acc = pdf if acc is None else _pd.concat((acc, pdf))
            acc = (
                acc.sort_values(
                    ["query_id", "sim", "cand_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(5)
            )
        if acc is not None and len(acc):
            yield acc

    pruned = scored.mapInPandas(
        local_topk, schema="query_id long, cand_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "llm_skipgram_pairs",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), p AS (
      SELECT tk[i] AS center, tk[i+1] AS context
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS g(i)
      UNION ALL
      SELECT tk[i+1], tk[i]
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS g(i)
      UNION ALL
      SELECT tk[i], tk[i+2]
      FROM toks, unnest(generate_series(1, len(tk) - 2)) AS g(i)
      UNION ALL
      SELECT tk[i+2], tk[i]
      FROM toks, unnest(generate_series(1, len(tk) - 2)) AS g(i)
    )
    SELECT center, context, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY center, context
    """,
)
def llm_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) co-occurrence counts with a ±2
    window — the word2vec / GloVe training-pair extraction step. Pair
    construction is pure scan-stage array slicing (one zipped
    transform per offset-direction, concatenated and exploded — no
    self-join of positions); the corpus then collapses in ONE
    (center, context) hash aggregate with map-side combine, so the
    shuffle is vocab²-bounded like llm_bigram_lm's. Window radius is a
    code constant: radius R costs 2R scan-stage transforms, never an
    extra pass or exchange."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()

    def off_pairs(off):
        return F.when(
            F.size(toks) >= off + 1,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - off),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("c"),
                    F.element_at(toks, i + off).alias("x"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<c:string,x:string>>"))

    def rev(col):
        return F.transform(
            col,
            lambda s: F.struct(
                s.getField("x").alias("c"), s.getField("c").alias("x")
            ),
        )

    p1, p2 = off_pairs(1), off_pairs(2)
    pairs = F.concat(p1, rev(p1), p2, rev(p2))
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.c").alias("center"), F.col("p.x").alias("context"))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "llm_collocation_pmi",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), pairs AS (
      SELECT tk[i] AS w1, tk[i+1] AS w2
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS g(i)
    ), pc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM pairs GROUP BY w1, w2
    ), uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
      FROM (SELECT unnest(tk) AS tok FROM toks) GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(n_tok) AS BIGINT) AS n_total FROM uni
    )
    SELECT p.w1, p.w2, p.n_pair,
           round(ln((p.n_pair * t.n_total)
                    / (CAST(a.n_tok AS DOUBLE) * b.n_tok)), 6) AS pmi
    FROM pc p
    JOIN uni a ON p.w1 = a.tok
    JOIN uni b ON p.w2 = b.tok
    CROSS JOIN tot t
    WHERE p.n_pair >= 5
    """,
)
def llm_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent-word pairs — the
    collocation detector ("new york" ≫ chance) used for phrase-mining
    before tokenizer training. PMI = ln(n_pair·N / (n_w1·n_w2)): the
    argument is an exact integer ratio in doubles, ONE ln per output
    row (no float summation anywhere), so round(...,6) is
    engine-stable without quantization (G2). Shape: bigram + unigram
    hash aggregates (both map-side combinable), two vocab-bounded
    equi-joins, a 1-row corpus-total broadcast, and a min-support
    filter (n≥5) that also keeps the PMI estimate statistically
    meaningful."""
    docs = _spread(load(spark, sf_dir, "documents"))
    toks = _tokens()
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pc = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    # r12 (census + plan audit): this reduced frame is referenced by
    # several downstream branches and was re-planned per reference
    # (repeated corpus scans + re-paid shuffles); the lazy
    # localCheckpoint pins one evaluation — bit-identical rows.
    uni = uni.transform(
        pin, approx_input_bytes=input_size_bytes(sf_dir, "documents")
    )
    tot = uni.agg(F.sum("n_tok").alias("n_total"))
    a = uni.alias("a")
    b = uni.alias("b")
    return (
        pc.join(a, F.col("w1") == F.col("a.tok"))
        .join(b, F.col("w2") == F.col("b.tok"))
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") * F.col("n_total"))
                    / (F.col("a.n_tok").cast("double") * F.col("b.n_tok"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "llm_semdedup_cells",
    oracle="""
    WITH v AS (
      -- mirror _sim_embeddings' admissibility filter: zero-norm
      -- vectors are outside the cosine metric (G11)
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS m
      FROM embeddings
      WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> x * x)) > 0
    ),
    sums AS (
      SELECT label AS cell, CAST(i AS INT) AS i,
             CAST(sum(m[CAST(i AS INT)]) AS BIGINT) AS s
      FROM v, unnest(generate_series(1, 64)) u(i)
      GROUP BY label, i
    ),
    cb AS (SELECT cell, list(s ORDER BY i) AS c FROM sums GROUP BY cell),
    scored AS (
      SELECT v.vec_id, v.m, cb.cell,
             round(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(v.m[CAST(i AS INT)] AS DOUBLE)
                          * CAST(cb.c[CAST(i AS INT)] AS DOUBLE)))
                   / sqrt(list_sum(list_transform(v.m,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                          * list_sum(list_transform(cb.c,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
                   9) AS sim
      FROM v CROSS JOIN cb
    ),
    assign AS (
      SELECT vec_id, m, cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cell) AS rn
      FROM scored
    ),
    mine AS (SELECT vec_id, m, cell FROM assign WHERE rn = 1),
    pairs AS (
      SELECT b.vec_id AS drop_id
      FROM mine a JOIN mine b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(generate_series(1, 64),
                    i -> CAST(a.m[CAST(i AS INT)] AS DOUBLE)
                         * CAST(b.m[CAST(i AS INT)] AS DOUBLE)))
                  / sqrt(list_sum(list_transform(a.m,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                         * list_sum(list_transform(b.m,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
                  4) >= 0.25
    )
    SELECT m.vec_id, CAST(m.cell AS BIGINT) AS cell,
           CASE WHEN d.drop_id IS NOT NULL THEN 'dropped' ELSE 'kept' END
               AS disposition
    FROM mine m
    LEFT JOIN (SELECT DISTINCT drop_id FROM pairs) d
      ON m.vec_id = d.drop_id
    ORDER BY m.vec_id
    """,
)
def llm_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: assign every embedding to its
    nearest CENTROID cell, then near-dup only WITHIN cells (keep-first
    by vec_id; drop any vector with a lower-id cell-mate at cosine
    ≥0.25) — the cluster-then-dedup method that bounds the pair space
    by cell population instead of corpus size (Abbas et al.'s SemDeDup
    recipe, beside the LSH blocking of llm_dedup_embed_cosine).

    Exactness: centroids are per-label SUM vectors of micro-quantized
    integers (cosine is scale-invariant, so the sum vector assigns
    identically to the mean — and integer sums are order-exact across
    engines, unlike float means crossing an exchange). Assignment
    tie-breaks on (round(sim,9) desc, cell); pair sims round at 4dp
    before the threshold like every cosine op here.

    Scale design: the codebook is K×64 integers (broadcast); assignment
    is map-only; the within-cell self-join is the ONLY pair shuffle and
    is equi-keyed on cell — at 100 TB, K grows with the corpus
    (K ≈ √n keeps cells bounded) and the same plan holds. At fixture
    scale the deterministic label-mean codebook stands in for trained
    k-means centroids (llm_embed_kmeans) so the oracle can replicate
    the whole pipeline, blocking included.
    """
    emb = _spread(_sim_embeddings(spark, sf_dir))
    micro = F.transform(
        F.col("embedding"),
        lambda x: F.round(x * 1000000).cast("bigint"),
    )
    v = emb.select("vec_id", "label", micro.alias("m"))
    cb = v.groupBy(F.col("label").alias("cell")).agg(
        F.array(
            *[F.sum(F.col("m")[i]).alias(f"s{i}") for i in range(64)]
        ).alias("c")
    )
    mine = _nearest_cell(v, cb, "vec_id")
    return _semdedup_dispositions(
        mine, pin_input_bytes=input_size_bytes(sf_dir, "embeddings")
    )


def _nearest_cell(v: DataFrame, cb: DataFrame, id_col: str) -> DataFrame:
    """Assign each micro-quantized vector ``(id_col, m)`` in ``v`` to
    its nearest codebook cell ``(cell, c)`` under 9dp-rounded cosine,
    tie-breaking exactly like ``row_number() OVER (ORDER BY sim DESC,
    cell)`` — sim DESC NULLS LAST (a vector that quantizes to all
    zeros, or a zero-sum cell, has NULL micro-grid cosine via
    try_divide ≡ DuckDB's NULL-on-zero-division, G11/G13), cell ASC
    NULLS FIRST. Returns ``(id_col, m, cell)``.

    Optimization r12 (guide §2.1/§3.4): the original form crossJoined
    the K-row broadcast codebook (K× row explosion), shuffled the
    exploded frame by id and ranked with a window. This form folds the
    codebook to ONE broadcast row of K structs and picks the argmax
    with scan-stage higher-order functions — no row explosion, no
    corpus-grain exchange, no window sort — and hoists the two
    loop-invariant norms (dot(m,m) per row, dot(c,c) per cell) out of
    the K-way comparison, so each candidate costs one 64-dot instead
    of three. Arithmetic is bit-identical: the same three dot products
    feed the same round(…, 9) before comparison."""
    cell_t = cb.schema["cell"].dataType.simpleString()
    cells = cb.agg(
        F.array_agg(
            F.struct(
                F.col("cell"),
                F.col("c"),
                _dot(F.col("c"), F.col("c")).alias("cc"),
            )
        ).alias("__cells")
    )
    m = F.col("m")
    scored_arr = F.transform(
        F.col("__cells"),
        lambda x: F.struct(
            F.round(
                F.try_divide(
                    _dot(m, x["c"]), F.sqrt(F.col("__n2") * x["cc"])
                ),
                9,
            ).alias("sim"),
            x["cell"].alias("cell"),
        ),
    )
    init = F.struct(
        F.lit(False).alias("has"),
        F.lit(None).cast("double").alias("sim"),
        F.expr(f"cast(null as {cell_t})").alias("cell"),
    )

    def merge(acc, x):
        beats = (
            ~acc["has"]
            | (x["sim"].isNotNull() & acc["sim"].isNull())
            | (
                x["sim"].isNotNull()
                & acc["sim"].isNotNull()
                & (x["sim"] > acc["sim"])
            )
            | (
                (
                    (x["sim"].isNull() & acc["sim"].isNull())
                    | (x["sim"] == acc["sim"])
                )
                & (
                    (x["cell"].isNull() & acc["cell"].isNotNull())
                    | (x["cell"] < acc["cell"])
                )
            )
        )
        return F.when(
            beats,
            F.struct(
                F.lit(True).alias("has"),
                x["sim"].alias("sim"),
                x["cell"].alias("cell"),
            ),
        ).otherwise(acc)

    best = F.aggregate(scored_arr, init, merge)
    return (
        v.withColumn("__n2", _dot(m, m))
        .crossJoin(F.broadcast(cells))
        .withColumn("__best", best)
        .where(F.col("__best.has"))
        .select(id_col, "m", F.col("__best.cell").alias("cell"))
    )


def _semdedup_dispositions(
    mine: DataFrame, pin_input_bytes: int | None = None
) -> DataFrame:
    """Within-cell keep-first SemDeDup over an assigned corpus
    ``(vec_id, m, cell)`` (``m`` = micro-quantized integer embedding):
    drop any vector with a lower-id cell-mate at 4dp cosine ≥ 0.25.
    Shared by the oracled label-cell key (llm_semdedup_cells) and the
    trained-cell sibling (llm_semdedup_cells_kmeans) so the dedup
    semantics cannot drift between them — only the cell ASSIGNMENT
    differs. The within-cell self-join is the only pair shuffle,
    equi-keyed on cell; pair space is bounded by cell population.

    r12 (census + plan audit): ``mine`` is read by both self-join
    sides AND the final disposition attach — re-planned per reference,
    the assignment pipeline (scan + argmax + codebook aggregate) ran
    3x (6 embeddings scans). Pinning one evaluation of the assigned
    frame is OPT-IN (r13, ADVICE r12): callers that exhibited the
    re-planning problem pass ``pin_input_bytes`` (the bounding input's
    on-disk size) and get the r13 size-gated pin — the frame is
    vector-grain, i.e. corpus-proportional, so at scale the gate falls
    back to recompute; callers that already pinned or stream-adapted
    ``mine`` pass nothing and are not forced into a second
    materialization."""
    if pin_input_bytes is not None:
        mine = pin(mine, approx_input_bytes=pin_input_bytes)
    a = mine.select(
        F.col("cell"), F.col("vec_id").alias("keep_id"), F.col("m").alias("ma")
    )
    b = mine.select(
        F.col("cell"), F.col("vec_id").alias("drop_id"), F.col("m").alias("mb")
    )
    pair_sim = F.round(
        F.try_divide(
            _dot(F.col("ma"), F.col("mb")),
            F.sqrt(
                _dot(F.col("ma"), F.col("ma")) * _dot(F.col("mb"), F.col("mb"))
            ),
        ),
        4,
    )
    dropped = (
        a.join(b, "cell")
        .where(F.col("keep_id") < F.col("drop_id"))
        .where(pair_sim >= 0.25)
        .select("drop_id")
        .distinct()
    )
    return (
        mine.join(dropped, mine.vec_id == dropped.drop_id, "left")
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.when(F.col("drop_id").isNotNull(), "dropped")
            .otherwise("kept")
            .alias("disposition"),
        )
        .orderBy("vec_id")
    )


@register("llm_semdedup_cells_kmeans", tags=("rows-only", "approx"))
def llm_semdedup_cells_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup on TRAINED cells (WAVE13 candidate 4) — the label-free
    sibling of llm_semdedup_cells: cell assignment comes from
    ``_ivf_kmeans_frames`` (each vector's best ``_ivf_train_cells``
    k-means centroid, the SAME shared frame the label-free ANN cascade
    probes, so SemDeDup and similarity search agree on the partition of
    semantic space), and the within-cell keep-first dedup is
    structurally identical via ``_semdedup_dispositions``. This removes
    the last label-derived component from the dedup/ANN stack; the
    label-mean original stays registered and ORACLED (the WAVE9 rule:
    never trade an oracle away silently) — this form is rows-only
    because the trained centroids are an iterative artifact no SQL
    oracle reproduces. Property tests pin a numpy replay of the
    assignment, exact disposition agreement of the dedup half, and the
    measured balance/yield shift vs the labelled cells
    (tests/test_properties.py::test_semdedup_kmeans_*).

    Scale shape: unchanged from the original — K×64-double broadcast
    codebook, map-side assignment, ONE equi-keyed within-cell pair
    shuffle bounded by cell population (K ≈ √n at corpus scale); the
    training cost lives in the cached offline artifact exactly like
    the production recipe (train on a bounded sample, assign the
    corpus map-only)."""
    _, best, _ = _ivf_kmeans_frames(spark, sf_dir)
    if best is None:
        return spark.createDataFrame(
            [], "vec_id bigint, cell bigint, disposition string"
        )
    micro = F.transform(
        F.col("embedding"),
        lambda x: F.round(x * 1000000).cast("bigint"),
    )
    mine = best.select("vec_id", micro.alias("m"), "cell")
    return _semdedup_dispositions(
        mine, pin_input_bytes=input_size_bytes(sf_dir, "embeddings")
    )


def _bpe_merge_pair(syms_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b inside a
    symbol array — the standard BPE apply-merge fold, as a sequential
    higher-order aggregate (order is defined by the fold, so the
    rewrite is deterministic)."""
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


@register("llm_bpe_train_merges", tags=("rows-only", "iterative"))
def llm_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer TRAINING (8 merge rounds) — the full
    loop whose single inner step llm_bpe_merge_step certifies: count
    adjacent symbol pairs weighted by word frequency, adopt the most
    frequent pair (count desc, then lexicographic — deterministic),
    rewrite the vocabulary with the merge, repeat. Output is the
    learned merge table (rank, left, right, pair_count) — the artifact
    a tokenizer ships. Rows-only: the 8-round loop is not
    SQL-expressible; tests/test_properties.py re-trains with a pure
    Python reference BPE on the same word frequencies and requires the
    IDENTICAL merge sequence.

    Scale design: the corpus collapses ONCE to the word-frequency
    table (vocab-bounded); every round touches only vocab rows —
    pair explode + integer-sum aggregate + a ONE-ROW driver hop (the
    adopted merge, the kmeans-codebook discipline) + a map-only fold
    rewrite. An eager localCheckpoint per round keeps lineage flat so
    round 8's plan is as small as round 1's.
    """
    docs = load(spark, sf_dir, "documents").select("text")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    word_freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    vocab = word_freq.select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
        "freq",
    ).localCheckpoint(eager=True)
    return bpe_train(spark, vocab, rounds=8)


def bpe_train(spark: SparkSession, vocab: DataFrame, rounds: int) -> DataFrame:
    """The BPE merge-learning loop over a (syms array<string>, freq
    long) vocabulary table → learned merge table (merge_rank, left,
    right, pair_count). Factored out of llm_bpe_train_merges so
    adversarial vocabularies (exact pair-count ties, overlapping
    self-merges like 'aaaa') can be property-tested directly against
    the pure-Python reference trainer. Tie-break is deterministic:
    count desc, then (left, right) lexicographic asc."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, rounds + 1):
        pairs = (
            vocab.select(
                "freq",
                # guard size < 2: sequence(1, 0) is the DESCENDING
                # [1, 0] in Spark, so an unguarded transform indexes
                # past a fully-merged single-symbol word (caught by the
                # adversarial 'xy' vocabulary in tests/test_properties)
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i - 1] AS a, syms[i] AS b)) "
                        "ELSE CAST(array() AS "
                        "array<struct<a:string,b:string>>) END"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, n = top[0].a, top[0].b, int(top[0].n)
        merges.append((rank, a, b, n))
        vocab = vocab.select(
            _bpe_merge_pair(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


@register(
    "llm_score_calibration_ece",
    oracle="""
    WITH scored AS (
        SELECT CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   * 1000000 // len(string_split(text, ' ')) AS score_ppm,
               CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    binned AS (
        SELECT least(CAST(score_ppm * 10 // 1000001 AS BIGINT), 9) AS bin,
               score_ppm, label
        FROM scored
    ),
    stats AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(label) AS BIGINT) AS n_pos,
               CAST(sum(score_ppm) AS BIGINT) AS score_sum
        FROM binned GROUP BY bin
    )
    SELECT bin, n_docs, n_pos,
           round(CAST(score_sum AS DOUBLE) / n_docs / 1000000, 6)
               AS mean_score,
           round(CAST(n_pos AS DOUBLE) / n_docs, 6) AS observed_rate,
           round(abs(CAST(score_sum AS DOUBLE) / n_docs / 1000000
                     - CAST(n_pos AS DOUBLE) / n_docs), 6) AS calib_gap
    FROM stats
    ORDER BY bin
    """,
)
def llm_score_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) diagram for a quality scorer treated
    as a probability: bucket the lexical-diversity score into 10 fixed
    bins, compare each bin's mean score against the OBSERVED rate of
    the target label (long-document), with the per-bin |gap| whose
    n-weighted sum is the Expected Calibration Error — the standard
    "is this score a probability or just a ranking" eval every
    learned quality filter should publish before its scores gate a
    corpus (the calibration sibling of llm_annotation_kappa's
    agreement and llm_eval_winrate's preference readouts).

    Scale design: scoring and binning are scan-stage integer-ppm
    arithmetic (fixed bin edges — no quantile pass needed); the corpus
    reduces to ≤10 bin rows in one map-combined aggregate; every
    division happens once per OUTPUT row. The fixed-bin choice is what
    makes this a one-pass operator at 100 TB — an equal-mass variant
    would reuse the scale_rank ntile machinery.
    """
    docs = load(spark, sf_dir, "documents").select("text", "n_chars")
    score = F.expr(
        "size(array_distinct(split(text, ' '))) * 1000000L "
        "div size(split(text, ' '))"
    )
    scored = docs.select(
        score.alias("score_ppm"),
        F.when(F.col("n_chars") >= 250, 1).otherwise(0).alias("label"),
    )
    binned = scored.withColumn(
        "bin",
        F.least(
            F.expr("score_ppm * 10 div 1000001"), F.lit(9)
        ).cast("bigint"),
    )
    stats = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("label").alias("n_pos"),
        F.sum("score_ppm").alias("score_sum"),
    )
    mean_score = F.col("score_sum").cast("double") / F.col("n_docs") / 1e6
    observed = F.col("n_pos").cast("double") / F.col("n_docs")
    return (
        stats.select(
            "bin",
            "n_docs",
            "n_pos",
            F.round(mean_score, 6).alias("mean_score"),
            F.round(observed, 6).alias("observed_rate"),
            F.round(F.abs(mean_score - observed), 6).alias("calib_gap"),
        )
        .orderBy("bin")
    )


@register(
    "llm_segment_dedup_global",
    oracle="""
    WITH segged AS (
        SELECT doc_id,
               list_transform(
                 range(CAST(ceil(len(string_split(text, ' ')) / 8.0)
                            AS INT)),
                 i -> array_to_string(
                        string_split(text, ' ')[i*8+1 : i*8+8], ' ')
               ) AS segs
        FROM documents
    ),
    seg_rows AS (
        SELECT doc_id,
               CAST(generate_subscripts(segs, 1) - 1 AS INT) AS seg_idx,
               unnest(segs) AS segment
        FROM segged
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                     PARTITION BY segment ORDER BY doc_id, seg_idx) AS rn
        FROM seg_rows
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN segment END,
                                   ' ' ORDER BY seg_idx), ''))
               AS clean_md5,
           CAST(coalesce(length(string_agg(
                    CASE WHEN rn = 1 THEN segment END,
                    ' ' ORDER BY seg_idx)), 0) AS INT) AS clean_chars
    FROM ranked GROUP BY doc_id
    """,
)
def llm_segment_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-WIDE duplicate-span removal, the C4/RefinedWeb cleaning
    step that whole-doc dedup (llm_dedup_exact_text) misses: boilerplate
    spans repeated across otherwise-distinct pages. Docs split into
    fixed 8-word segments; a segment's FIRST occurrence in global
    (doc_id, seg_idx) order survives, every later occurrence anywhere in
    the corpus is cut; docs are reassembled from their surviving
    segments in order. Output per doc: segment counts kept/removed plus
    md5+length of the cleaned text (the full text at scale — digested
    here to keep oracle cells scalar).

    Scale design: ONE shuffle keyed by segment text (high-cardinality →
    even spread; at 100 TB key by md5(segment) so only 16-byte digests +
    (doc_id, seg_idx) cross the wire, exactly llm_dedup_exact_text's
    trick), then one doc-keyed shuffle to reassemble. The keep-first
    window partitions BY SEGMENT — thousands of tiny partitions, never a
    global sort. Segmentation itself is scan-stage higher-order
    functions (transform/slice over the word array), zero Python.

    Cross-engine: identical segmentation (both engines slice past the
    array end by truncating, so the ragged tail segment matches);
    fully-deduped docs reassemble to '' on both sides (oracle coalesces
    DuckDB's all-NULL string_agg). Ties in the keep-first window are
    impossible — (doc_id, seg_idx) is unique."""
    docs = _spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    W = 8
    words = F.split(F.col("text"), " ")
    nseg = F.ceil(F.size(words) / F.lit(W)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(words, i * W + 1, W), " "),
    )
    seg_rows = docs.select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "segment")
    )
    keep_first = Window.partitionBy("segment").orderBy("doc_id", "seg_idx")
    ranked = seg_rows.withColumn("rn", F.row_number().over(keep_first))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct("seg_idx", "segment"),
                            )
                        )
                    ),
                    lambda x: x.segment,
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            (F.col("n_segments") - F.col("n_kept")).alias("n_removed"),
            F.md5("clean_text").alias("clean_md5"),
            F.length("clean_text").alias("clean_chars"),
        )
    )


_PQ_TRAIN_K = 32  # sub-centroids per subspace (measured: K=32/iters=3
# reaches the IVF-tier recall ceiling on the fixture; K=64 adds nothing)
_PQ_TRAIN_ITERS = 3
#: train-once cache: codebooks are a fixed-size OFFLINE artifact in any
#: production ANN stack (trained once, shipped to every reader), so the
#: in-process cache keyed on the fixture's content fingerprint mirrors
#: deployment rather than hiding cost — retraining per query call would
#: model a system nobody runs. {(path, size, mtime_ns, K, iters): cb}
_PQ_CB_CACHE: dict = {}


def _pq_quantized_subs(spark: SparkSession, sf_dir: str):
    """(d, subs): the similarity-admissible embeddings with norms, and
    their unit-normalized µ-quantized 8×8 subspace rows — the shared
    input of PQ training, corpus coding, and query LUTs. Quantization
    is ``round(x/‖x‖·1e6)`` (integer-valued doubles), so every
    downstream mean/sum has an exact int64 form."""
    emb = _spread(_sim_embeddings(spark, sf_dir))
    d = emb.select(
        "vec_id",
        "label",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )
    eq = d.withColumn(
        "e",
        # nullif(nrm, 0): d is already zero-norm-filtered, but codegen's
        # predicate subexpression elimination can evaluate this division
        # SPECULATIVELY for rows the filter excludes (caught by the r13
        # hostile no-crash sweep on the sibling trainer) — under ANSI
        # that is a job-killing DIVIDE_BY_ZERO. NULL instead of 0 makes
        # the expression total; surviving rows divide by the identical
        # double, so results are bit-unchanged.
        F.expr(
            "transform(embedding, x -> cast(cast(round("
            "cast(x as double) / sqrt(nullif(nrm, cast(0 as double))) "
            "* 1000000) as bigint) as double))"
        ),
    )
    subs = eq.select(
        "vec_id",
        F.posexplode(
            F.expr("transform(sequence(0, 7), s -> slice(e, s * 8 + 1, 8))")
        ).alias("sub", "subvec"),
    )
    return d, subs


def _pq_codebook_lit(codebooks):
    """The 8×K×8 trained codebook as one nested array literal — rides
    into the scan, so assignment is MAP-ONLY (no join, no shuffle).
    Built via a single F.expr parse (r12): the nested-F.lit form made
    ~2048 py4j round-trips ≈ 2 s of driver time per build."""
    return _dbl_array_lit(codebooks)


def _pq_assign_code(codebooks):
    """Column: nearest sub-centroid index for (sub, subvec) under the
    trained codebook — sequential-fold squared L2, first-minimum
    tie-break (array_position returns the FIRST match, so ties go to
    the lowest code, matching the numpy reference's argmin)."""
    cb = _pq_codebook_lit(codebooks)
    dists = F.transform(
        F.element_at(cb, F.col("sub") + 1),
        lambda c: F.aggregate(
            F.zip_with("subvec", c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast(
        "int"
    ).alias("code")


def _pq_train_codebooks(
    spark: SparkSession, sf_dir: str, K: int = _PQ_TRAIN_K,
    iters: int = _PQ_TRAIN_ITERS,
) -> list:
    """K-means-TRAINED per-subspace PQ sub-codebooks (WAVE11
    candidate 3) — the label-free replacement for the label-mean
    codebooks, trained by seeded Lloyd's over the µ-quantized
    unit-normalized corpus. Returns ``codebooks[sub][code] → [8
    floats]`` (8 × K × 8).

    Determinism end to end (the numpy exact-agreement test's
    contract): seeds are the K non-null vec_ids with the smallest
    md5(vec_id) — the same init rule as llm_embed_kmeans — taken in
    hash order, so code k is the k-th smallest hash; assignment is a
    sequential-fold squared L2 with first-minimum tie-break; the
    update is an EXACT int64 mean (quantized values are integers, so
    sum(cast bigint)/count is partition-order free); empty clusters
    keep their previous centroid. Every step is reproducible bit for
    bit from the fixture alone — no labels, no RNG.

    Cost shape: per iteration, assignment is map-only (the codebook
    rides in as a literal) and the update is one map-side-combinable
    aggregate whose reduce output is ≤ 8·K·8 rows — the driver hop is
    codebook-sized, never corpus-sized. At 100 TB training samples a
    bounded subset (codebooks are fixed-size statistics; a few million
    vectors saturate them), the cache below IS the production shape
    (offline artifact), and the corpus-side assignment remains one
    broadcast + argmin pass."""
    fp_path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(fp_path)
        key = (fp_path, st.st_size, st.st_mtime_ns, K, iters)
    except OSError:
        key = (fp_path, None, None, K, iters)
    if key in _PQ_CB_CACHE:
        return _PQ_CB_CACHE[key]

    _, subs = _pq_quantized_subs(spark, sf_dir)
    seeds = (
        subs.where(F.col("vec_id").isNotNull())
        .groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "subvec"))).alias(
                "sv"
            )
        )
        .select(
            "vec_id",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
            F.transform("sv", lambda s: s["subvec"]).alias("sv"),
        )
        .orderBy("h")
        .limit(K)
        .collect()
    )
    seeds = sorted(seeds, key=lambda r: r.h)
    if not seeds:
        _PQ_CB_CACHE[key] = []
        return []
    # code k of subspace s seeds from the k-th smallest hash's subvec;
    # with fewer vectors than K the codebook is just smaller
    codebooks = [
        [[float(x) for x in r.sv[s]] for r in seeds] for s in range(8)
    ]
    for _ in range(iters):
        assigned = subs.select("sub", _pq_assign_code(codebooks), "subvec")
        rows = (
            assigned.select(
                "sub", "code", F.posexplode("subvec").alias("j", "x")
            )
            .groupBy("sub", "code", "j")
            .agg(
                F.sum(F.col("x").cast("bigint")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for r in rows:
            codebooks[r.sub][r.code][r.j] = r.sx / r.n
    _PQ_CB_CACHE[key] = codebooks
    return codebooks


@register("llm_embed_pq_trained_codebook", tags=("rows-only", "approx"))
def llm_embed_pq_trained_codebook(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Census of the k-means-TRAINED PQ codebook (WAVE11 candidate 3):
    per (subspace, code), the assigned population and the EXACT int64
    sums Σx / Σx² of the assigned quantized subvector components —
    8·K rows of merge-order-free integers summarizing the trained
    quantizer that ``llm_sim_ivfpq_topk`` scores with. This is the key
    that de-labels the ANN stack: the codebook is a function of the
    corpus alone (seeded Lloyd's over md5-ordered seeds — see
    ``_pq_train_codebooks``), where the previous label-mean codebook
    needed per-vector labels a raw 100 TB corpus won't have. The
    measured win on the fixture: ADC top-20 capture of the true top-5
    rises 0.28 → 0.52 and end-to-end IVF-PQ recall@5 0.56 → 0.64 (the
    IVF tier's ceiling — the ADC cut now loses nothing).

    Training is iterative → rows-only for the driver; the pytest side
    replays the ENTIRE training in numpy (same seeds, same µ-
    quantization with Spark's HALF_UP rounding, same sequential-fold
    distances, same int64 means) and asserts this census matches it
    integer for integer, plus the capture/recall gains above.

    Scale shape: one map-only assignment pass (codebook literal in the
    scan) + one map-combinable aggregate to 8·K rows; the census is
    codebook-sized output, never corpus-sized."""
    codebooks = _pq_train_codebooks(spark, sf_dir)
    _, subs = _pq_quantized_subs(spark, sf_dir)
    if not codebooks:
        return subs.select(
            F.col("sub").cast("int").alias("sub"),
            F.lit(None).cast("int").alias("code"),
            F.lit(None).cast("bigint").alias("n_assigned"),
            F.lit(None).cast("bigint").alias("sum_x"),
            F.lit(None).cast("bigint").alias("sum_xsq"),
        ).where(F.lit(False))
    assigned = subs.select("sub", _pq_assign_code(codebooks), "subvec")
    return (
        assigned.select(
            "sub",
            "code",
            F.aggregate(
                "subvec",
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x.cast("bigint"),
            ).alias("sx"),
            F.aggregate(
                "subvec",
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + (x * x).cast("bigint"),
            ).alias("sxx"),
        )
        .groupBy("sub", "code")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum("sx").alias("sum_x"),
            F.sum("sxx").alias("sum_xsq"),
        )
        .select(
            F.col("sub").cast("int").alias("sub"),
            "code",
            "n_assigned",
            "sum_x",
            "sum_xsq",
        )
    )


_IVFPQ_ADC_CUT = 64  # ADC survivors per query handed to the exact re-rank
# (the FAISS-style refine factor: recall rises monotonically with the cut
# and reaches the IVF tier exactly when the cut covers the probed pool)


@register("llm_sim_ivfpq_topk", tags=("approx", "rows-only"))
def llm_sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end ANN (WAVE9 candidate 2; PQ half upgraded to
    TRAINED codebooks in WAVE11 candidate 3): the two certified halves
    composed into the standard disk-scale vector index — IVF coarse
    probe (llm_sim_ivf_topk's nearest-centroid cells, nprobe =
    ``_IVF_NPROBE``; shared with the IVF tier BY CONSTRUCTION, because
    the uncapped-refine equivalence test demands the identical
    candidate pool) selects candidate cells, PQ asymmetric-distance
    scoring over ``_pq_train_codebooks``' k-means-trained label-free
    sub-codebooks (+ integer-exact ADC sums) ranks the candidates
    WITHOUT touching raw corpus floats, and the ``_IVFPQ_ADC_CUT``
    best ADC survivors per query get ONE exact cosine re-rank to
    produce the final top-5 — the probe → compressed-scan → re-rank
    cascade every production ANN serving stack runs (FAISS IndexIVFPQ
    with refine).

    Scale shape: candidates are bounded by nprobe cells × cell
    population (never the corpus); the corpus-side payload through the
    scoring join is 8 small int codes per vector (the 64 B → 8 B PQ
    memory story); both codebooks are fixed-size broadcasts (K×64 cell
    centroids, 8×K sub-centroids) and the per-query LUT is bounded by
    the query workload; raw embeddings are touched only for the
    ≤ CUT×queries re-rank rows. The only corpus-grain exchanges are the
    cell equi-join and the per-(query,cand) ADC aggregate, both
    equi-keyed. All ADC sums are integer-exact decimals (merge-order
    free), exact re-rank sims round to 4dp with cand_id tie-break —
    deterministic end to end. Approx by construction → rows-only;
    property-tested in tests/test_properties.py: the reported sims ARE
    the exact cosines (re-rank agreement), recall@5 ≥ the 0.60 floor
    (measured 0.64 at CUT=64 with trained codebooks — EQUAL to the IVF
    tier, i.e. the ADC cut now loses nothing; the old label-mean
    codebooks measured 0.56), and with the cut uncapped the output is
    BIT-IDENTICAL to the IVF tier (same pool, same exact metric, same
    tie-break) — proving the ADC stage is a pure candidate-thinning
    step, never a semantic change."""
    d, subs = _pq_quantized_subs(spark, sf_dir)

    # ---- IVF half: per-label mean centroids, best-cell assignment,
    # query-side nprobe probe (llm_sim_ivf_topk's construction)
    cent = (
        d.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            F.col("label").alias("cell"),
            F.transform("pm", lambda s: s["m"]).alias("c_e"),
        )
        .withColumn("c_nrm", _dot(F.col("c_e"), F.col("c_e")))
    )
    csim = F.round(
        _dot(F.col("embedding"), F.col("c_e"))
        / F.sqrt(F.col("nrm") * F.col("c_nrm")),
        6,
    )
    cell_scored = d.join(F.broadcast(cent)).select(
        "vec_id", "cell", csim.alias("csim")
    )
    best = cell_scored.groupBy("vec_id").agg(
        F.max_by(
            "cell", F.struct(F.col("csim"), (-F.col("cell")).alias("nc"))
        ).alias("cell")
    )
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell")
    )
    qprob = (
        cell_scored.where(F.col("vec_id") % 100 == 0)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("q_id"), "cell")
    )

    # ---- PQ half: k-means-TRAINED 8-subspace sub-codebooks (WAVE11
    # candidate 3 — label-free: _pq_train_codebooks' seeded Lloyd's
    # replaces the old label-mean codebook; measured on the fixture,
    # ADC top-20 capture 0.28 → 0.52 and end-to-end recall@5
    # 0.56 → 0.64, the IVF tier's own ceiling) over µ-quantized
    # values, with the composition-specific twist kept: vectors are
    # UNIT-NORMALIZED before quantization, because the final metric is
    # cosine and ADC scores are squared L2; on the unit sphere
    # ||a-b||² = 2 − 2·cos(a,b), so the ADC ordering is monotonic in
    # cosine (the standard IVF-PQ-for-cosine recipe). Without this the
    # ADC cut ranks by raw L2 and silently disagrees with the re-rank
    # metric. Corpus coding is MAP-ONLY (the codebook rides in as a
    # literal — no join, no shuffle, an improvement over the old
    # broadcast-join + window assignment).
    codebooks = _pq_train_codebooks(spark, sf_dir)
    if not codebooks:
        # empty corpus: any type-valid literal works — no row exists
        # for the assignment expression to ever score
        codebooks = [[[0.0] * 8]] * 8
    codes = subs.select("vec_id", "sub", _pq_assign_code(codebooks))
    cb_df = spark.createDataFrame(
        [
            (s, k, list(c))
            for s, cb in enumerate(codebooks)
            for k, c in enumerate(cb)
        ],
        "sub int, code int, c_arr array<double>",
    )
    sqdist = (
        "aggregate(zip_with({v}, c_arr, (x, c) -> (x - c) * (x - c)), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    lut = (
        subs.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"), "sub",
            F.col("subvec").alias("q_sub"),
        )
        .join(F.broadcast(cb_df), "sub")
        .select(
            "q_id", "sub", "code",
            F.expr(sqdist.format(v="q_sub")).alias("d"),
        )
    )

    # ---- compose: probe cells → candidate (q, cand) pairs → ADC score
    # via code⨝LUT lookups → per-query ADC cut → exact cosine re-rank
    cand = (
        best.join(F.broadcast(qprob), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("cand_id"))
    )
    adc = (
        cand.join(
            codes.withColumnRenamed("vec_id", "cand_id"), "cand_id"
        )
        .join(F.broadcast(lut), ["q_id", "sub", "code"])
        .groupBy("q_id", "cand_id")
        .agg(F.sum(F.round("d").cast("decimal(38,0)")).alias("adc_sum"))
    )
    w_adc = Window.partitionBy("q_id").orderBy("adc_sum", "cand_id")
    survivors = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .where(F.col("arn") <= _IVFPQ_ADC_CUT)
        .select("q_id", "cand_id")
    )

    # exact re-rank on the bounded survivor set only
    qvec = d.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_e"),
        F.col("nrm").alias("q_nrm"),
    )
    cvec = d.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_e2"),
        F.col("nrm").alias("c_nrm2"),
    )
    sim = F.round(
        _dot(F.col("q_e"), F.col("c_e2"))
        / F.sqrt(F.col("q_nrm") * F.col("c_nrm2")),
        4,
    )
    w_final = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        survivors.join(cvec, "cand_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            F.col("q_id").alias("query_id"), "cand_id", sim.alias("sim")
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cand_id")
                )
            )
            .cast("bigint"),
        )
        .where(F.col("rk") <= 5)
    )


_IVFK_CELLS = 8  # trained coarse cells (llm_embed_kmeans's K)
#: train-once cache for the coarse codebook, same contract as
#: _PQ_CB_CACHE: a fixed-size offline artifact keyed on the fixture's
#: content fingerprint. {(path, size, mtime_ns, K, iters): centroids}
_IVFK_CB_CACHE: dict = {}


def _ivf_train_cells(
    spark: SparkSession, sf_dir: str, K: int = _IVFK_CELLS, iters: int = 3
) -> list:
    """K-means-TRAINED coarse cells for IVF probing — the label-free
    counterpart of llm_sim_ivf_topk's labelled-init cells, reusing
    llm_embed_kmeans's deterministic construction (md5-ranked seeds,
    literal-codebook map-only assignment, K×64-row update collect) with
    the update hardened to µ-quantized int64 sums — partition-order
    free, so centroids reproduce bit for bit across runs, matching
    _pq_train_codebooks' discipline — but over the UNIT-NORMALIZED
    admissible corpus, because
    the probe metric is cosine and on the unit sphere L2-kmeans is
    spherical kmeans up to the metric identity ‖a−b‖² = 2 − 2·cos.
    Returns K centroids of 64 floats; [] on an empty corpus."""
    fp_path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(fp_path)
        key = (fp_path, st.st_size, st.st_mtime_ns, K, iters)
    except OSError:
        key = (fp_path, None, None, K, iters)
    if key in _IVFK_CB_CACHE:
        return _IVFK_CB_CACHE[key]

    emb = _spread(_sim_embeddings(spark, sf_dir))
    unit = emb.select(
        "vec_id",
        # nullif(norm, 0): _sim_embeddings already filters zero-norm
        # vectors, but whole-stage codegen's predicate subexpression
        # elimination evaluated this division SPECULATIVELY for the
        # filtered-out hostile zero row (FilterEvaluator subExpr_0 in
        # the crash stack) — under ANSI a job-killing DIVIDE_BY_ZERO.
        # NULL instead of 0 makes the expression total; admissible rows
        # divide by the identical double, so the trained centroids are
        # bit-unchanged on every non-hostile fixture.
        F.expr(
            "transform(embedding, x -> cast(x as double) / "
            "sqrt(nullif(aggregate(transform(embedding, "
            "y -> cast(y as double) * cast(y as double)), "
            "cast(0 as double), (a, v) -> a + v), cast(0 as double))))"
        ).alias("e"),
    )
    seeds = (
        unit.where(F.col("vec_id").isNotNull())
        .select(
            "vec_id", "e", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(K)
        .collect()
    )
    seeds = sorted(seeds, key=lambda r: r.h)
    if not seeds:
        _IVFK_CB_CACHE[key] = []
        return []
    cents = [[float(x) for x in r.e] for r in seeds]

    def assign(cents_):
        lit = _dbl_array_lit(cents_)
        dists = F.transform(
            lit,
            lambda c: F.aggregate(
                F.zip_with("e", c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).alias(
            "cell"
        )

    # Update step over µ-quantized int64 sums (µ = 1e6, the same scale
    # _pq_quantized_subs uses): float avg() is partition-order
    # dependent, which would make the trained centroids — and hence
    # cell assignments and the rows-only recall floors — cross-run
    # flaky; sum(bigint)/count is merge-order free, so the whole loop
    # is reproducible from the fixture alone, like _pq_train_codebooks.
    for _ in range(iters):
        rows = (
            unit.select(assign(cents), F.posexplode("e").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(
                    F.round(F.col("x") * 1000000).cast("bigint")
                ).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for r in rows:
            cents[r.cell][r.pos] = r.sx / r.n / 1000000.0
    _IVFK_CB_CACHE[key] = cents
    return cents


def _ivf_kmeans_frames(spark: SparkSession, sf_dir: str):
    """Shared probe frames of the label-free IVF pair — ONE
    construction consumed by both `llm_sim_ivf_kmeans_topk` and the
    composed `llm_sim_ivfpq_kmeans_topk`, because the composed key's
    uncapped-refine bit-equality invariant demands the IDENTICAL
    candidate pool (same cell assignment, same probe list, same
    rounding and tie-breaks) — sharing the code makes divergence
    impossible rather than merely tested. Returns
    ``(d, best, qprob)``: the admissible corpus with norms, each
    vector's best trained cell (ties → lowest cell id) still carrying
    its embedding, and each query's ``_IVF_NPROBE`` probe list.
    ``(d, None, None)`` on an empty corpus."""
    cents = _ivf_train_cells(spark, sf_dir)
    emb = _spread(_sim_embeddings(spark, sf_dir))
    d = emb.select(
        "vec_id",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )
    if not cents:
        return d, None, None
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell int, c_e array<double>",
    ).withColumn("c_nrm", _dot(F.col("c_e"), F.col("c_e")))

    csim = F.round(
        _dot(F.col("embedding"), F.col("c_e"))
        / F.sqrt(F.col("nrm") * F.col("c_nrm")),
        6,
    )
    scored = d.join(F.broadcast(cent)).select(
        "vec_id", "embedding", "nrm", "cell", csim.alias("csim")
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            "cell", F.struct(F.col("csim"), (-F.col("cell")).alias("nc"))
        ).alias("cell"),
        F.first("embedding").alias("embedding"),
        F.first("nrm").alias("nrm"),
    )
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell")
    )
    qprob = (
        scored.where(F.col("vec_id") % 100 == 0)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_e"),
            F.col("nrm").alias("q_nrm"),
            "cell",
        )
    )
    return d, best, qprob


@register("llm_sim_ivf_kmeans_topk", tags=("approx", "rows-only"))
def llm_sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a fully LABEL-FREE coarse quantizer — the companion
    that finishes de-labelling the ANN stack (WAVE11 follow-through):
    where llm_sim_ivf_topk's cells are one k-means step from the
    labelled init (kept as registered, its refine-equivalence twin
    llm_sim_ivfpq_topk depends on that exact pool), this key probes
    cells TRAINED by seeded Lloyd's over the corpus alone
    (``_ivf_train_cells``), so the whole cascade —
    trained coarse cells here + trained PQ sub-codebooks in
    _pq_train_codebooks — now needs nothing a raw 100 TB corpus does
    not carry. Same query surface: every 100th vector probes its
    ``_IVF_NPROBE`` best cells by rounded cosine, candidates are the
    probed cells' populations, exact cosine re-rank to top-5.

    Scale shape identical to the IVF tier: the codebook is a K-row
    broadcast (map-only scoring), each corpus vector lives in exactly
    one cell (at 100 TB the cell id is a partition column), candidates
    per query ≈ nprobe/K of the corpus. Approx → rows-only; recall@5
    vs the exact baseline is property-tested with the same floor
    methodology as the labelled tier."""
    d, best, qprob = _ivf_kmeans_frames(spark, sf_dir)
    if best is None:
        return d.select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("cand_id"),
            F.lit(0.0).alias("sim"),
        ).where(F.lit(False))
    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        best.join(F.broadcast(qprob), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@register("llm_sim_ivfpq_kmeans_topk", tags=("approx", "rows-only"))
def llm_sim_ivfpq_kmeans_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FULLY label-free IVF-PQ cascade (WAVE12 candidate 1):
    trained coarse cells (`_ivf_train_cells`) select candidate cells,
    trained PQ sub-codebooks (`_pq_train_codebooks`) score candidates
    by integer-exact ADC over unit-normalized µ-quantized codes, the
    ``_IVFPQ_ADC_CUT`` best survivors get one exact cosine re-rank —
    the production disk-scale ANN stack with ZERO dependence on
    per-vector labels, closing the de-labelling arc
    (label-mean → trained PQ in WAVE11 → trained coarse + trained PQ
    here). The coarse probe frames are SHARED CODE with
    llm_sim_ivf_kmeans_topk (`_ivf_kmeans_frames`), so the
    uncapped-refine bit-equality invariant — same pool, same metric,
    same tie-break when the ADC cut is lifted — holds by construction
    and is asserted in tests/test_properties.py alongside the recall
    floor (measured 0.84 at CUT=64: the ADC stage loses NOTHING
    against the trained-coarse tier on the fixture) and re-rank
    exactness.

    Scale shape identical to llm_sim_ivfpq_topk: both codebooks are
    fixed-size cached offline artifacts (K×64 cells + 8×K
    sub-centroids), candidates bounded by nprobe cells × population,
    corpus payload through the scoring join is 8 int codes/vector,
    raw floats touched only for ≤ CUT×queries re-rank rows; the
    corpus-grain exchanges are the cell equi-join and the ADC
    aggregate, both equi-keyed."""
    d, best, qprob = _ivf_kmeans_frames(spark, sf_dir)
    if best is None:
        return d.select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("cand_id"),
            F.lit(0.0).alias("sim"),
        ).where(F.lit(False))
    _, subs = _pq_quantized_subs(spark, sf_dir)
    codebooks = _pq_train_codebooks(spark, sf_dir)
    if not codebooks:
        codebooks = [[[0.0] * 8]] * 8
    codes = subs.select("vec_id", "sub", _pq_assign_code(codebooks))
    cb_df = spark.createDataFrame(
        [
            (s, k, list(c))
            for s, cb in enumerate(codebooks)
            for k, c in enumerate(cb)
        ],
        "sub int, code int, c_arr array<double>",
    )
    sqdist = (
        "aggregate(zip_with({v}, c_arr, (x, c) -> (x - c) * (x - c)), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    lut = (
        subs.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"), "sub",
            F.col("subvec").alias("q_sub"),
        )
        .join(F.broadcast(cb_df), "sub")
        .select(
            "q_id", "sub", "code",
            F.expr(sqdist.format(v="q_sub")).alias("d"),
        )
    )
    cand = (
        best.select("vec_id", "cell")
        .join(
            F.broadcast(
                qprob.select(F.col("query_id").alias("q_id"), "cell")
            ),
            "cell",
        )
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("cand_id"))
    )
    adc = (
        cand.join(
            codes.withColumnRenamed("vec_id", "cand_id"), "cand_id"
        )
        .join(F.broadcast(lut), ["q_id", "sub", "code"])
        .groupBy("q_id", "cand_id")
        .agg(F.sum(F.round("d").cast("decimal(38,0)")).alias("adc_sum"))
    )
    w_adc = Window.partitionBy("q_id").orderBy("adc_sum", "cand_id")
    survivors = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .where(F.col("arn") <= _IVFPQ_ADC_CUT)
        .select("q_id", "cand_id")
    )
    qvec = d.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_e"),
        F.col("nrm").alias("q_nrm"),
    )
    cvec = d.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_e2"),
        F.col("nrm").alias("c_nrm2"),
    )
    sim = F.round(
        _dot(F.col("q_e"), F.col("c_e2"))
        / F.sqrt(F.col("q_nrm") * F.col("c_nrm2")),
        4,
    )
    return (
        survivors.join(cvec, "cand_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            F.col("q_id").alias("query_id"), "cand_id", sim.alias("sim")
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cand_id")
                )
            )
            .cast("bigint"),
        )
        .where(F.col("rk") <= 5)
    )


@register(
    "llm_curation_drift_monitor",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort,
             list_filter(string_split(lower(text), ' '), t -> t <> '')
                 AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, cohort,
             md5(array_to_string(toks, ' ')) AS h,
             coalesce(len(toks), 0) AS n_tokens,
             CASE WHEN coalesce(len(toks), 0) = 0 THEN NULL
                  ELSE len(list_distinct(toks)) * 1.0 / len(toks)
                  END AS uniq_ratio
      FROM tk
    ), ranked AS (
      SELECT cohort, n_tokens, uniq_ratio,
             sum(CASE WHEN n_tokens BETWEEN 2 AND 80
                       AND uniq_ratio >= 0.35 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY h ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS surv_rank
      FROM f
    ), disp AS (
      SELECT cohort,
             CASE WHEN n_tokens = 0 THEN 'empty'
                  WHEN n_tokens < 2 OR n_tokens > 80 THEN 'length_gate'
                  WHEN uniq_ratio < 0.35 THEN 'low_quality'
                  WHEN surv_rank > 1 THEN 'exact_dup'
                  ELSE 'kept' END AS stage
      FROM ranked
    ), c AS (
      SELECT stage,
             CAST(sum(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
             CAST(sum(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
      FROM disp GROUP BY stage
    ), t AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             CAST(sum(n_b) AS BIGINT) AS tb
      FROM c
    )
    SELECT c.stage, c.n_a, c.n_b,
           round(CAST(c.n_a AS DOUBLE) / t.ta, 6) AS share_a,
           round(CAST(c.n_b AS DOUBLE) / t.tb, 6) AS share_b,
           CASE WHEN c.n_a = 0 OR c.n_b = 0 THEN NULL
                ELSE CAST(round((CAST(c.n_b AS DOUBLE) / t.tb
                                 - CAST(c.n_a AS DOUBLE) / t.ta)
                                * ln((CAST(c.n_b AS DOUBLE) / t.tb)
                                     / (CAST(c.n_a AS DOUBLE) / t.ta))
                                * 1000000000) AS BIGINT)
                END AS psi_term_nano
    FROM c CROSS JOIN t
    ORDER BY c.stage
    """,
)
def llm_curation_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation drift monitoring (WAVE13 candidate 2) — the table a
    production curation pipeline pages on: two ingest cohorts (doc_id
    parity stands in for 'yesterday vs today') run through the same
    curation funnel — empty gate → token-length gate [2, 80] →
    lexical-diversity gate (uniq_ratio ≥ 0.35) → exact dedup against
    the WHOLE standing corpus (normalized-token md5, keep-first by
    doc_id, first-failing-stage-wins) — and the monitor reports, per
    funnel stage, each cohort's attrition count and share plus the
    nano-quantized PSI term of the disposition-mix shift
    ((share_b − share_a)·ln(share_b/share_a), the
    agg_population_stability_index discipline; alert when the summed
    terms cross 0.1/0.25). A stage with either cohort empty yields a
    NULL term (PSI undefined), never ±inf.

    Semantics notes: NULL/whitespace-only text lands in 'empty'
    (coalesced token count); the dedup rank counts only
    quality-surviving rows via a conditional running sum inside the
    hash partition — one window, no survivor re-join; dedup is
    deliberately CROSS-cohort (a new ingest day dedups against the
    standing corpus, not just itself). On the pristine fixture the
    exact_dup stage is empty (all texts distinct — the monitor shows
    a clean day); the hostile corpus populates it (whitespace-variant
    near-identical docs normalize to one hash).

    Scale shape: tokenize/gates/hash are scan-stage expressions; the
    ONE corpus-grain exchange is the hash-partition window (16-byte
    digests, never text); the census is a stage-cardinality groupBy
    and the PSI arithmetic joins a broadcast 1-row total. At 100 TB
    the monitor costs one dedup-shaped pass — which the pipeline
    already runs — plus bounded arithmetic."""
    return _drift_funnel_psi(
        _spread(load(spark, sf_dir, "documents")),
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b"),
    )


def _funnel_fields(docs: DataFrame, cohort) -> DataFrame:
    """Per-doc scan-stage funnel fields shared by the batch drift
    monitors AND the streaming fold (streaming.fold_drift_census):
    cohort label, normalized-token md5, coalesced token count, lexical
    uniqueness ratio."""
    toks = _tokens()
    return docs.select(
        "doc_id",
        cohort.alias("cohort"),
        F.md5(F.array_join(toks, " ").cast("binary")).alias("h"),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("n_tokens"),
        F.try_divide(
            F.size(F.array_distinct(toks)), F.size(toks)
        ).alias("uniq_ratio"),
    )


#: quality predicate over _funnel_fields columns (length + diversity
#: gates) — a doc passing it competes in the exact-dedup rank
def _funnel_passes():
    return F.col("n_tokens").between(2, 80) & (F.col("uniq_ratio") >= 0.35)


def _funnel_stage(surv_rank):
    """First-failing-stage CASE over _funnel_fields columns, given the
    doc's (cross-corpus) survivor rank among quality-passing docs of
    its hash: empty → length_gate → low_quality → exact_dup → kept."""
    return (
        F.when(F.col("n_tokens") == 0, "empty")
        .when(
            (F.col("n_tokens") < 2) | (F.col("n_tokens") > 80),
            "length_gate",
        )
        .when(F.col("uniq_ratio") < 0.35, "low_quality")
        .when(surv_rank > 1, "exact_dup")
        .otherwise("kept")
    )


def _drift_funnel_psi(docs: DataFrame, cohort) -> DataFrame:
    """The shared funnel + PSI construction of the drift monitors:
    classify each doc into the curation funnel's first-failing stage,
    census per (stage, cohort), emit shares and nano-quantized PSI
    terms. ``cohort`` is the 'a' (reference) / 'b' (current) labelling
    Column — the parity monitor and the incremental
    standing-vs-new-batch monitor differ ONLY here, so their funnel
    semantics cannot drift apart."""
    f = _funnel_fields(docs, cohort)
    w = (
        Window.partitionBy("h")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = f.select(
        "cohort",
        "n_tokens",
        "uniq_ratio",
        F.sum(F.when(_funnel_passes(), 1).otherwise(0))
        .over(w)
        .alias("surv_rank"),
    )
    disp = ranked.select(
        "cohort", _funnel_stage(F.col("surv_rank")).alias("stage")
    )
    c = disp.groupBy("stage").agg(
        F.sum(F.when(F.col("cohort") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("cohort") == "b", 1).otherwise(0)).alias("n_b"),
    )
    return _census_psi(c)


def _census_psi(c: DataFrame) -> DataFrame:
    """PSI arithmetic over a (stage, n_a, n_b) census — the
    presentation half of the drift monitors, shared with the streaming
    fold so the emitted table is column-identical however the census
    was maintained."""
    t = c.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    sa = F.try_divide(F.col("n_a").cast("double"), F.col("ta"))
    sb = F.try_divide(F.col("n_b").cast("double"), F.col("tb"))
    psi = F.when(
        (F.col("n_a") == 0) | (F.col("n_b") == 0),
        F.lit(None).cast("bigint"),
    ).otherwise(
        F.round((sb - sa) * F.log(F.try_divide(sb, sa)) * 1e9).cast(
            "bigint"
        )
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "stage",
            "n_a",
            "n_b",
            F.round(sa, 6).alias("share_a"),
            F.round(sb, 6).alias("share_b"),
            psi.alias("psi_term_nano"),
        )
        .orderBy("stage")
    )


@register(
    "llm_curation_drift_incremental",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 4 THEN 'b' ELSE 'a' END AS cohort,
             list_filter(string_split(lower(text), ' '), t -> t <> '')
                 AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, cohort,
             md5(array_to_string(toks, ' ')) AS h,
             coalesce(len(toks), 0) AS n_tokens,
             CASE WHEN coalesce(len(toks), 0) = 0 THEN NULL
                  ELSE len(list_distinct(toks)) * 1.0 / len(toks)
                  END AS uniq_ratio
      FROM tk
    ), ranked AS (
      SELECT cohort, n_tokens, uniq_ratio,
             sum(CASE WHEN n_tokens BETWEEN 2 AND 80
                       AND uniq_ratio >= 0.35 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY h ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS surv_rank
      FROM f
    ), disp AS (
      SELECT cohort,
             CASE WHEN n_tokens = 0 THEN 'empty'
                  WHEN n_tokens < 2 OR n_tokens > 80 THEN 'length_gate'
                  WHEN uniq_ratio < 0.35 THEN 'low_quality'
                  WHEN surv_rank > 1 THEN 'exact_dup'
                  ELSE 'kept' END AS stage
      FROM ranked
    ), c AS (
      SELECT stage,
             CAST(sum(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
             CAST(sum(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
      FROM disp GROUP BY stage
    ), t AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             CAST(sum(n_b) AS BIGINT) AS tb
      FROM c
    )
    SELECT c.stage, c.n_a, c.n_b,
           round(CAST(c.n_a AS DOUBLE) / t.ta, 6) AS share_a,
           round(CAST(c.n_b AS DOUBLE) / t.tb, 6) AS share_b,
           CASE WHEN c.n_a = 0 OR c.n_b = 0 THEN NULL
                ELSE CAST(round((CAST(c.n_b AS DOUBLE) / t.tb
                                 - CAST(c.n_a AS DOUBLE) / t.ta)
                                * ln((CAST(c.n_b AS DOUBLE) / t.tb)
                                     / (CAST(c.n_a AS DOUBLE) / t.ta))
                                * 1000000000) AS BIGINT)
                END AS psi_term_nano
    FROM c CROSS JOIN t
    ORDER BY c.stage
    """,
)
def llm_curation_drift_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drift monitoring over the INCREMENTAL curation cohorts (WAVE14
    candidate 5): reference = the standing corpus (doc_id % 5 ≠ 4),
    current = the arriving batch (doc_id % 5 = 4 —
    pipeline_incremental_curation's exact split), same funnel and PSI
    arithmetic as llm_curation_drift_monitor via the shared
    ``_drift_funnel_psi`` construction. This is the day-over-day form
    a pipeline actually alerts on: 'does today's ingest attrit
    differently than the corpus it joins?' — an unbalanced 80/20
    split, so the share normalization (per-cohort totals) is doing
    real work, unlike the parity monitor's 50/50. Dedup remains
    cross-cohort: a new doc identical to a standing doc is exact_dup
    (keep-first by doc_id), the incremental pipeline's admission rule.

    Scale shape: identical to the parity monitor — one 16-byte-digest
    hash window, stage-cardinality census, broadcast 1-row totals;
    the monitor rides the dedup pass the increment already pays."""
    return _drift_funnel_psi(
        _spread(load(spark, sf_dir, "documents")),
        F.when(F.col("doc_id") % 5 == 4, "b").otherwise("a"),
    )


@register(
    "evt_drift_monitor_stream",
    oracle=REGISTRY["llm_curation_drift_monitor"].oracle,
    tags=("streaming",),
)
def evt_drift_monitor_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor as a STREAMING query (WAVE15 candidate 1):
    the documents frontier drains through foreachBatch; each
    micro-batch's funnel census folds into a standing
    per-(hash, cohort, stage) table under the two-phase versioned
    commit protocol (streaming.fold_drift_census — replay-safe,
    additive integer merges); the final table's per-stage census must
    equal the BATCH monitor bit-for-bit — it registers with
    llm_curation_drift_monitor's own oracle SQL, so the driver's hash
    gate certifies that the alerting table a 24/7 curation pipeline
    pages on can be maintained incrementally, batch by batch.

    The only cross-batch coupling in the funnel is exact dedup
    (keep-first by doc_id across the WHOLE corpus): the fold resolves
    it by probing the standing index for each hash's already-admitted
    quality-passing count and adding the within-batch rank — sound on
    a doc_id-ordered frontier (the crawl shape
    prepare_stream_source_docs_ordered replays, monotone ingest ids),
    where every predecessor arrives no later than its successor.
    Batch-cut invariance under that feed is pinned in
    tests/test_streaming_batchcut_invariance.py.

    Scale shape: per batch — scan-stage funnel fields, one batch-local
    digest window, one hash equi-join against the standing index, one
    additive census merge: O(batch + state) with only 16-byte digests
    and bounded enums in state, never text. The PSI presentation
    (_census_psi) runs once on the final stage-cardinality census."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_docs_ord", _sf_tag(sf_dir), "documents")
    st.prepare_stream_source_docs_ordered(spark, sf_dir, src, n_files=4)
    work = _tempfile.mkdtemp(prefix="drift_stream_")
    target = _os.path.join(work, "census")
    ckpt = _os.path.join(work, "ckpt")
    try:
        n = st.run_drift_monitor_stream(
            spark, src, target, ckpt, files_per_batch=1
        )
        if not _os.path.isdir(target) or n == 0:
            c = spark.createDataFrame(
                [], "stage string, n_a bigint, n_b bigint"
            )
        else:
            state = spark.read.parquet(target)
            c = state.groupBy("stage").agg(
                F.coalesce(
                    F.sum(F.when(F.col("cohort") == "a", F.col("n"))),
                    F.lit(0),
                ).alias("n_a"),
                F.coalesce(
                    F.sum(F.when(F.col("cohort") == "b", F.col("n"))),
                    F.lit(0),
                ).alias("n_b"),
            )
        out = _census_psi(c).localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "evt_neardup_ingest_stream",
    oracle="""
    WITH shingles AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS toks
            FROM documents)
    ), per_doc AS (
      SELECT doc_id,
             min(md5(sh || '#0')) AS h0, min(md5(sh || '#1')) AS h1,
             min(md5(sh || '#2')) AS h2, min(md5(sh || '#3')) AS h3,
             min(md5(sh || '#4')) AS h4, min(md5(sh || '#5')) AS h5,
             min(md5(sh || '#6')) AS h6, min(md5(sh || '#7')) AS h7
      FROM shingles GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, band_id, sig FROM per_doc, LATERAL (VALUES
        (0, h0 || h1), (1, h2 || h3),
        (2, h4 || h5), (3, h6 || h7)) AS b(band_id, sig)
    ), firsts AS (
      SELECT band_id, sig, min(doc_id) AS first_doc_id
      FROM bands GROUP BY band_id, sig
    )
    SELECT b.doc_id, b.band_id, b.sig, f.first_doc_id
    FROM bands b JOIN firsts f
      ON b.band_id = f.band_id AND b.sig = f.sig
    WHERE b.doc_id > f.first_doc_id
    """,
    tags=("streaming",),
)
def evt_neardup_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash near-dedup at INGEST, registered and oracled
    (WAVE16 candidate 1): the documents frontier replays through the
    per-(band, sig) keyed-state flagger
    (streaming.stream_neardup_band_flags — applyInPandasWithState, one
    first-arrival doc_id per occupied bucket), and the emitted flag
    rows must equal the BATCH band index exactly: every doc except
    each bucket's global-min doc_id, tagged with that first arrival.
    The oracle recomputes the banded-MinHash construction in SQL
    (identical shingles → 8 min-hashes → 4 band signatures), so the
    driver's hash gate certifies the streaming ingest path end to end
    — the WAVE13 exactly-once promotion applied to the repo's oldest
    test-only streaming capability.

    Soundness on the feed shape: 'first arrival' equals 'global min
    doc_id' on a doc_id-ordered frontier (monotone ingest ids — the
    crawl shape prepare_stream_source_docs_ordered replays; within a
    micro-batch the fold sorts ids). Batch-cut invariance under that
    feed is pinned in tests/test_streaming_batchcut_invariance.py.

    Scale shape: per batch — scan-stage shingle/minhash HOFs, ONE
    (band, sig) state shuffle carrying 16-byte digests; state is one
    doc_id per occupied bucket (the persisted band index, bounded by
    distinct signatures, TTL-aged in a time-scoped deployment). The
    flag census rides the ingest path instead of re-scanning the
    corpus per batch."""
    import os as _os

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_docs_ord", _sf_tag(sf_dir), "documents")
    st.prepare_stream_source_docs_ordered(spark, sf_dir, src, n_files=4)
    docs_schema = load(spark, sf_dir, "documents").schema
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = "t_neardup_ingest_reg"
    st.run_to_memory(
        st.stream_neardup_band_flags(stream), name, "append"
    )
    out = (
        spark.table(name)
        .select("doc_id", "band_id", "sig", "first_doc_id")
        .localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(name)
    return out


@register(
    "evt_pack_token_shards_stream",
    oracle=REGISTRY["llm_pack_token_shards"].oracle,
    tags=("streaming",),
)
def evt_pack_token_shards_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-shard packing as a STREAMING fold (WAVE16 candidate 4):
    the documents frontier drains through foreachBatch; each
    micro-batch's docs take shard ids from the standing token offset
    (derived from the census state itself — sum of shard_tokens IS the
    running total) plus a within-batch distributed prefix sum, and the
    per-shard census merges additively under the two-phase versioned
    commit protocol (streaming.fold_pack_census). The final table
    registers with llm_pack_token_shards' own oracle SQL, so the
    driver's hash gate certifies that the packing table a trainer
    reads can be maintained on the ingest path instead of nightly
    rebuilt. Sound on the doc_id-ordered frontier; batch-cut
    invariance (1/2/all files per trigger) pinned in
    tests/test_streaming_batchcut_invariance.py.

    Scale shape: per batch — one range-shuffle prefix sum over the
    BATCH, a broadcast 1-row offset, one shard-grain additive merge;
    state is shard-cardinality, never per-doc."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from .. import streaming as st
    from .scans import _scratch, _sf_tag

    src = _scratch("stream_docs_ord", _sf_tag(sf_dir), "documents")
    st.prepare_stream_source_docs_ordered(spark, sf_dir, src, n_files=4)
    work = _tempfile.mkdtemp(prefix="pack_stream_")
    target = _os.path.join(work, "census")
    ckpt = _os.path.join(work, "ckpt")
    try:
        n = st.run_pack_shards_stream(
            spark, src, target, ckpt, files_per_batch=1
        )
        if not _os.path.isdir(target) or n == 0:
            return spark.createDataFrame(
                [],
                "shard_id int, n_docs bigint, shard_tokens bigint, "
                "first_doc bigint, last_doc bigint",
            )
        out = spark.read.parquet(target).localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(work, ignore_errors=True)
    return out


def _ivf_partition_layout(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The IVF deployment layout PLANS.md has described since round 2:
    the coded corpus written with the coarse CELL ID as a physical
    partition column (one ``cell=K/`` directory per cell), plus the
    K-row centroid codebook persisted beside it. Query-time cell
    ranking reads the STORED centroids — the layout and the probe can
    never disagree across sessions or exec configs (the float-fold
    drift hazard ADVICE r11 flagged for in-session training). Both
    artifacts sealed per fixture via the shared ``_cached`` rule —
    train-once offline artifacts, the production shape."""
    from .scans import _cached, _scratch, _seal_cache, _sf_tag

    out = _scratch("ivf_part", _sf_tag(sf_dir), "embeddings")
    cdir = _scratch("ivf_part_cent", _sf_tag(sf_dir), "embeddings")
    params = "ivf_partition_layout:cells=labels:v1"
    if _cached(out, sf_dir, "embeddings", params) and _cached(
        cdir, sf_dir, "embeddings", params
    ):
        return out, cdir
    emb = _spread(_sim_embeddings(spark, sf_dir))
    d = emb.select(
        "vec_id",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            F.col("label").alias("cell"),
            F.transform("pm", lambda s: s["m"]).alias("c_e"),
        )
        .withColumn("c_nrm", _dot(F.col("c_e"), F.col("c_e")))
    )
    csim = F.round(
        _dot(F.col("embedding"), F.col("c_e"))
        / F.sqrt(F.col("nrm") * F.col("c_nrm")),
        6,
    )
    best = (
        d.join(F.broadcast(cent))
        .select("vec_id", "embedding", "nrm", "cell", csim.alias("csim"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cell",
                F.struct(F.col("csim"), (-F.col("cell")).alias("nc")),
            ).alias("cell"),
            F.first("embedding").alias("embedding"),
            F.first("nrm").alias("nrm"),
        )
    )
    (
        best.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out)
    )
    cent.write.mode("overwrite").parquet(cdir)
    _seal_cache(out, sf_dir, "embeddings", params)
    _seal_cache(cdir, sf_dir, "embeddings", params)
    return out, cdir


@register("llm_sim_ivf_partition_pruned", tags=("approx", "rows-only"))
def llm_sim_ivf_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe as PHYSICAL PARTITION PRUNING (WAVE16 candidate 3) —
    the claim every IVF docstring in this repo has carried ('at 100 TB
    the cell id becomes a partition column and the scan cut is
    partition pruning'), made executable: the coded corpus lives in
    ``cell=K/`` directories (_ivf_partition_layout, a cached offline
    artifact with its centroid codebook beside it); at query time the
    probed cell set — a ≤K-row driver hop from ranking STORED
    centroids — becomes a partition filter, so the corpus scan
    physically opens only the nprobe cell directories.
    tests/test_layout.py pins from inputFiles that the pruned scan
    reads exactly the probed directories (and strictly fewer than all)
    and that the answer is bit-equal to a full-scan-then-filter run —
    partition pruning lost nothing. Recall@5 vs the exact baseline
    carries the same property floor as the in-session IVF tier.

    Scale shape: the ONLY corpus-grain IO is the pruned scan —
    nprobe/K of the data by directory arithmetic, before any executor
    touches a row; candidates join the broadcast ≤(queries×nprobe)
    probe frame per cell; top-k is a query-partitioned window.
    Rows-only by design (approximate by construction, like every ANN
    tier)."""
    out, cdir = _ivf_partition_layout(spark, sf_dir)
    import glob as _glob
    import os as _os

    if not _glob.glob(_os.path.join(out, "cell=*")):
        return spark.createDataFrame(
            [], "query_id bigint, cand_id bigint, sim double"
        )
    cent = spark.read.parquet(cdir)
    emb = _sim_embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_e"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    qsim = F.round(
        _dot(F.col("q_e"), F.col("c_e"))
        / F.sqrt(F.col("q_nrm") * F.col("c_nrm")),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("cell")
    )
    qprob = (
        q.join(F.broadcast(cent))
        .select("query_id", "q_e", "q_nrm", "cell", qsim.alias("qsim"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVF_NPROBE)
        .select("query_id", "q_e", "q_nrm", "cell")
    )
    # the probed cell set: a bounded driver hop (≤ K distinct cells —
    # the cells table, not the corpus), exactly the literal list a
    # production query layer pushes into its partition predicate
    cells = sorted(
        r.cell for r in qprob.select("cell").distinct().collect()
    )
    if not cells:
        return spark.createDataFrame(
            [], "query_id bigint, cand_id bigint, sim double"
        )
    corpus = spark.read.parquet(out).where(F.col("cell").isin(cells))
    sim = F.round(
        _dot(F.col("q_e"), F.col("embedding"))
        / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cand_id")
    )
    return (
        corpus.join(F.broadcast(qprob), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), sim.alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "pipeline_drift_gate",
    oracle="""
    WITH m AS (
    WITH tk AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 4 THEN 'b' ELSE 'a' END AS cohort,
             list_filter(string_split(lower(text), ' '), t -> t <> '')
                 AS toks
      FROM documents
    ), f AS (
      SELECT doc_id, cohort,
             md5(array_to_string(toks, ' ')) AS h,
             coalesce(len(toks), 0) AS n_tokens,
             CASE WHEN coalesce(len(toks), 0) = 0 THEN NULL
                  ELSE len(list_distinct(toks)) * 1.0 / len(toks)
                  END AS uniq_ratio
      FROM tk
    ), ranked AS (
      SELECT cohort, n_tokens, uniq_ratio,
             sum(CASE WHEN n_tokens BETWEEN 2 AND 80
                       AND uniq_ratio >= 0.35 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY h ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS surv_rank
      FROM f
    ), disp AS (
      SELECT cohort,
             CASE WHEN n_tokens = 0 THEN 'empty'
                  WHEN n_tokens < 2 OR n_tokens > 80 THEN 'length_gate'
                  WHEN uniq_ratio < 0.35 THEN 'low_quality'
                  WHEN surv_rank > 1 THEN 'exact_dup'
                  ELSE 'kept' END AS stage
      FROM ranked
    ), c AS (
      SELECT stage,
             CAST(sum(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
             CAST(sum(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
      FROM disp GROUP BY stage
    ), t AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             CAST(sum(n_b) AS BIGINT) AS tb
      FROM c
    )
    SELECT c.stage, c.n_a, c.n_b,
           round(CAST(c.n_a AS DOUBLE) / t.ta, 6) AS share_a,
           round(CAST(c.n_b AS DOUBLE) / t.tb, 6) AS share_b,
           CASE WHEN c.n_a = 0 OR c.n_b = 0 THEN NULL
                ELSE CAST(round((CAST(c.n_b AS DOUBLE) / t.tb
                                 - CAST(c.n_a AS DOUBLE) / t.ta)
                                * ln((CAST(c.n_b AS DOUBLE) / t.tb)
                                     / (CAST(c.n_a AS DOUBLE) / t.ta))
                                * 1000000000) AS BIGINT)
                END AS psi_term_nano
    FROM c CROSS JOIN t
    ), g AS (
      SELECT CAST(coalesce(sum(psi_term_nano), 0) AS BIGINT)
                 AS psi_total_nano,
             coalesce(sum(psi_term_nano), 0) <= 250000000 AS admit,
             CAST(coalesce(max(CASE WHEN stage = 'kept' THEN n_b END), 0)
                  AS BIGINT) AS kept_b
      FROM m
    )
    SELECT m.stage, m.n_a, m.n_b, m.share_a, m.share_b, m.psi_term_nano,
           g.psi_total_nano, g.admit,
           CAST(CASE WHEN g.admit THEN g.kept_b ELSE 0 END AS BIGINT)
               AS admitted_docs
    FROM m CROSS JOIN g
    ORDER BY m.stage
    """,
)
def pipeline_drift_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor CLOSING THE LOOP (WAVE18): the incremental
    curation batch (llm_curation_drift_incremental's standing-vs-new
    cohorts) is ADMITTED only when the summed per-stage PSI stays under
    the 0.25 alert threshold — the gate a production pipeline actually
    wires between its drift table and its ingest job, registered as
    one oracled key so the whole control loop (funnel census → PSI →
    threshold decision → admitted-doc count) is hash-certified. Each
    stage row carries the monitor's fields plus the batch-level
    verdict: summed nano-PSI, the admit boolean, and the number of
    docs the gate lets through (the new cohort's 'kept' count when
    admitted, zero when quarantined — a quarantined batch goes to
    human review, not the corpus).

    NULL PSI terms (a stage one cohort never hits) are skipped by the
    sum on both engines — PSI-undefined stages cannot veto a batch;
    an EMPTY batch sums to 0 and admits (nothing to drift).

    Scale shape: everything after the monitor's stage-cardinality
    census is arithmetic on ≤|stages| rows plus one broadcast 1-row
    verdict join; the gate adds ZERO corpus-grain work to the monitor
    it wraps."""
    # r12 (census + plan audit): monitor (<=|stages| rows) feeds the
    # verdict aggregate AND the final join — re-planned per reference
    # (4 documents scans). Lazy localCheckpoint pins one evaluation.
    monitor = _drift_funnel_psi(
        _spread(load(spark, sf_dir, "documents")),
        F.when(F.col("doc_id") % 5 == 4, "b").otherwise("a"),
    ).transform(pin)
    g = monitor.agg(
        F.coalesce(F.sum("psi_term_nano"), F.lit(0))
        .cast("bigint")
        .alias("psi_total_nano"),
        (
            F.coalesce(F.sum("psi_term_nano"), F.lit(0)) <= 250000000
        ).alias("admit"),
        F.coalesce(
            F.max(F.when(F.col("stage") == "kept", F.col("n_b"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("kept_b"),
    )
    return (
        monitor.crossJoin(F.broadcast(g))
        .select(
            "stage",
            "n_a",
            "n_b",
            "share_a",
            "share_b",
            "psi_term_nano",
            "psi_total_nano",
            "admit",
            F.when(F.col("admit"), F.col("kept_b"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("admitted_docs"),
        )
        .orderBy("stage")
    )
