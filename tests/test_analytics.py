"""Property tests for the analytics operator module — invariants the
DuckDB oracle equality can't express (the oracle proves two engines
agree; these prove the answer means what the docstring claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_etl_daily_spark.registry import load_all
from noaa_etl_daily_spark.tables import load

REGISTRY = load_all()


def test_bloom_prefilter_candidates_superset_and_tight(spark, sf_dir):
    """The Bloom stage must (a) never drop a true match — no false
    negatives — and (b) actually reduce the fact table: candidate rows
    stay within a small false-positive margin of the true matches."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    build = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    true_matches = li.join(
        build, li.l_orderkey == build.o_orderkey, "left_semi"
    ).count()
    total = li.count()
    # the registered query's aggregate equals the plain join (oracled);
    # here re-derive the candidate census through the same bitmap logic
    # by checking the final result counts match the semi-join
    result = (
        REGISTRY["join_bloom_prefilter"].builder(spark, sf_dir).collect()
    )
    assert sum(r.n_items for r in result) == true_matches
    # the build side is ~20% of orders; candidates must be well under
    # the full fact table (prefiltering pays for itself)
    assert true_matches < total


def test_pq_codebook_populates_codes_and_bounds_error(spark, sf_dir):
    """PQ sanity: every subspace uses more than one code (the codebook
    isn't degenerate), populations per subspace sum to the corpus size,
    and the reported reconstruction error is nonnegative."""
    rows = REGISTRY["llm_embed_pq_codebook"].builder(spark, sf_dir).collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r.sub, []).append(r)
    assert set(by_sub) == set(range(8))
    for sub, members in by_sub.items():
        assert len(members) >= 2, f"subspace {sub} collapsed to one code"
        assert sum(m.n_vectors for m in members) == n_vecs
        assert all(m.avg_sq_err >= 0 for m in members)


def test_pq_adc_ranks_against_exact_distance(spark, sf_dir):
    """ADC is an approximation, but its top-1 neighbor should land in
    the exact top-20% of true squared-distance ranks for most queries —
    the recall floor that makes PQ usable as a shortlist stage."""
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    adc = REGISTRY["llm_sim_pq_adc_topk"].builder(spark, sf_dir).collect()
    top1 = {r.q_id: r.vec_id for r in adc if r.rk == 1}
    assert top1, "no queries scored"
    ok = 0
    for q, v in top1.items():
        d = sorted(
            (float(((emb[q] - x) ** 2).sum()), vid)
            for vid, x in emb.items()
            if vid != q
        )
        exact_ranks = {vid: i for i, (_, vid) in enumerate(d)}
        if exact_ranks[v] < len(d) * 0.2:
            ok += 1
    assert ok >= len(top1) * 0.6, f"ADC top-1 recall too low: {ok}/{len(top1)}"


def test_ewma_is_convex_combination_of_frame(spark, sf_dir):
    """The normalized EWMA must lie within [min, max] of its frame
    (weights sum to 1) — catches normalizer drift."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            (
                F.sum(F.round(F.col("value") * 1000000).cast("bigint"))
                / 1000000.0
            ).alias("v")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append(r.v)
    ewma = REGISTRY["win_ewma_bounded"].builder(spark, sf_dir).collect()
    got: dict[str, list] = {}
    for r in sorted(ewma, key=lambda r: (r.event_type, r.day)):
        got.setdefault(r.event_type, []).append(r.ewma)
    for et, vals in series.items():
        for i, e in enumerate(got[et]):
            frame = vals[max(0, i - 7) : i + 1]
            assert min(frame) - 1e-6 <= e <= max(frame) + 1e-6, (
                f"{et}[{i}]: ewma {e} outside frame [{min(frame)}, "
                f"{max(frame)}]"
            )


def test_luhn_constructive_check_digit(spark, sf_dir):
    """Constructive Luhn property: for any 11-digit prefix there is
    exactly one valid check digit, so ~1/10 of sequential ids validate;
    the census totals must match orders exactly and sit near 10%."""
    rows = REGISTRY["fn_luhn_checksum"].builder(spark, sf_dir).collect()
    n_orders = load(spark, sf_dir, "orders").count()
    total = sum(r.n_ids for r in rows)
    valid = sum(r.n_luhn_valid for r in rows)
    assert total == n_orders
    assert 0.05 < valid / total < 0.15


def test_minhash_calibration_is_roughly_monotone(spark, sf_dir):
    """More signature agreement should mean higher true Jaccard on
    average: the calibration curve's endpoints must be ordered and the
    overall rank correlation positive."""
    rows = sorted(
        REGISTRY["llm_minhash_calibration"].builder(spark, sf_dir).collect(),
        key=lambda r: r.n_matching,
    )
    assert len(rows) >= 3
    assert rows[-1].avg_exact_jaccard >= rows[0].avg_exact_jaccard
    xs = [r.n_matching for r in rows]
    ys = [r.avg_exact_jaccard for r in rows]
    n = len(xs)
    concordant = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if (xs[j] - xs[i]) * (ys[j] - ys[i]) > 0
    )
    discordant = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if (xs[j] - xs[i]) * (ys[j] - ys[i]) < 0
    )
    assert concordant > discordant, (xs, ys)


def test_token_budget_selection_is_greedy_optimal_prefix(spark, sf_dir):
    """The admitted set must be exactly the maximal quality-ranked
    prefix whose token total fits the budget — no skips, no overshoot."""
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.expr(
                "size(array_distinct(split(text, ' '))) * 1000000L "
                "div size(split(text, ' '))"
            ).alias("q"),
        )
        .collect()
    )
    ordered = sorted(docs, key=lambda r: (-r.q, r.doc_id))
    cum, selected = 0, []
    for r in ordered:
        cum += r.n_tokens
        if cum > 10000:
            break
        selected.append(r)
    want_tokens = sum(r.n_tokens for r in selected)
    got = (
        REGISTRY["llm_token_budget_selection"].builder(spark, sf_dir).collect()
    )
    assert sum(r.tokens_selected for r in got) == want_tokens
    assert sum(r.n_docs_selected for r in got) == len(selected)


def test_watermark_detector_fires_on_biased_stream(spark, sf_dir):
    """Constructive positive: a synthetic token stream that greedily
    picks green-list continuations must trip the z>4 watermark flag,
    while the natural fixture corpus must sit near the null."""
    import hashlib

    vocab = [f"w{i}" for i in range(50)]

    def is_green(prev, tok):
        return int(hashlib.md5(f"{prev}#{tok}".encode()).hexdigest()[:4], 16) % 2 == 0

    toks = ["w0"]
    for i in range(400):
        cands = [vocab[(i * 7 + j) % 50] for j in range(4)]
        green = [c for c in cands if is_green(toks[-1], c)]
        toks.append(green[0] if green else cands[0])
    wm_text = " ".join(toks)

    from noaa_etl_daily_spark import registry as reg_mod
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, wm_text)], "doc_id long, text string")
    pairs = df.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(lower(text), ' ')) - 1), "
                "i -> concat(split(lower(text), ' ')[i - 1], '#', "
                "split(lower(text), ' ')[i]))"
            )
        ).alias("pair"),
    )
    green = (
        F.conv(F.substring(F.md5("pair"), 1, 4), 16, 10).cast("bigint") % 2
        == 0
    )
    row = (
        pairs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(green, 1).otherwise(0)).alias("g"),
        )
        .collect()[0]
    )
    z = (row.g - 0.5 * row.n) / (0.25 * row.n) ** 0.5
    assert z > 4.0, f"biased stream not detected: z={z}"

    # natural corpus: the flag rate stays at the tail (repetitive
    # fixture docs can legitimately exceed z=4 — token pairs are not
    # i.i.d. — but the population must sit at the null overall)
    natural = (
        reg_mod.REGISTRY["llm_watermark_detection"]
        .builder(spark, sf_dir)
        .collect()
    )
    flag_rate = sum(r.watermark_flag for r in natural) / len(natural)
    assert flag_rate <= 0.05, f"natural flag rate {flag_rate}"
    mean_green = sum(r.green_fraction for r in natural) / len(natural)
    assert 0.4 < mean_green < 0.6, f"null green fraction {mean_green}"


def test_image_tiles_inventory_matches_python(spark, sf_dir):
    """The tile grid must be re-derivable from payload lengths alone:
    16 tiles per doc, geometry and digests matching a pure-Python
    re-computation."""
    import hashlib

    docs = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = (
        REGISTRY["llm_multimodal_image_tiles"].builder(spark, sf_dir).collect()
    )
    assert len(rows) == 16 * len(docs)
    import random

    for r in random.Random(7).sample(rows, 50):
        blob = docs[r.doc_id].encode("utf-8")
        side = max(int(len(blob) ** 0.5), 4)
        th = side // 4
        start = (r.tile_row * 4 + r.tile_col) * th * th
        t = blob[start : start + th * th]
        assert r.tile_bytes == len(t)
        assert r.tile_sha == hashlib.sha256(t).hexdigest()
