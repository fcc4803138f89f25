"""Generate CERTIFIED.md — the driver-certification ledger.

Maps every registered query key to its best driver status across all
CORRECTNESS_r*.json rounds (which round first certified it, or
``local-only`` if the driver has never sampled it) plus its oracle
class (oracled vs rows-only-by-design). Run at seal time:

    python tools_certified.py

The point (VERDICT r5, task 4): the reviewer should see the exact
driver-vs-local certification gap without re-deriving it from the
per-round JSONs.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from noaa_etl_daily_spark.registry import load_all  # noqa: E402


# Rows-only keys cannot hash-match a DuckDB oracle BY DESIGN (sketches,
# sampling, approximate search, iterative algorithms). Each one instead
# carries an oracle-equivalent PROPERTY test (exact-agreement vs a
# numpy/python reference, named error bounds, recall vs the exact twin)
# and, where the failure mode is shape-dependent, an adversarial-shape
# test. This mapping is AUDITED at generation time: every rows-only key
# in the registry must appear here, and every named test must exist in
# the named file — so the table in CERTIFIED.md can't go stale.
ROWS_ONLY_COVERAGE: dict[str, list[str]] = {
    "agg_approx_count_distinct": [
        "tests/test_properties.py::test_approx_count_distinct_within_tolerance",
    ],
    "agg_freq_items": [
        "tests/test_properties.py::test_freq_items_contains_all_truly_frequent",
        "tests/test_partition_invariance.py::test_freq_items_superset_holds_under_adversarial_layout",
    ],
    "agg_hll_sketch_merge": [
        "tests/test_properties.py::test_hll_sketch_merge_within_tolerance",
        "tests/test_fault_injection.py::test_task_retries_never_change_answers",
    ],
    "agg_theta_sketch_setops": [
        "tests/test_properties.py::test_theta_sketch_set_algebra_accuracy",
        "tests/test_fault_injection.py::test_task_retries_never_change_answers",
    ],
    "agg_kll_quantile_sketch": [
        "tests/test_properties.py::test_kll_quantile_sketch_rank_accuracy",
        "tests/test_partition_invariance.py::test_kll_rank_bound_holds_under_adversarial_layout",
    ],
    "llm_multimodal_image_tiles": [
        "tests/test_analytics.py::test_image_tiles_inventory_matches_python",
    ],
    "graph_pagerank_brands": [
        "tests/test_properties.py::test_pagerank_agrees_with_numpy_power_iteration",
        "tests/test_properties.py::test_pagerank_disconnected_components",
    ],
    "evt_markov_removal_attribution": [
        "tests/test_properties.py::test_markov_removal_attribution_matches_python_reference",
        "tests/test_properties.py::test_markov_attribution_absorbing_only_user",
    ],
    "evt_hll_sliding_uniques": [
        "tests/test_properties.py::test_hll_sliding_uniques_within_tolerance",
    ],
    "scan_csv_corrupt_permissive": [
        "tests/test_properties.py::test_corrupt_csv_dispositions_exact",
    ],
    "agg_approx_quantile": [
        "tests/test_partition_invariance.py::test_gk_tolerance_holds_under_adversarial_layout",
    ],
    "llm_sim_lsh_approx": [
        "tests/test_properties.py::test_lsh_approx_recall_vs_exact",
    ],
    "llm_sim_lsh_multiprobe": [
        "tests/test_properties.py::test_lsh_multiprobe_beats_single_probe_at_narrower_buckets",
    ],
    "llm_multimodal_frame_sample": [
        "tests/test_properties.py::test_frame_sample_inventory_matches_payload_lengths",
    ],
    "llm_sim_ivf_topk": [
        "tests/test_properties.py::test_ivf_topk_recall_vs_exact",
    ],
    "llm_sim_ivfpq_topk": [
        "tests/test_properties.py::test_ivfpq_topk_recall_and_refine_semantics",
    ],
    "llm_embed_pq_trained_codebook": [
        "tests/test_properties.py::test_pq_trained_codebook_matches_numpy_reference",
        "tests/test_properties.py::test_pq_trained_codebook_capture_beats_label_mean",
    ],
    "llm_sim_ivf_kmeans_topk": [
        "tests/test_properties.py::test_ivf_kmeans_topk_recall_vs_exact",
    ],
    "llm_sim_ivfpq_kmeans_topk": [
        "tests/test_properties.py::test_ivfpq_kmeans_refine_semantics",
    ],
    "llm_embed_pca_project": [
        "tests/test_properties.py::test_pca_projection_invariants",
        "tests/test_properties.py::test_pca_identical_vectors_zero_covariance",
        "tests/test_properties.py::test_pca_collinear_corpus_rank_one",
    ],
    "llm_embed_kmeans": [
        "tests/test_properties.py::test_kmeans_matches_same_init_numpy_lloyds",
        "tests/test_properties.py::test_kmeans_duplicate_points_empty_cell_collapse",
    ],
    "llm_bpe_train_merges": [
        "tests/test_properties.py::test_bpe_train_matches_python_reference",
        "tests/test_properties.py::test_bpe_train_tie_break_and_overlapping_merge",
    ],
    "llm_semdedup_cells_kmeans": [
        "tests/test_properties.py::test_semdedup_kmeans_assignment_matches_numpy",
        "tests/test_properties.py::test_semdedup_kmeans_dedup_half_exact_on_assignment",
        "tests/test_properties.py::test_semdedup_kmeans_balance_and_yield_vs_labels",
    ],
    "scan_row_group_skipping_census": [
        "tests/test_layout.py::test_row_group_census_sound_and_complete",
    ],
    "scan_zorder_rg_skipping_census": [
        "tests/test_layout.py::test_zorder_rg_census_sound_complete_and_beats_tssort",
    ],
    "agg_psi_kll_edges": [
        "tests/test_properties.py::test_psi_kll_edges_partition_and_accuracy",
        "tests/test_partition_invariance.py::test_psi_kll_bound_holds_under_adversarial_layout",
    ],
    "sink_partitioned_compaction_census": [
        "tests/test_layout.py::test_partitioned_compaction_census_and_untouched_bytes",
    ],
    "sink_compaction_sorted_census": [
        "tests/test_layout.py::test_compaction_sort_preservation_census",
    ],
    "llm_sim_ivf_partition_pruned": [
        "tests/test_properties.py::test_ivf_partition_pruned_matches_full_scan_and_recall",
        "tests/test_layout.py::test_ivf_partition_pruning_reads_only_probed_cells",
    ],
}


def audit_rows_only_coverage(rows_only: list[str]) -> None:
    """Fail generation if the mapping drifted from the registry or the
    test files — the executable form of the coverage claim."""
    missing = sorted(set(rows_only) - set(ROWS_ONLY_COVERAGE))
    extra = sorted(set(ROWS_ONLY_COVERAGE) - set(rows_only))
    if missing or extra:
        sys.exit(
            f"ROWS_ONLY_COVERAGE drift: uncovered={missing} stale={extra}"
        )
    for key, tests in ROWS_ONLY_COVERAGE.items():
        for t in tests:
            path, _, func = t.partition("::")
            full = os.path.join(_REPO, path)
            try:
                with open(full) as fh:
                    src = fh.read()
            except OSError:
                sys.exit(f"{key}: test file {path} does not exist")
            if f"def {func}(" not in src:
                sys.exit(f"{key}: {func} not found in {path}")


def driver_record() -> dict[str, tuple[int, str]]:
    """key -> (first round with a terminal GREEN row, status label)."""
    best: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in rows.items():
            if key in best:
                continue
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle" and row.get("spark_rows") is not None:
                best[key] = (rnd, "rows-only recorded")
            elif err is None and (
                row.get("hash_match") is True
                or (
                    row.get("hash_match") is None
                    and row.get("rows_match") is True
                )
            ):
                best[key] = (rnd, "full pass (rows+schema+hash)")
    return best


def main() -> None:
    registry = load_all()
    record = driver_record()
    certified = [k for k in registry if k in record]
    local_only = [k for k in registry if k not in record]
    oracled = [k for k, q in registry.items() if q.oracle is not None]
    rows_only = [k for k, q in registry.items() if q.oracle is None]

    lines = [
        "# CERTIFIED — driver-certification ledger",
        "",
        "Generated by `python tools_certified.py` from the registry and",
        "all `CORRECTNESS_r*.json` driver records. `driver rN` = first",
        "round the driver recorded a terminal green row (hash match for",
        "oracled keys; executed row count for rows-only-by-design keys).",
        "`local-only` = never sampled by the driver yet; every such key",
        "still passes the stricter local harness on every test run",
        "(tests/test_oracle.py value-diffs all oracled keys vs DuckDB;",
        "the seal ritual repeats that at sf0.1 — see README).",
        "",
        f"- registry: **{len(registry)}** keys "
        f"({len(oracled)} oracled, {len(rows_only)} rows-only-by-design)",
        f"- driver-certified: **{len(certified)}**",
        f"- local-only (driver backlog): **{len(local_only)}**",
        "",
        "| key | oracle class | driver status |",
        "|---|---|---|",
    ]
    for key in sorted(registry):
        cls = "oracled" if registry[key].oracle is not None else "rows-only"
        if key in record:
            rnd, label = record[key]
            status = f"driver r{rnd}: {label}"
        else:
            status = "local-only"
        lines.append(f"| {key} | {cls} | {status} |")

    audit_rows_only_coverage(rows_only)
    lines += [
        "",
        "## Rows-only keys: oracle-equivalent coverage",
        "",
        "Rows-only-by-design keys can't hash-match a DuckDB oracle",
        "(sketches, sampling, approximate search, iterative algorithms);",
        "each instead carries an oracle-equivalent property test",
        "(exact-agreement vs a numpy/python reference, named error",
        "bounds, recall vs the exact twin) and — where failure is",
        "shape-dependent — an adversarial-shape test. This table is",
        "generated from an AUDITED mapping: generation fails if a",
        "rows-only key is uncovered or a named test no longer exists.",
        "",
        "| key | oracle-equivalent / adversarial tests |",
        "|---|---|",
    ]
    for key in sorted(ROWS_ONLY_COVERAGE):
        tests = "<br>".join(f"`{t}`" for t in ROWS_ONLY_COVERAGE[key])
        lines.append(f"| {key} | {tests} |")

    lines += [
        "",
        "## Sketch nondeterminism contract (three axes, one bound)",
        "",
        "Live findings r8 (KLL under task retry) and r9 (HLL under the",
        "SortAggregate exec fallback) established that DataSketches",
        "estimates may move within their error bound when the physical",
        "merge tree changes. The durable contract consumers may pin to",
        "is therefore the NAMED BOUND, asserted identically on all",
        "three nondeterminism axes:",
        "",
        "| sketch | bound | layout axis | retry axis | exec-strategy axis |",
        "|---|---|---|---|---|",
        "| agg_hll_sketch_merge | ±5% of exact distinct | "
        "`test_partition_invariance.py::test_hll_named_bounds_hold_under_adversarial_layout` "
        "(bit-equal today; bound asserted) | "
        "`test_fault_injection.py` HLL named-bounds block (bit-equal "
        "today; bound asserted) | "
        "`test_physical_strategy_invariance.py::test_hll_named_bounds_hold_under_sort_aggregate` "
        "(MOVES here — r9 finding) |",
        "| agg_kll_quantile_sketch | ±3% rank of target quantile | "
        "`test_partition_invariance.py::test_kll_rank_bound_holds_under_adversarial_layout` | "
        "`test_fault_injection.py` KLL named-bounds block (MOVES here — "
        "r8 finding) | "
        "`test_physical_strategy_invariance.py` KLL bound param |",
        "",
        "Operational rule: pin downstream consumers to the sketch's",
        "error contract, never to exact estimate values across physical",
        "re-planning.",
    ]

    out = os.path.join(_REPO, "CERTIFIED.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(
        f"wrote {out}: {len(registry)} keys, "
        f"{len(certified)} driver-certified, {len(local_only)} local-only"
    )


if __name__ == "__main__":
    main()
