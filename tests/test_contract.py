"""The driver-contract gate as a pytest: every queries() entry vs its
DuckDB oracle at sf0.001 (fast).  tools/check_contract.py runs the same
comparison at sf0.01 — this test exists so a plain `pytest` run catches
query/oracle drift immediately."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR


def _params():
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    return sorted(entrymod.queries().keys()), oracles


QUERY_NAMES, ORACLES = _params()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    from tools.check_contract import compare

    from tools.check_contract import nonscalar_columns

    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    bad = nonscalar_columns(sdf)
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — the driver's "
        f"canonicalizer cannot hash array/map/struct cells (round-5 red "
        f"row); explode or encode to scalars in the query registration")
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only (no oracle) — covered by recall tests")
    duck_pdf = duck.sql(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


def test_driver_window_covers_every_family():
    """The driver's CORRECTNESS gate reads only the FIRST 50 queries()
    entries (established round 1).  Pin the curated window: every operator
    family represented, and everything inside it oracle-backed except the
    two by-design rows-only ANN paths."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    window = names[:50]
    # round-11 rotation: the embedding near-dup family is represented by
    # dedup_embedding_clusters_t09 (same SRP-LSH candidate pipeline at
    # the production threshold, plus the CC closure); streaming by the
    # end-to-end stateful sessionize row; five round-10 analytics
    # families entered (gini / gopher / k-anonymity / HHI / session
    # percentiles).  Round-12 rotation: dedup_span_rewrite (span-level
    # corpus rewrite) displaces dedup_jaccard_prefix (dedup keeps six
    # rows) and dsir_importance_weights (data selection) displaces
    # ewma_user_value (time-series keeps cusum / resample / streaks).
    # Round-13 rotation: bpe_encode_corpus (strictly richer: encode
    # subsumes train) displaces token_count_bpe, and
    # temperature_mix_sources (corpus-mixing family) displaces
    # resample_user_hourly (time-series keeps cusum_stream / streaks /
    # sessionize).  Round-13 late rotation: winnow_overlap_pairs (NEW
    # fingerprinting/copy-detection family) displaces
    # data_quality_profile (quality analytics keeps five rows) and
    # nb_lang_confusion (NEW trained-classifier family) displaces
    # deterministic_sample (sampling keeps temperature_mix_sources).
    # Round-13 session-3 rotation: kmeans_centroids (NEW distributed
    # iterative-trainer family under the bitwise unrolled-CTE oracle)
    # displaces sessionize_events — sessionization keeps the strictly
    # richer sessionize_stream_stateful (identical oracle SQL).
    # Round-13 session-4 rotation: embedding_pca_residuals (NEW fitted
    # subspace-outlier family), label_prop_neardup (NEW semi-supervised
    # graph family), holt_user_forecast (NEW level+trend smoothing
    # family), benford_totalprice_audit (NEW forensic-audit family)
    # displace mr_task1_mean, dedup_cc_clusters (CC closure stays
    # exercised via dedup_embedding_clusters_t09's cluster stage),
    # hhi_supplier_concentration and session_duration_percentiles
    # (concentration + percentile analytics keep gini_doclen_by_source
    # and k_anonymity_audit in-window).
    # Round-13 session-5 rotation: roc_auc_doclen_en and
    # chao1_vocab_by_source (the NEW evaluation-statistics family —
    # exact no-global-sort rank statistics) displace
    # embedding_quantize_int8 (embedding family keeps three in-window
    # rows) and funnel_conversion (ordered-event analytics keeps four).
    # Round-13 session-6 rotation: km_conversion_curve (NEW survival
    # family), hybrid_search_rrf (NEW retrieval-fusion family — its
    # plan CONTAINS brute_force_topk and the BM25 scorer), and
    # bootstrap_doclen_ci (NEW resampling-inference family) displace
    # gini_doclen_by_source (quality analytics keeps k_anonymity/rfm/
    # benford/chao1), sim_topk_bruteforce (embedding keeps t09 +
    # pca_residuals + the hybrid's embedded brute force), and
    # diff_orders_snapshots (temporal tables keep scd2).
    # Session-6 late swap: conformal_novelty_gate (NEW calibrated-gating
    # family) displaces interval_join_attribution (temporal joins keep
    # asof_join_purchase_click; nearest/overlap/interval hash-exact
    # locally).  Displaced rows re-register just past the window.
    # Round-14 rotation: fdr_doclen_en_by_source (NEW multiple-testing
    # family: MW screen → erfc p-values → BH step-up) displaces
    # roc_auc_doclen_en — the strictly-richer-row precedent (fdr's
    # oracle contains the full per-source MW z machinery); evaluation
    # statistics keep chao1 in-window and the AUC row re-registers
    # immediately past the window.
    # Round-14 session-7 rotation: zorder_layout_audit (NEW data-layout
    # / multi-dimensional data-skipping family) displaces dedup_lines
    # (corpus-rewrite dedup keeps dedup_span_rewrite, plus
    # exact/minhash/t09), and confseq_purchase_rate_daily (NEW
    # anytime-valid sequential-monitoring family, streaming twin in
    # streaming.stream_confseq) displaces mr_unpack_only (unpack keeps
    # mr_melt + the Arrow UnpackM path mr_filter_mapinpandas).  Both
    # displaced rows re-register immediately past the window.
    for must_have in [
        "zorder_layout_audit", "confseq_purchase_rate_daily",
        "mr_fold_vocab", "mr_group_reduce_keyed", "mr_product_median",
        "dedup_exact", "dedup_minhash",
        "dedup_span_rewrite", "rfm_customer_segments",
        "activity_streaks", "dsir_importance_weights",
        "record_linkage_customers", "temperature_mix_sources",
        "dedup_embedding_clusters_t09", "text_stats",
        "scd2_user_event_history",
        "hybrid_search_rrf", "bpe_encode_corpus", "multimodal_features",
        "km_conversion_curve", "bootstrap_doclen_ci",
        "winnow_overlap_pairs", "nb_lang_confusion",
        "cusum_stream_stateful", "kmeans_centroids",
        "asof_join_purchase_click", "window_topk_per_group",
        "conformal_novelty_gate",
        "rollup_region_nation", "salted_aggregation",
        "sessionize_stream_stateful", "q1_pricing_summary",
        "k_anonymity_audit",
        "gopher_repetition_signals",
        "embedding_pca_residuals", "label_prop_neardup",
        "holt_user_forecast", "benford_totalprice_audit",
        "fdr_doclen_en_by_source", "chao1_vocab_by_source",
    ]:
        assert must_have in window, f"{must_have} fell outside the driver window"
    no_oracle = [n for n in window if n not in ORACLES]
    # IVF's driver-side kmeans cannot be mirrored in SQL; everything else
    # in the window is oracle-backed (LSH got its exact oracle in round 2)
    assert set(no_oracle) <= {"sim_topk_ivf"}, no_oracle


def test_priority_window_invariants():
    """Curation discipline: the priority list has no duplicate names (a
    dup would silently shrink the verified window) and at least 50
    entries so the driver window is fully curated, never
    registration-order filler."""
    from map_reduce_folds_spark.queries import _PRIORITY

    assert len(set(_PRIORITY)) == len(_PRIORITY)
    assert len(_PRIORITY) >= 50


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"k", "sum_price"}


def test_driver_window_exact_composition():
    """Pin the EXACT curated 50-row driver window.  Any change to
    registration order or _PRIORITY must update this list deliberately —
    round 5's only red row came from an unvetted window swap, so window
    composition changes should always be explicit in a diff."""
    import __spark_entry__ as entrymod

    assert list(entrymod.queries())[:50] == ['mr_readme_sum', 'mr_applicative', 'mr_melt', 'zorder_layout_audit', 'mr_fold_vocab', 'k_anonymity_audit', 'mr_group_reduce_keyed', 'mr_concat_fold', 'km_conversion_curve', 'confseq_purchase_rate_daily', 'mr_filter_mapinpandas', 'rfm_customer_segments', 'mr_product_median', 'activity_streaks', 'mr_group_reduce_ordered', 'text_stats', 'bpe_encode_corpus', 'embedding_pca_residuals', 'label_prop_neardup', 'holt_user_forecast', 'benford_totalprice_audit', 'dedup_exact', 'record_linkage_customers', 'dedup_minhash', 'dedup_span_rewrite', 'dedup_embedding_clusters_t09', 'hybrid_search_rrf', 'dsir_importance_weights', 'bloom_pruned_join', 'pagerank_event_types', 'multimodal_features', 'bootstrap_doclen_ci', 'scd2_user_event_history', 'nb_lang_confusion', 'gopher_repetition_signals', 'winnow_overlap_pairs', 'sketch_union_hll', 'cusum_stream_stateful', 'asof_join_purchase_click', 'conformal_novelty_gate', 'window_topk_per_group', 'kmeans_centroids', 'rollup_region_nation', 'salted_aggregation', 'sessionize_stream_stateful', 'q1_pricing_summary', 'q9_product_profit', 'fdr_doclen_en_by_source', 'chao1_vocab_by_source', 'temperature_mix_sources']


def test_local_gate_freshness():
    """The recorded full-registry gate must cover the registry at HEAD
    (r13 process finding: the gate closed one commit stale, missing a
    query registered after it ran).  Red here means: re-run
    `python tools/check_contract.py /root/testdata/sf0.01` before
    closing the session."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LOCAL_CORRECTNESS.json")
    import __spark_entry__ as entrymod

    with open(path) as f:
        rec = json.load(f)
    recorded = set(rec["queries"])
    registry = set(entrymod.queries())
    missing = sorted(registry - recorded)
    stale = sorted(recorded - registry)
    assert not missing, (
        f"queries registered after the last full gate run: {missing} — "
        "re-run tools/check_contract.py (full, no query filter)")
    assert not stale, f"gate records queries no longer registered: {stale}"
    assert rec["fail"] == 0
