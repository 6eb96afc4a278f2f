"""Guard tests: sf_dir is respected (no hardcoded paths), session
factory applies the scale configs, approx sketches stay in tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.registry import all_queries
from wing_binlog_go_spark.tables import read_table

_Q = all_queries()


def test_queries_respect_sf_dir(spark):
    """Same query, different scale factor → different result: catches any
    accidentally hardcoded data path in a query builder."""
    small = _Q["q01_parquet_scan"].spark(spark, "/root/testdata/sf0.001").collect()[0].cnt
    big = _Q["q01_parquet_scan"].spark(spark, "/root/testdata/sf0.01").collect()[0].cnt
    assert small != big and big > small


def test_entry_runs_on_smallest_sf(spark):
    import __spark_entry__ as mod

    rows = mod.entry(spark).collect()
    assert len(rows) > 0


def test_session_factory_configs(spark):
    # NOTE: ansi/timeZone are also pinned by read_table on any session,
    # so assert here only what the FACTORY uniquely provides
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert spark.conf.get("spark.sql.parquet.filterPushdown") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"


def test_oracle_harness_detects_mismatches(spark, sf_dir):
    """Meta-test: the comparator must FAIL on wrong values/counts/columns
    — otherwise every 'MATCH' in this suite is meaningless."""
    from tests.oracle_harness import compare, duckdb_conn

    con = duckdb_conn(sf_dir)
    df = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ok, _ = compare(df, con, "SELECT n_nationkey, n_name FROM nation")
    assert ok
    ok, msg = compare(df, con, "SELECT n_nationkey, lower(n_name) AS n_name FROM nation")
    assert not ok and "value mismatch" in msg
    ok, msg = compare(df, con, "SELECT n_nationkey, n_name FROM nation LIMIT 3")
    assert not ok and "row count" in msg
    ok, msg = compare(df, con, "SELECT n_nationkey AS wrong, n_name FROM nation")
    assert not ok and "column mismatch" in msg
    con.close()


def test_queries_survive_ansi_non_utc_session(spark, sf_dir):
    """The driver calls builders with ITS session — Spark 4 defaults
    ANSI on, and host timezone is arbitrary. read_table must pin both."""
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.ansi.enabled", "true")
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")

    from pyspark.sql import functions as F2

    from tests.oracle_harness import compare, duckdb_conn

    con = duckdb_conn(sf_dir)
    for name in ("q30_date_functions", "q34_map_functions", "q74_time_bucket"):
        spec = _Q[name]
        ok, msg = compare(spec.spark(hostile, sf_dir), con, spec.oracle)
        assert ok, f"{name} under hostile session: {msg}"
    con.close()
    # both confs actually pinned — not just timezone
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
    assert hostile.conf.get("spark.sql.ansi.enabled") == "false"
    # and the permissive semantics genuinely hold: an op that THROWS
    # under ANSI (element_at on a missing map key) returns NULL
    probe = read_table(hostile, sf_dir, "events").select(
        F2.element_at(
            F2.from_json("props", "map<string,string>"), "no_such_key"
        ).alias("v")
    )
    assert probe.limit(1).collect()[0].v is None


def test_percentile_approx_tolerance(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    exact, approx = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("e"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias("a"),
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.02


def test_registry_priority_window_and_no_failed_modules():
    """The driver verifies queries in registration order with a capped
    window (50/round). Coverage closed at round 4 (every registered
    query holds a driver CORRECTNESS row); the window keeps evidence
    FRESH: round 11 leads with the 15 pre-r7 ledger keys (the r10
    verdict's ask #2 drain list), then 34 of the 50 r7-vintage keys —
    the q37/q38 production forms, the TPC-H q84–q97 band, the
    q143–q149 band, the q39 curation forms, q80 — plus one slot for
    the new q168b oracle twin (q83 rotates to r12). No operator
    module may silently fail to import (no-silent-caps)."""
    from wing_binlog_go_spark import registry

    qs = registry.all_queries()
    assert registry.failed_modules == {}
    window = list(qs)[:50]
    # (a) the 15 pre-r7 ledger keys lead
    assert window[:15] == [
        "q39r_winnowing",
        "q39s_bigram_lm",
        "q39z_bloom_decontamination",
        "q67_histogram",
        "q68_sessionization",
        "q69_funnel",
        "q70_retention",
        "q71_unpivot",
        "q72_struct_ops",
        "q74_time_bucket",
        "q75_date_spine",
        "q76_cube_grouping",
        "q77_range_frame",
        "q78_grouped_dedup",
        "q79_top_terms_per_lang",
    ]
    # (b) the r7-vintage refresh band fills the window
    for stale in (
        "q37_minhash_dedup", "q37c_ngram_jaccard", "q38_ann_brute_force",
        "q38b_ann_lsh", "q38d_ann_ivf", "q38f_ann_pq",
        "q38g_semantic_dedup",
        "q84_tpch_q10", "q85_point_in_time_join", "q86_tpch_q18",
        "q87_tpch_q7", "q88_tpch_q13", "q89_tpch_q16", "q90_tpch_q17",
        "q91_tpch_q19", "q92_tpch_q22", "q93_tpch_q4", "q94_tpch_q6",
        "q95_tpch_q14", "q96_tpch_q15", "q97_tpch_q21",
        "q143_interval_overlap", "q144_weighted_sample_per_group",
        "q145_ccnet_mix", "q146_quality_classifier",
        "q147_classifier_filtered_corpus", "q148_ngram_novelty",
        "q149_cms_heavy_hitters",
        "q39h_tfidf", "q39i_decontamination", "q39m_sequence_pack",
        "q39t_heavy_hitters", "q39v_source_cap",
        "q80_quantile_bins", "q168b_weighted_apss_sparse",
    ):
        assert stale in window, stale
    # keys holding fresh r8/r9/r10 rows wait their turn, as do the 16
    # r7-vintage leftovers (q51, q55–q66, q81, q82, q83 — rotate to
    # r12; one slot yielded to the new q168b, the r10 q111b precedent)
    for deferred in (
        "q14_tpch_q3", "q16_tpch_q1", "q38n_semantic_dedup_frozen",
        "q39x_bpe_train", "q39y_bpe_tokenize", "q112_fuzzy_edit_join",
        "q111_multimodal_near_dup", "q52_tpch_q5",
        "q168_weighted_apss", "q111b_multimodal_near_dup_frozen",
        "q117_apss_join", "q125_bm25",
        "q51_null_handling", "q55_first_last_value", "q66_bigrams",
        "q81_doc_length_curation", "q82_cross_lingual_mix",
        "q83_event_dedup_window",
        "q150_knn_graph", "q156_trustrank",
    ):
        assert deferred not in window, deferred
    # (c) the graded operator families keep in-window representation
    for family in ("q37", "q38", "q39", "q8", "q14", "q149"):
        assert any(k.startswith(family) for k in window), family
    # (d) the priority block fills the window exactly — nothing with a
    # fresh r7/r8/r9 row sneaks in ahead of stale evidence
    assert len(registry._PRIORITY) == 50
    assert window == list(registry._PRIORITY)
    # priority list stays consistent with what's actually registered
    assert set(registry._PRIORITY) <= set(qs)


def test_duplicate_query_name_fails_loudly(monkeypatch):
    """A module re-registering an existing query name must be recorded
    as a failed module (it would otherwise silently shadow the other
    implementation), and the original registration must survive."""
    from wing_binlog_go_spark import registry
    from wing_binlog_go_spark.operators import dedup

    impostor = next(iter(dedup.QUERIES.values()))
    monkeypatch.setitem(dedup.QUERIES, "q01_parquet_scan", impostor)
    qs = registry.all_queries()
    assert any("operators.dedup" in m for m in registry.failed_modules)
    assert any("q01_parquet_scan" in v for v in registry.failed_modules.values())
    assert "q01_parquet_scan" in qs  # the relational original survives


def test_events_fixture_user_ts_unique(spark):
    """q108/q110 downsample with max_by(value, ts), which is only
    deterministic because (user_id, ts) is unique in the events
    fixture at every scale — if a regenerated fixture ever violates
    this, fail HERE with a clear message, not as an oracle hash
    mismatch."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = read_table(spark, sf, "events")
        total = e.count()
        distinct = e.select("user_id", "ts").distinct().count()
        assert total == distinct, (
            f"{sf}: (user_id, ts) collides ({total} rows, {distinct} "
            "distinct) — q108/q110's max_by(value, ts) key needs a "
            "tie-breaker"
        )
