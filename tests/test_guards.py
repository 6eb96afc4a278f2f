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
    FRESH: round 13 (optimization round 2) holds ONLY oracled keys —
    the one r12 ``no_oracle`` row (q150_knn_graph; property twin =
    RECALL knn_graph_at_k5) rotates out — leading with the 18
    r8-vintage relational shapes the r12 layout promised to rotate in,
    then the oracled twins of every operator family the r13
    construction rewrite touched, the oracled headline-bench keys, and
    text-family keys on the shared tokenizer/shingle builders.  No
    operator module may silently fail to import (no-silent-caps)."""
    from wing_binlog_go_spark import registry

    qs = registry.all_queries()
    assert registry.failed_modules == {}
    window = list(qs)[:50]
    # (a) the 18 r8-vintage relational shapes lead
    assert window[:18] == [
        "q01_parquet_scan",
        "q02_projection",
        "q03_filter",
        "q04_in_predicate",
        "q05_null_semantics",
        "q06_inner_join",
        "q07_broadcast_join",
        "q08_left_outer_join",
        "q09_full_outer_join",
        "q10_left_semi_join",
        "q11_left_anti_join",
        "q13_cross_join",
        "q19_rollup",
        "q20_having",
        "q21_scalar_subquery",
        "q23_window_lag",
        "q25_multi_key_sort",
        "q27_union",
    ]
    # (b) every key the r13 construction rewrite touched is re-verified
    for touched in (
        "q37c_ngram_jaccard", "q37d_dedup_survivors",
        "q37f_minhash_rolling", "q37g_simhash_rolling",
        "q157_fuzzy_decontamination", "q38e_diversity_sample",
        "q38j_ann_ivf_frozen", "q38k_ann_lsh_frozen",
        "q38l_ann_pq_frozen", "q38m_ann_ivfpq_frozen", "q39w_span_dedup",
    ):
        assert touched in window, touched
    # (c) the oracled headline-bench keys (this round's optimization
    # targets) are all certified by the driver
    for headline in (
        "q12_range_join", "q14_tpch_q3", "q15_asof_join",
        "q15b_asof_merge", "q16_tpch_q1", "q17_count_distinct",
        "q22_window_ranking", "q24_window_frame", "q36_exact_dedup",
        "q39_word_count", "q39d_quality_score", "q52_tpch_q5",
        "q68_sessionization",
    ):
        assert headline in window, headline
    # every in-window key is exactly checkable — zero no_oracle rows
    for name in window:
        assert qs[name].oracle is not None, name
    # keys holding fresh r11/r12 rows wait their turn
    for deferred in (
        "q150_knn_graph", "q51_null_handling", "q55_first_last_value",
        "q98_tpch_q8", "q104_lateral_join", "q139_pagerank",
        "q153_knn_coreset", "q26_topk_per_group",
        "q37_minhash_dedup", "q38_ann_brute_force",
    ):
        assert deferred not in window, deferred
    # (d) the graded operator families keep in-window representation
    for family in ("q37", "q38", "q39", "q5", "q10", "q15"):
        assert any(k.startswith(family) for k in window), family
    # (e) the priority block fills the window exactly
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
