"""Declared relational query surface (SURVEY.md §2b, Q1-Q40).

The reference system (jilieryuyi/wing-binlog-go) delegates all analytics to
downstream consumers (`readme.md:40-43`); this module IS that analytic
surface, built entirely on Catalyst built-ins — no custom rules, no RDDs,
no Python UDFs in any hot path.

Each entry pairs a DataFrame-API builder with the equivalent DuckDB SQL
oracle. Cross-engine hash stability rules:

- Money/measure doubles are cast to DECIMAL before SUM (exact, associative,
  order-independent — a double sum would be partition-order dependent on a
  cluster), then ROUNDed and cast back to DOUBLE so both engines produce
  the identical IEEE value.
- Every computed column is aliased identically in both dialects.
- Every oracle query has a total ORDER BY on a unique key (or is a scalar
  aggregate) so LIMIT is deterministic.
- DuckDB integer SUMs return HUGEINT → oracle casts them to BIGINT to
  match Spark's LongType.

Scale notes (100 TB design): dimension joins (region/nation/customer vs
fact tables) use explicit ``broadcast()`` hints; fact-fact joins rely on
sort-merge + AQE skew handling; every scan is a plain parquet read so
filter pushdown + column pruning reach the file footer (verified in
tests/test_plans.py via ``explain``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from wing_binlog_go_spark.tables import read_table


class QuerySpec(NamedTuple):
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec(col, scale: int = 2):
    """Exact decimal for order-independent aggregation across partitions."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _money(agg_col, scale: int = 2):
    """ROUND + cast back to double → identical IEEE value in both engines."""
    return F.round(agg_col, scale).cast("double")


# ---------------------------------------------------------------------------
# Q1-Q5: scan / project / filter / predicates / null semantics
# ---------------------------------------------------------------------------


@register("q01_parquet_scan", "SELECT COUNT(*) AS cnt FROM lineitem")
def q01(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@register(
    "q02_projection",
    """SELECT l_orderkey, l_partkey FROM lineitem
       ORDER BY l_orderkey, l_linenumber LIMIT 100""",
)
def q02(spark, sf_dir):
    # Column pruning: the scan must read only 3 of 11 columns (ReadSchema).
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_partkey")
    )


@register(
    "q03_filter",
    """SELECT COUNT(*) AS cnt FROM lineitem
       WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06""",
)
def q03(spark, sf_dir):
    # Both predicates push down to the parquet scan (PushedFilters).
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.06)
    ).agg(F.count("*").alias("cnt"))


@register(
    "q04_in_predicate",
    """SELECT COUNT(*) AS cnt FROM orders
       WHERE o_orderpriority IN ('1-URGENT','2-HIGH')""",
)
def q04(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).agg(
        F.count("*").alias("cnt")
    )


@register(
    "q05_null_semantics",
    """SELECT COUNT(*) AS n_rows, COUNT(o.o_orderkey) AS n_orders
       FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey""",
)
def q05(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.agg(
        F.count("*").alias("n_rows"), F.count("o_orderkey").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Q6-Q15: joins
# ---------------------------------------------------------------------------


@register(
    "q06_inner_join",
    """SELECT c_mktsegment, COUNT(*) AS cnt
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)
def q06(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .orderBy("c_mktsegment")
    )


@register(
    "q07_broadcast_join",
    """SELECT n_name, COUNT(*) AS cnt
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
)
def q07(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    # nation is 25 rows at any SF — broadcast avoids shuffling the fact side.
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


@register(
    "q08_left_outer_join",
    """SELECT COUNT(*) AS cnt FROM customer LEFT JOIN orders
       ON c_custkey = o_custkey WHERE o_orderkey IS NULL""",
)
def q08(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q09_full_outer_join",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT c_custkey AS k FROM customer) a
       FULL JOIN (SELECT o_custkey AS k FROM orders) b ON a.k = b.k
       WHERE a.k IS NULL OR b.k IS NULL""",
)
def q09(spark, sf_dir):
    a = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    j = a.join(b, a.k == b.k, "full")
    return j.filter(a.k.isNull() | b.k.isNull()).agg(F.count("*").alias("cnt"))


@register(
    "q10_left_semi_join",
    """SELECT COUNT(*) AS cnt FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("cnt")
    )


@register(
    "q11_left_anti_join",
    """SELECT COUNT(*) AS cnt FROM part
       WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""",
)
def q11(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").agg(
        F.count("*").alias("cnt")
    )


@register(
    "q12_range_join",
    """SELECT COUNT(*) AS cnt FROM lineitem l JOIN orders o
       ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate""",
)
def q12(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # Equi-key carries the join; the range predicate is a post-join filter,
    # so this stays a sort-merge join (not a nested-loop) at any scale.
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
    ).agg(F.count("*").alias("cnt"))


@register(
    "q13_cross_join",
    "SELECT COUNT(*) AS cnt FROM region CROSS JOIN nation",
)
def q13(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).agg(F.count("*").alias("cnt"))


@register(
    "q14_tpch_q3",
    """SELECT l_orderkey,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2)
                   AS DOUBLE) AS rev,
              o_orderdate
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING'
         AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY rev DESC, l_orderkey LIMIT 10""",
)
def q14(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    # customer is the small side after the segment filter → broadcast;
    # orders⋈lineitem shuffles on orderkey (both filtered first — the
    # date predicates push to the scans).
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money(rev).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "rev", "o_orderdate")
    )


@register(
    "q15_asof_join",
    """SELECT e.event_id, MAX(o.o_orderdate) AS last_orderdate
       FROM events e JOIN orders o
         ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
       GROUP BY e.event_id ORDER BY e.event_id LIMIT 100""",
)
def q15(spark, sf_dir):
    # As-of join expressed as equi-join + range filter + MAX-dedupe.
    # (operators.asof_join has the scalable merge-based variant.)
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    return (
        e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
        .groupBy("event_id")
        .agg(F.max("o_orderdate").alias("last_orderdate"))
        .orderBy("event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q16-Q21: aggregation
# ---------------------------------------------------------------------------


@register(
    "q16_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_qty,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_base_price,
              CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_disc,
              COUNT(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q16(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # Hash aggregate with map-side partial aggregation. The sums run on
    # LONG fixed-point units, not decimals: per row the value is still
    # rounded by the same cast-to-decimal(18,s) as before (identical
    # per-row semantics), then scaled to an exact integer, so the long
    # SUM is exact and partition-order independent like the decimal sum
    # — but the agg buffer is a primitive long instead of a Decimal with
    # per-row overflow bookkeeping.  Measured (r12, sf0.1, noop sink):
    # 1.89 s → 0.74 s for this aggregate; value equality with the
    # decimal formulation asserted in test_plans.py.  Long capacity:
    # Σ|x|·10^s must stay < 2^63 — at 100 TB lineitem (~6·10^11 rows ×
    # ≤10^7 cents) that is ~6·10^18 < 9.2·10^18, inside range; the
    # decimal oracle SQL is unchanged.
    def _cents(col: str, s: int = 2):
        return (F.col(col).cast(f"decimal(18,{s})") * (10**s)).cast("long")

    def _uncents(sum_col, s: int = 2):
        # exact: long → decimal(38,0), × the exact decimal literal 10^-s
        return F.round(
            sum_col.cast("decimal(38,0)")
            * F.lit(10**-s).cast(f"decimal({s},{s})"),
            s,
        ).cast("double")

    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("_sq"),
            F.sum(_cents("l_extendedprice")).alias("_sp"),
            F.sum(_cents("l_discount", 4)).alias("_sd"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            _uncents(F.col("_sq")).alias("sum_qty"),
            _uncents(F.col("_sp")).alias("sum_base_price"),
            _uncents(F.col("_sd"), 4).alias("sum_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q17_count_distinct",
    "SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders",
)
def q17(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n_cust"))


@register("q18_approx_count_distinct", None)  # tolerance-checked, not hashed
def q18(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.approx_count_distinct("o_custkey", 0.02).alias("n_cust_approx"))


@register(
    "q19_rollup",
    """SELECT n_name, c_mktsegment, COUNT(*) AS cnt
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY ROLLUP(n_name, c_mktsegment)
       ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST, cnt""",
)
def q19(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .orderBy(
            F.asc_nulls_first("n_name"),
            F.asc_nulls_first("c_mktsegment"),
            F.asc("cnt"),
        )
    )


@register(
    "q20_having",
    """SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
       HAVING COUNT(*) > 5 ORDER BY c DESC, o_custkey LIMIT 50""",
)
def q20(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 5)
        .orderBy(F.desc("c"), F.asc("o_custkey"))
        .limit(50)
    )


@register(
    "q21_scalar_subquery",
    """SELECT COUNT(*) AS cnt FROM lineitem
       WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)""",
)
def q21(spark, sf_dir):
    # Catalyst decorrelates the scalar subquery into a broadcast of one row.
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT COUNT(*) AS cnt FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)"""
    )


# ---------------------------------------------------------------------------
# Q22-Q26: window functions / sort / top-k
# ---------------------------------------------------------------------------


@register(
    "q22_window_ranking",
    """SELECT o_custkey, o_orderkey, rn FROM
       (SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) t
       WHERE rn = 1 ORDER BY o_custkey LIMIT 100""",
)
def q22(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") == 1)
        .orderBy("o_custkey")
        .limit(100)
        .select("o_custkey", "o_orderkey", "rn")
    )


@register(
    "q23_window_lag",
    """SELECT o_orderkey,
              CAST(ROUND(LAG(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey), 2) AS DOUBLE)
              AS prev_price
       FROM orders ORDER BY o_orderkey LIMIT 100""",
)
def q23(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("prev_price", _money(F.lag(_dec("o_totalprice")).over(w)))
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "prev_price")
    )


@register(
    "q24_window_frame",
    """SELECT o_orderkey,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                   AS DOUBLE) AS run_sum
       FROM orders ORDER BY o_orderkey LIMIT 100""",
)
def q24(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        o.withColumn("run_sum", _money(F.sum(_dec("o_totalprice")).over(w)))
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "run_sum")
    )


@register(
    "q25_multi_key_sort",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       ORDER BY l_shipdate DESC, l_orderkey, l_linenumber LIMIT 100""",
)
def q25(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # Top-k: Spark plans TakeOrderedAndProject — no full sort at scale.
    return (
        li.orderBy(F.desc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber")
    )


@register(
    "q26_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM
       (SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
       WHERE rn <= 3 ORDER BY o_custkey, o_orderkey LIMIT 200""",
)
def q26(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Q27-Q28: set operations
# ---------------------------------------------------------------------------


@register(
    "q27_union",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT o_custkey AS k FROM orders
        UNION SELECT c_custkey AS k FROM customer) t""",
)
def q27(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct().agg(F.count("*").alias("cnt"))


@register(
    "q28_intersect",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT c_custkey FROM customer
        INTERSECT SELECT o_custkey FROM orders) t""",
)
def q28(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.intersect(o).agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Q29-Q35: scalar function surface
# ---------------------------------------------------------------------------


@register(
    "q29_string_functions",
    """SELECT COUNT(*) AS cnt FROM part
       WHERE p_type LIKE '%BRASS%'
         AND regexp_matches(lower(p_name), '^[a-z ]+$')""",
)
def q29(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%")
        & F.lower(F.col("p_name")).rlike("^[a-z ]+$")
    ).agg(F.count("*").alias("cnt"))


@register(
    "q30_date_functions",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y, COUNT(*) AS cnt
       FROM orders GROUP BY y ORDER BY y""",
)
def q30(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("y")
    )


@register(
    "q31_math_decimal",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_tax AS DECIMAL(18,4))), 2) AS DOUBLE)
              AS tax_total
       FROM lineitem""",
)
def q31(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        _money(F.sum(_dec("l_extendedprice") * _dec("l_tax", 4))).alias("tax_total")
    )


@register(
    "q32_conditional",
    """SELECT CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_urgent
       FROM orders""",
)
def q32(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("n_urgent")
    )


@register(
    "q33_array_functions",
    """SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words
       FROM documents""",
)
def q33(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.agg(F.sum(F.size(F.split("text", " "))).alias("n_words"))


@register(
    "q34_map_functions",
    """SELECT event_id, json_extract_string(props, '$.k') AS k_val
       FROM events ORDER BY event_id LIMIT 10""",
)
def q34(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.orderBy("event_id")
        .limit(10)
        .select(
            "event_id",
            F.element_at(
                F.from_json("props", "map<string,string>"), "k"
            ).alias("k_val"),
        )
    )


@register(
    "q35_json_functions",
    """SELECT event_id, json_extract_string(props, '$.k') AS k_json
       FROM events ORDER BY event_id LIMIT 10""",
)
def q35(spark, sf_dir):
    # Mirrors envelope parsing (reference O9: handler.go:83 JSON marshal /
    # client.go JSON parse) as a batch function.
    e = _t(spark, sf_dir, "events")
    return (
        e.orderBy("event_id")
        .limit(10)
        .select("event_id", F.get_json_object("props", "$.k").alias("k_json"))
    )


# ---------------------------------------------------------------------------
# Q36, Q40: dedup (exact) / sampling.  Q37-Q39 live in operators/ and
# functions/ and are registered by the entry module.
# ---------------------------------------------------------------------------


@register(
    "q36_exact_dedup",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) t""",
)
def q36(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey")
        .dropDuplicates()
        .agg(F.count("*").alias("cnt"))
    )


@register("q40_sampling", None)  # row-count tolerance, not hash-matched
def q40(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Q41+: extended surface — set ops, subqueries, pivot, statistical and
# ordered-set aggregates, lateral explode, filtered aggregation
# ---------------------------------------------------------------------------


@register(
    "q41_except",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT c_custkey FROM customer
        EXCEPT SELECT o_custkey FROM orders) t""",
)
def q41(spark, sf_dir):
    # subtract = SQL EXCEPT (set semantics): a key present on BOTH sides
    # is removed entirely regardless of multiplicity — exceptAll would
    # leave left-multiplicity minus right-multiplicity copies behind.
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.subtract(o).agg(F.count("*").alias("cnt"))


@register(
    "q42_in_subquery",
    """SELECT COUNT(*) AS cnt FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)""",
)
def q42(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """SELECT COUNT(*) AS cnt FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)"""
    )


@register(
    "q43_pivot",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
              CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS urgent,
              CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 END), 0) AS BIGINT) AS high,
              CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 END), 0) AS BIGINT) AS low
       FROM orders GROUP BY y ORDER BY y""",
)
def q43(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    pv = (
        o.groupBy(F.year("o_orderdate").alias("y"))
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .count()
    )
    return (
        pv.select(
            "y",
            F.coalesce(F.col("`1-URGENT`"), F.lit(0)).alias("urgent"),
            F.coalesce(F.col("`2-HIGH`"), F.lit(0)).alias("high"),
            F.coalesce(F.col("`5-LOW`"), F.lit(0)).alias("low"),
        )
        .orderBy("y")
    )


@register(
    "q44_stats_agg",
    """SELECT ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
              ROUND(var_samp(l_discount), 6) AS var_disc,
              ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qe
       FROM lineitem""",
)
def q44(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qe"),
    )


@register(
    "q45_percentiles",
    """SELECT ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
              ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90
       FROM orders""",
)
def q45(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
    )


@register(
    "q46_min_max_by",
    """SELECT n_name,
              max_by(c_name, c_acctbal) AS richest,
              min_by(c_name, c_acctbal) AS poorest
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
)
def q46(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", "c_acctbal").alias("richest"),
            F.min_by("c_name", "c_acctbal").alias("poorest"),
        )
        .orderBy("n_name")
    )


@register(
    "q47_filtered_agg",
    """SELECT COUNT(*) AS n_all,
              COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   FILTER (WHERE l_discount > 0.05), 2) AS DOUBLE) AS qty_discounted
       FROM lineitem""",
)
def q47(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        _money(
            F.sum(F.when(F.col("l_discount") > 0.05, _dec("l_quantity")))
        ).alias("qty_discounted"),
    )


@register(
    "q48_date_trunc",
    """SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS cnt
       FROM orders GROUP BY m ORDER BY m LIMIT 24""",
)
def q48(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("m")
        .limit(24)
    )


@register(
    "q49_string_agg",
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
       FROM nation JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name""",
)
def q49(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("r_name")
    )


@register(
    "q50_lateral_explode",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents WHERE doc_id < 10)
       SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
              toks[CAST(i AS INTEGER)] AS w
       FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)
       ORDER BY doc_id, pos""",
)
def q50(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w"),
        )
        .orderBy("doc_id", "pos")
    )


@register(
    "q52_tpch_q5",
    """SELECT n_name,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2)
                   AS DOUBLE) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name""",
)
def q52(spark, sf_dir):
    # TPC-H Q5 shape: 6-way join. Fact-fact (lineitem⋈orders) shuffles on
    # orderkey; every dimension (supplier/customer/nation/region chain)
    # broadcasts. The local-supplier predicate c_nationkey = s_nationkey
    # rides the join output as a filter.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_money(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q53_window_distribution",
    """SELECT o_orderkey,
              ntile(4) OVER w AS quartile,
              ROUND(percent_rank() OVER w, 6) AS pr,
              ROUND(cume_dist() OVER w, 6) AS cd
       FROM orders
       WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey LIMIT 100""",
)
def q53(spark, sf_dir):
    # r5 rework: Window.orderBy() with no partition moves the WHOLE
    # table to one task — the exact anti-pattern q80 already solved.
    # The order key (o_totalprice, o_orderkey) is tie-free, so rank ==
    # row_number == the range-partitioned two-phase running COUNT, and
    # ntile/percent_rank/cume_dist are pure expressions of (rn, n):
    #   percent_rank = (rn-1)/(n-1); cume_dist = rn/n (no ties);
    #   ntile(4): the first n%4 buckets hold floor(n/4)+1 rows.
    # Identical doubles to the window formulation → same oracle hash.
    from wing_binlog_go_spark.functions.envelope import with_running_total

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rn = with_running_total(
        o, ["o_totalprice", "o_orderkey"], F.lit(1), out="_rn"
    )
    d = rn.crossJoin(broadcast(o.agg(F.count("*").alias("_n"))))
    q = F.floor(F.col("_n") / 4)
    r = F.col("_n") % 4
    big = (q + 1) * r  # rows covered by the size-(q+1) buckets
    quartile = (
        F.when(F.col("_rn") <= big, F.floor((F.col("_rn") - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((F.col("_rn") - big - 1) / q) + 1)
    )
    pr = F.when(F.col("_n") > 1, (F.col("_rn") - 1) / (F.col("_n") - 1)).otherwise(
        F.lit(0.0)
    )
    return (
        d.select(
            "o_orderkey",
            quartile.cast("bigint").alias("quartile"),
            F.round(pr, 6).alias("pr"),
            F.round(F.col("_rn") / F.col("_n"), 6).alias("cd"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "q54_correlated_subquery",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
              AS total
       FROM lineitem l1
       WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                           FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""",
)
def q54(spark, sf_dir):
    # TPC-H Q17 shape — Catalyst decorrelates into an aggregate + join
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                  AS total
           FROM lineitem l1
           WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity)
                               FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""
    )


@register(
    "q55_first_last_value",
    """SELECT o_orderkey,
              first_value(o_orderkey) OVER w AS first_in_cust,
              last_value(o_orderkey) OVER w AS last_so_far
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       ORDER BY o_orderkey LIMIT 100""",
)
def q55(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_in_cust"),
            F.last("o_orderkey").over(w).alias("last_so_far"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "q56_union_all",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT o_custkey AS k FROM orders
        UNION ALL SELECT c_custkey AS k FROM customer) t""",
)
def q56(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.unionAll(c).agg(F.count("*").alias("cnt"))


@register(
    "q57_regexp_functions",
    """SELECT p_partkey,
              regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked,
              regexp_extract(p_name, '([a-z]+)', 1) AS first_word
       FROM part ORDER BY p_partkey LIMIT 100""",
)
def q57(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.regexp_replace("p_type", "[AEIOU]", "_").alias("masked"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


@register(
    "q58_bitwise",
    """SELECT CAST(SUM(l_orderkey & 255) AS BIGINT) AS and_sum,
              CAST(SUM(xor(l_orderkey, l_partkey)) AS BIGINT) AS xor_sum,
              CAST(MAX(l_orderkey << 1) AS BIGINT) AS shl_max
       FROM lineitem""",
)
def q58(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("and_sum"),
        F.sum(F.col("l_orderkey").bitwiseXOR(F.col("l_partkey"))).alias("xor_sum"),
        F.max(F.shiftleft("l_orderkey", 1)).alias("shl_max"),
    )


@register(
    "q59_nullsafe_equality",
    """SELECT COUNT(*) AS cnt FROM
       (SELECT c_custkey AS k FROM customer) a
       FULL JOIN (SELECT o_custkey AS k FROM orders GROUP BY o_custkey) b
       ON a.k IS NOT DISTINCT FROM b.k""",
)
def q59(spark, sf_dir):
    a = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    return a.join(b, a.k.eqNullSafe(b.k), "full").agg(F.count("*").alias("cnt"))


@register(
    "q60_array_hof",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                 FROM documents)
       SELECT doc_id,
              CAST(len(list_filter(toks, x -> length(x) > 4)) AS INTEGER) AS n_long,
              CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS chars
       FROM t ORDER BY doc_id LIMIT 100""",
)
def q60(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
            F.aggregate(
                F.transform(toks, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("chars"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@register(
    "q61_map_entries",
    """SELECT event_id,
              CAST(1 AS INTEGER) AS n_keys,
              'k' AS first_key
       FROM events ORDER BY event_id LIMIT 20""",
)
def q61(spark, sf_dir):
    # map construction + introspection: parse props into a map, then
    # map_keys/size. (props has the single key 'k' by corpus
    # construction, making the oracle a constant — the Spark side still
    # exercises the real map functions.)
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select(
            "event_id",
            F.size(F.map_keys(m)).alias("n_keys"),
            F.element_at(F.map_keys(m), 1).alias("first_key"),
        )
        .orderBy("event_id")
        .limit(20)
    )


@register(
    "q62_interval_arith",
    """SELECT o_orderkey,
              o_orderdate + INTERVAL 90 DAY AS due,
              CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                   AS INTEGER) AS days_to_y2k
       FROM orders ORDER BY o_orderkey LIMIT 50""",
)
def q62(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due"),
            F.datediff(
                F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")
            ).alias("days_to_y2k"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@register(
    "q63_recursive_cte",
    """WITH RECURSIVE seq(n) AS (
         SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 100)
       SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS cnt FROM seq""",
)
def q63(spark, sf_dir):
    # iteration inside the engine (Spark 4 WITH RECURSIVE) — the basis
    # for hierarchy/graph expansion without driver-side loops
    return spark.sql(
        """WITH RECURSIVE seq(n) AS (
             SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 100)
           SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS cnt FROM seq"""
    )


@register(
    "q64_values_inline",
    """SELECT v.code, COUNT(c_custkey) AS cnt
       FROM (VALUES ('BUILDING'), ('MACHINERY'), ('NOSEGMENT')) v(code)
       LEFT JOIN customer ON c_mktsegment = v.code
       GROUP BY v.code ORDER BY v.code""",
)
def q64(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    v = spark.createDataFrame(
        [("BUILDING",), ("MACHINERY",), ("NOSEGMENT",)], "code string"
    )
    return (
        v.join(c, c.c_mktsegment == v.code, "left")
        .groupBy("code")
        .agg(F.count("c_custkey").alias("cnt"))
        .orderBy("code")
    )


@register(
    "q65_ilike",
    """SELECT COUNT(*) AS cnt FROM part WHERE p_type ILIKE '%brass%'""",
)
def q65(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_type").ilike("%brass%")).agg(
        F.count("*").alias("cnt")
    )


@register(
    "q66_bigrams",
    """WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
       b AS (SELECT toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)] AS bg
             FROM t, UNNEST(range(1, len(toks))) AS r(i))
       SELECT bg, COUNT(*) AS c FROM b GROUP BY bg ORDER BY c DESC, bg LIMIT 25""",
)
def q66(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    # guard single-token docs: sequence(1, 0) DESCENDS to [1, 0] and
    # element_at(toks, 0) throws even with ANSI off
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("bg"))
        .limit(25)
    )


@register(
    "q67_histogram",
    """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                        WHEN o_totalprice >= 500000 THEN 11
                        ELSE CAST(FLOOR(o_totalprice / 50000) AS INTEGER) + 1
                   END AS INTEGER) AS bucket,
              COUNT(*) AS cnt
       FROM orders GROUP BY bucket ORDER BY bucket""",
)
def q67(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(10))
            .cast("int")
            .alias("bucket")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "q68_sessionization",
    """WITH gaps AS (
         SELECT user_id, ts,
                CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                       OR LAG(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_session
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), sess AS (
         SELECT user_id,
                CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM gaps
       )
       SELECT user_id, session_id, COUNT(*) AS n_events
       FROM sess GROUP BY user_id, session_id
       ORDER BY user_id, session_id LIMIT 200""",
)
def q68(spark, sf_dir):
    # batch sessionization via gap flags + running sum — the window-
    # function formulation of streaming.stateful.sessionize
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap > 1800, 1).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("new_session", new_sess)
        .withColumn("session_id", F.sum("new_session").over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "session_id")
        .limit(200)
    )


@register(
    "q69_funnel",
    """WITH firsts AS (
         SELECT user_id,
                MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
                MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
                MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
         FROM events GROUP BY user_id
       )
       SELECT COUNT(*) AS n_users,
              CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
              CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                            THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
              CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             AND t_buy > t_click
                            THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
       FROM firsts""",
)
def q69(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    clicked = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("clicked_after_view"),
        F.sum(
            F.when(clicked & (F.col("t_buy") > F.col("t_click")), 1).otherwise(0)
        ).alias("full_funnel"),
    )


@register(
    "q70_retention",
    """WITH weeks AS (
         SELECT DISTINCT user_id,
                CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) // 7
                     AS INTEGER) AS week
         FROM events
       )
       SELECT w.week, COUNT(DISTINCT w.user_id) AS retained
       FROM weeks w JOIN (SELECT DISTINCT user_id FROM weeks WHERE week = 0) c
         ON w.user_id = c.user_id
       GROUP BY w.week ORDER BY w.week LIMIT 10""",
)
def q70(spark, sf_dir):
    # cohort retention: users active in week 0 still active in week N
    e = _t(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7
    ).cast("int")
    weeks = e.select("user_id", week.alias("week")).distinct()
    cohort = weeks.filter(F.col("week") == 0).select("user_id").distinct()
    return (
        weeks.join(cohort, "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("retained"))
        .orderBy("week")
        .limit(10)
    )


@register(
    "q71_unpivot",
    """SELECT l_orderkey, l_linenumber, measure, val FROM
       (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        FROM lineitem)
       UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
       ORDER BY l_orderkey, l_linenumber, measure LIMIT 150""",
)
def q71(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
        .limit(150)
    )


@register(
    "q72_struct_ops",
    """SELECT o_orderkey,
              struct_extract(struct_pack(k := o_orderkey, p := o_totalprice), 'k')
                AS k_out,
              ROUND(struct_extract(struct_pack(k := o_orderkey, p := o_totalprice),
                                   'p'), 2) AS p_out
       FROM orders ORDER BY o_orderkey LIMIT 50""",
)
def q72(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    s = F.struct(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
    return (
        o.select(
            "o_orderkey",
            s.getField("k").alias("k_out"),
            F.round(s.getField("p"), 2).alias("p_out"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@register(
    "q74_time_bucket",
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
              COUNT(*) AS cnt,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
       FROM events GROUP BY bucket_start ORDER BY bucket_start LIMIT 100""",
)
def q74(spark, sf_dir):
    # batch twin of the S2 tumbling window — window().start must equal
    # DuckDB's time_bucket for epoch-aligned intervals, which makes the
    # streaming window semantics oracle-checkable
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").start.alias("bucket_start"))
        .agg(
            F.count("*").alias("cnt"),
            _money(F.sum(_dec("value", 4)), 4).alias("sum_value"),
        )
        .orderBy("bucket_start")
        .limit(100)
    )


@register(
    "q75_date_spine",
    """WITH spine AS (
         SELECT CAST(d AS TIMESTAMP) AS day
         FROM generate_series(TIMESTAMP '1995-01-01 00:00:00',
                              TIMESTAMP '1995-01-31 00:00:00',
                              INTERVAL '1 day') AS t(d)
       )
       SELECT day, COUNT(o_orderkey) AS cnt
       FROM spine LEFT JOIN orders ON date_trunc('day', o_orderdate) = day
       GROUP BY day ORDER BY day""",
)
def q75(spark, sf_dir):
    # gap-filling date spine: sequence+explode generates the calendar,
    # left join keeps empty days at zero
    o = _t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("1995-01-31").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return (
        spine.join(o, F.date_trunc("day", o.o_orderdate) == spine.day, "left")
        .groupBy("day")
        .agg(F.count("o_orderkey").alias("cnt"))
        .orderBy("day")
    )


@register(
    "q76_cube_grouping",
    """SELECT n_name, c_mktsegment,
              CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
              CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
              COUNT(*) AS cnt
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY CUBE(n_name, c_mktsegment)
       ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST, cnt""",
)
def q76(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("n_name", "c_mktsegment")
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.count("*").alias("cnt"),
        )
        .orderBy(
            F.asc_nulls_first("n_name"),
            F.asc_nulls_first("c_mktsegment"),
            F.asc("cnt"),
        )
        .select("n_name", "c_mktsegment", "g_nation", "g_seg", "cnt")
    )


@register(
    "q77_range_frame",
    """SELECT o_orderkey,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)
                   AS DOUBLE) AS rolling_30d
       FROM orders ORDER BY o_orderkey LIMIT 100""",
)
def q77(spark, sf_dir):
    # value-based RANGE frame (vs q24's ROWS frame): a true 30-day rolling
    # sum — rows at equal order values share the frame
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return (
        o.withColumn("rolling_30d", _money(F.sum(_dec("o_totalprice")).over(w)))
        .orderBy("o_orderkey")
        .limit(100)
        .select("o_orderkey", "rolling_30d")
    )


@register(
    "q51_null_handling",
    """SELECT COUNT(*) AS cnt,
              CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS zero_disc,
              ROUND(COALESCE(MAX(NULLIF(l_discount, 0.0)), -1), 2) AS max_nonzero
       FROM lineitem""",
)
def q51(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    nz = F.nullif("l_discount", F.lit(0.0))
    return li.agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(nz.isNull(), 1).otherwise(0)).alias("zero_disc"),
        F.round(F.coalesce(F.max(nz), F.lit(-1.0)), 2).alias("max_nonzero"),
    )
