"""Metadata-only table statistics via parquet aggregate pushdown.

At 100 TB, ``SELECT min(x), max(x), count(*)`` answered by scanning is
a full-table read; answered from parquet ROW-GROUP FOOTER STATS it is
an O(#row-groups) metadata read — the same stats Z-order data skipping
consumes (`operators/clustering.py`), surfaced as a query. Spark's DSv2
parquet reader implements exactly this (`PushedAggregation` in the
scan) but only on the v2 path with ``spark.sql.parquet.
aggregatePushdown`` on; the repo's default reader is v1 (the
`useV1SourceList` default), so this operator opens the table through an
ISOLATED child session (``spark.newSession()`` — shared SparkContext,
separate SQL conf) rather than mutating the caller's session: flipping
``useV1SourceList`` globally would silently change every other query's
scan path.

Pushdown preconditions (enforced loudly): no filters before the
aggregate, top-level non-nested columns, MIN/MAX/COUNT only — the
DSv2 rule set. Values are EXACT (footer stats are exact per row group),
so the result is DuckDB-oracled like any other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wing_binlog_go_spark.plans.relational import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def footer_stats_agg(
    spark: SparkSession,
    path: str,
    min_cols: list[str] = (),
    max_cols: list[str] = (),
    with_count: bool = True,
) -> DataFrame:
    """min/max/count over a parquet table, answerable from footers.

    Returns one row with columns ``min_<c>``/``max_<c>``/``n``. The
    returned DataFrame is bound to a child session whose conf enables
    the v2 reader + aggregate pushdown; collecting it from the parent
    works as usual (same SparkContext). A plan gate asserts the
    aggregation actually reached the scan (``test_plans.py``).
    """
    if not (min_cols or max_cols or with_count):
        raise ValueError("footer_stats_agg: nothing to aggregate")
    child = spark.newSession()
    child.conf.set("spark.sql.sources.useV1SourceList", "")
    child.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    df = child.read.parquet(path)
    aggs = (
        [F.min(c).alias(f"min_{c}") for c in min_cols]
        + [F.max(c).alias(f"max_{c}") for c in max_cols]
        + ([F.count(F.lit(1)).alias("n")] if with_count else [])
    )
    return df.agg(*aggs)


def _q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return footer_stats_agg(
        spark,
        f"{sf_dir}/lineitem.parquet",
        min_cols=["l_quantity", "l_extendedprice"],
        max_cols=["l_quantity", "l_discount"],
    )


_TABLE_STATS_ORACLE = """
SELECT MIN(l_quantity) AS min_l_quantity,
       MIN(l_extendedprice) AS min_l_extendedprice,
       MAX(l_quantity) AS max_l_quantity,
       MAX(l_discount) AS max_l_discount,
       COUNT(*) AS n
FROM lineitem
"""

QUERIES["q119_table_stats"] = QuerySpec(_q_table_stats, _TABLE_STATS_ORACLE)
