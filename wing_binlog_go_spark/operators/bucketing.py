"""Bucketed table layout: pre-shuffle once at write time, join forever
without exchanges.

The 100 TB rationale (SCALE.md "Joins"): a fact-fact join (e.g.
lineitem ⋈ orders on orderkey) shuffles both sides on every query. If
both tables are written bucketed on the join key with the same bucket
count, Spark's bucketed scan reports the hash partitioning to the
planner and the sort-merge join runs with NO Exchange on either side —
the shuffle was paid once, at layout time, and amortizes over every
subsequent join/aggregation on that key. This is the plain-Spark
equivalent of the reference deployment advice "co-locate by key"; on a
lakehouse the same role is played by Delta/Iceberg clustering.

Bucketed writes go through ``saveAsTable`` (the bucketing metadata
lives in the catalog, not the parquet footer) — fine on a cluster with
a real metastore; local sessions use the default in-memory catalog +
spark.sql.warehouse.dir.

Verified by ``tests/test_bucketing.py``: the bucketed join plan contains
zero Exchange nodes and matches the plain join's results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets the sort-merge join skip its sort too
    (plan shows neither Exchange nor Sort on the bucketed sides).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    With matching bucket counts and keys the planner elides both
    exchanges; the join parallelism equals the bucket count, so pick
    num_buckets ≈ target cluster cores at layout time.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
