"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are defined in ``wing_binlog_go_spark.plans.relational`` (the
SURVEY.md §2b inventory) plus the operator modules (dedup, similarity,
text analysis). Entries whose oracle is None get the driver's weaker
rows-only check (documented per-query).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wing_binlog_go_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape) on /root/testdata/sf0.001."""
    q = all_queries()["q14_tpch_q3"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
