"""Aggregate query registry: relational surface + north-star operators.

Import side effects register each module's queries; this is the single
source the driver contract (``__spark_entry__``) and the tests consume.
"""

from __future__ import annotations

from wing_binlog_go_spark.plans.relational import QUERIES, QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = dict(QUERIES)
    # North-star operator modules register lazily so a bug in one module
    # never takes down the whole surface.
    for mod_name in (
        "wing_binlog_go_spark.operators.dedup",
        "wing_binlog_go_spark.operators.similarity",
        "wing_binlog_go_spark.operators.asof_join",
        "wing_binlog_go_spark.functions.text",
    ):
        try:
            mod = __import__(mod_name, fromlist=["QUERIES"])
            out.update(getattr(mod, "QUERIES", {}))
        except ImportError:
            pass
    return out
