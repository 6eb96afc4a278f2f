"""wing_binlog_go_spark — a PySpark-native analytics + CDC engine.

Brand-new engine with the query and data-processing capabilities of the
reference system jilieryuyi/wing-binlog-go (a MySQL binlog CDC middleware),
re-expressed Spark-first:

- ``sources``   — CDC change-record model + binlog-shaped streaming sources
                  (reference: src/library/binlog/, vendor canal library).
- ``functions`` — envelope shaping + MySQL type decode rules as column
                  expressions (reference: src/library/binlog/util.go:61-146,
                  handler.go:113-184), plus text-analysis / vector functions.
- ``plans``     — the declared relational query surface (SURVEY.md §2b),
                  DataFrame-first, validated against a DuckDB oracle.
- ``operators`` — operators Spark lacks natively: as-of join, MinHash/SimHash
                  dedup, ANN similarity search.
- ``streaming`` — Structured Streaming pipeline: envelope transform, regex
                  route table fan-out, idempotent sinks (reference:
                  src/services/*).
- ``multimodal``— binary-column (image/audio/video) plumbing with stubbed
                  decoders.

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"

from wing_binlog_go_spark.session import get_spark  # noqa: F401
from wing_binlog_go_spark.tables import TABLE_NAMES, load_tables, read_table  # noqa: F401


def queries():
    """The full registered query surface (lazy import to keep package
    import light)."""
    from wing_binlog_go_spark.registry import all_queries

    return all_queries()
