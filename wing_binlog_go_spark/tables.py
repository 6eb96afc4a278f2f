"""Test-corpus table loaders.

The driver corpus (TESTDATA.md) is one parquet file per table under
``/root/testdata/sf*/``. At 100 TB these would be partitioned parquet/Delta
datasets; loading stays identical (``spark.read.parquet`` on a directory),
and every query in ``plans`` relies on Catalyst pushing filters/projections
into the scan rather than on anything about file layout.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Unexecuted-DataFrame (logical-plan) cache, keyed weakly per live
# SparkSession — entries die with their session. Re-resolving the same
# corpus table for every query build pays file listing + parquet footer
# schema reads + several py4j round trips each time; at cluster scale the
# same cost is re-listing a partitioned table per query (guide §6 — the
# filesourcePartitionFileCache exists for exactly this). Caching the
# *plan* is the programmatic twin of registering a temp view once per
# session: every execution still scans the parquet files — no data or
# results are cached, so each bench/oracle run computes from the inputs.
# The corpus is immutable by contract (TESTDATA.md); anything that
# rewrites a table under a live session must not go through read_table.
_RELATION_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _pin_session_confs(spark: SparkSession) -> None:
    """Defensive conf pinning for sessions we didn't build (the driver
    calls query builders with ITS SparkSession): Spark 4 defaults ANSI
    mode ON (element_at/cast/overflow errors instead of MySQL-style
    permissive NULLs — the semantics this engine declares), and a
    non-UTC session timezone changes how toPandas renders instant-typed
    timestamps. This is a DOCUMENTED side effect on the caller's session;
    correctness of this engine's own values does NOT depend on it — all
    timestamp columns it produces are NTZ via timezone-independent
    expressions — so a locked-down conf degrades to (a) louder errors
    under ANSI, (b) caller-timezone rendering of any LTZ values, never to
    silently shifted data.
    """
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table, normalizing physical-type quirks.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as nanos-since-epoch (legacy
    conf) and truncate to microseconds with integer arithmetic (DIV, not
    double division — epoch-nanos exceed a double's 53-bit mantissa).
    The corpus has no sub-microsecond values, so this is lossless. The
    result becomes TIMESTAMP_NTZ via convert_timezone('UTC', ·), which
    reads the epoch instant at UTC wall clock REGARDLESS of session
    timezone — correct even if conf pinning was rejected — matching how
    DuckDB reads the column.

    Side effects on the caller's session, by design: ANSI off + UTC
    (see _pin_session_confs) and nanosAsLong=true (required to read this
    parquet at all; left set because the conf is captured into resolved
    plans and unsetting mid-lineage is unsafe).
    """
    per_session = _RELATION_CACHE.get(spark)
    if per_session is None:
        _pin_session_confs(spark)  # once per session, with the first read
        per_session = {}
        try:
            _RELATION_CACHE[spark] = per_session
        except TypeError:  # non-weakref-able session stub: stay uncached
            per_session = None
    key = (os.path.abspath(sf_dir), name)
    if per_session is not None:
        cached = per_session.get(key)
        if cached is not None:
            return cached
    path = table_path(sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr("convert_timezone('UTC', timestamp_micros(ts DIV 1000))"),
            )
    else:
        df = spark.read.parquet(path)
    if per_session is not None:
        per_session[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every corpus table; optionally register temp views for SQL."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        if not os.path.exists(table_path(sf_dir, name)):
            continue
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
