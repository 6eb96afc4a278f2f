"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE for runtime re-planning (skew joins,
partition coalescing), broadcast threshold for dimension tables, Arrow for
the few Pandas-UDF paths, UTC session timezone so timestamp semantics are
stable across engines (the DuckDB oracle also runs in UTC).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Per-process warehouse: the local catalog is in-memory, so a REUSED
# warehouse path from a previous JVM makes saveAsTable fail with
# LOCATION_ALREADY_EXISTS (the table is new to the catalog but its
# directory survives). One fresh dir per process; /tmp cleanup reaps it.
_WAREHOUSE_DIR = os.environ.get("SPARK_GRAFT_WAREHOUSE") or os.path.join(
    tempfile.gettempdir(), f"spark-warehouse-{os.getpid()}"
)


def _default_driver_mem() -> str:
    """Driver-heap default derived from the machine, not assumed.

    A flat 32g default (the declared 128 GiB bench box) gets the JVM
    OOM-KILLED by the cgroup on smaller dev/CI machines — a hard kill,
    not a spill. Take half of the effective memory, clamped to
    [1g, 32g]; SPARK_GRAFT_DRIVER_MEM stays the explicit override for
    the bench box. Effective memory = min(MemTotal, cgroup limit):
    MemTotal, not MemAvailable, because the heap ceiling is PERMANENT
    for the process — sizing it from instantaneous free memory on a
    transiently busy box would silently pin a small heap for the whole
    session lifetime (the r11 ADVICE finding). The cgroup limit keeps
    the container case honest: /proc/meminfo is NOT cgroup-namespaced,
    so inside a memory-limited container (no lxcfs) it reports the
    HOST — sizing from it alone recreates exactly the OOM-kill this
    function exists to prevent. Reads cgroup v2
    (/sys/fs/cgroup/memory.max) and v1 (memory.limit_in_bytes);
    "max"/absent/unreadable means unlimited. Falls back to Spark's own
    1g default if nothing is readable (non-Linux). The chosen heap is
    logged once so an undersized session is diagnosable.
    """
    avail_b = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    avail_b = int(line.split()[1]) * 1024
                    break
    except OSError:
        pass
    for cg in (
        "/sys/fs/cgroup/memory.max",
        "/sys/fs/cgroup/memory/memory.limit_in_bytes",
    ):
        try:
            with open(cg) as f:
                raw = f.read().strip()
            if raw.isdigit():
                limit = int(raw)
                # v1 reports ~2^63 when unlimited — ignore absurd values
                if limit < 1 << 50:
                    avail_b = limit if avail_b is None else min(avail_b, limit)
            break
        except OSError:
            continue
    if avail_b is None:
        return "1g"
    gb = max(1, min(32, avail_b // (2 * 1024**3)))
    import logging

    logging.getLogger(__name__).info(
        "driver heap default %dg (effective memory %.1f GiB)",
        gb,
        avail_b / 1024**3,
    )
    return f"{gb}g"


def get_spark(
    app_name: str = "wing-binlog-go-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # --- memory ------------------------------------------------------
        # Spark's local-mode default driver heap is 1 GiB — on the declared
        # test box (local[32], 128 GiB) that starves every broadcast build
        # and hash aggregate into spill/GC, and a runtime-converted
        # broadcast join of a mis-estimated side dies with
        # "not enough memory to build and broadcast" (measured: q117's
        # verify at the synthetic sf1 corpus). The default is derived from
        # the box (half of MemAvailable, clamped to 32g) so a cgroup-limited
        # container is not OOM-killed by an oversized heap; the bench box
        # pins it via SPARK_GRAFT_DRIVER_MEM. Static conf: effective only
        # for the session that creates the JVM (spark-submit owns it on a
        # real cluster).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem(),
        )
        # --- planner ---------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # --- IO --------------------------------------------------------
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- python boundary ------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- catalog ---------------------------------------------------
        # bucketed tables (operators/bucketing.py) go through saveAsTable;
        # keep the local warehouse out of the repo working dir. Static
        # conf — only effective for the session that creates the JVM.
        .config("spark.sql.warehouse.dir", _WAREHOUSE_DIR)
        # --- semantics -------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off: MySQL-style permissive casts match the reference's
        # decode semantics (src/library/binlog/util.go:61-146 never traps).
        .config("spark.sql.ansi.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
