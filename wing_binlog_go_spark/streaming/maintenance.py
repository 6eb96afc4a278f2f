"""Table maintenance: small-file compaction for streaming sinks.

Streaming parquet sinks append one file per batch per partition; at a
few seconds per micro-batch that is thousands of small files a day —
the classic lakehouse small-file problem (SURVEY §4 notes OPTIMIZE-style
compaction as the maintenance job at the 100 TB north star; Delta's
OPTIMIZE is the managed equivalent).

``compact_parquet`` rewrites a directory into ~target_file_mb files via
a coalesce-or-repartition chosen from the actual on-disk size, staging
through a temp dir so readers never see a half-written table.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def backup_path(path: str) -> str:
    """Swap backup location for ``path``: a DOT-PREFIXED sibling.

    The backup must be invisible to Spark's file listing and hive
    partition discovery — a plain ``bucket=5._old`` sibling inside a
    partitioned table would be discovered as partition value ``5._old``
    and read as duplicate rows by any reader that lists mid-swap."""
    d, b = os.path.split(path.rstrip("/"))
    return os.path.join(d, "." + b + "._old")


def swap_dir(new_dir: str, path: str) -> None:
    """Replace directory ``path`` with ``new_dir`` as crash-safely as a
    local filesystem allows: each rename is atomic; a crash between them
    is recoverable because the previous table survives at the backup and
    ``recover_swap`` (called first) restores it. Delta/Iceberg commit
    logs are the real answer at scale; this is the best plain-FS analog.
    """
    backup = backup_path(path)
    shutil.rmtree(backup, ignore_errors=True)  # stale backup from a crash
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(new_dir, path)
    shutil.rmtree(backup, ignore_errors=True)


def _legacy_backup_path(path: str) -> str:
    """Pre-dot-prefix backup name (``X._old``, visible to partition
    discovery) — recognized for one release so a crash that happened
    under the old layout still recovers instead of leaving a
    duplicate-row ``bucket=N._old`` partition behind."""
    return path.rstrip("/") + "._old"


def recover_swap(path: str) -> None:
    """If a crash left no table at ``path`` but a backup exists, restore
    it before doing anything else. Probes the current dot-prefixed
    backup name first, then the legacy visible name; a legacy backup
    that is NOT needed for recovery is deleted so partition discovery
    stops seeing it as a duplicate partition."""
    backup = backup_path(path)
    legacy = _legacy_backup_path(path)
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)
    elif not os.path.exists(path) and os.path.exists(legacy):
        os.rename(legacy, path)
    elif os.path.exists(legacy):
        shutil.rmtree(legacy, ignore_errors=True)


def dir_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Rewrite ``path`` into ceil(size / target) files; returns the new
    file count. coalesce (no shuffle) is enough because we only ever
    merge down."""
    path = path.rstrip("/")
    recover_swap(path)
    size = dir_size_bytes(path)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    staged = path + "._compact"
    shutil.rmtree(staged, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(staged)
    swap_dir(staged, path)
    return parquet_file_count(path)
