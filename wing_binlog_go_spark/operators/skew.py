"""Skew-aware join: salting for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime and is the first line of defense. Salting is the
explicit fallback when one *key* (not partition) is hot — e.g. a single
customer with 10^8 events: AQE can split the partition but every split
still hashes to the same reducer for a plain shuffle join.

``salted_join`` replicates the build side R times and scatters the probe
side into R sub-keys with a deterministic hash (no rand(): results and
retries stay stable). Output is row-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    build_key: str | None = None,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """probe ⋈ build on key, with the hot-key shuffle spread over ``salt``
    sub-keys. build is replicated ``salt``× (keep it the smaller side).

    Only join types where an unmatched BUILD row produces no output are
    row-identical under salting (the build side is replicated, so a
    right/full outer join would emit its unmatched rows ``salt`` times).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "replicated build rows would duplicate outer-side output"
        )
    build_key = build_key or key
    # deterministic scatter: hash the probe row's full content
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt))
    )
    build_s = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast(probe_s.schema["_salt"].dataType.simpleString()))
    cond = (probe_s[key] == build_s[build_key]) & (
        probe_s["_salt"] == build_s["_salt"]
    )
    return probe_s.join(build_s, cond, how).drop("_salt")
