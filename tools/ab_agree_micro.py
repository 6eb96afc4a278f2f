"""Micro A/B: per-pair cost of the agree expression at a scale-relevant
pair count (5M synthetic pairs of 16-long arrays), isolating the
interpreted HOF vs unrolled-codegen difference from join machinery.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wing_binlog_go_spark.session import get_spark

NUM_HASHES = 16
N_PAIRS = 5_000_000


def main() -> None:
    spark = get_spark("ab-agree-micro")
    seeds = F.sequence(F.lit(0), F.lit(NUM_HASHES - 1))
    base = (
        spark.range(N_PAIRS)
        .repartition(32)
        .select(
            F.col("id"),
            F.transform(seeds, lambda i: F.xxhash64(F.col("id"), i)).alias("x"),
            F.transform(seeds, lambda i: F.xxhash64(F.col("id") % 1000, i)).alias("y"),
        )
        .localCheckpoint(eager=True)
    )

    hof = F.size(
        F.filter(F.zip_with(F.col("x"), F.col("y"), lambda p, q: p == q), lambda e: e)
    )
    terms = [(F.col("x")[i] == F.col("y")[i]).cast("int") for i in range(NUM_HASHES)]
    unr = terms[0]
    for t in terms[1:]:
        unr = unr + t

    frames = {
        "baseline": base.select(F.lit(0).alias("agree")),
        "hof": base.select(hof.alias("agree")),
        "unrolled": base.select(unr.alias("agree")),
    }
    results = {}
    for name, df in list(frames.items()) * 3:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results.setdefault(name, []).append(dt)
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
