"""Micro A/B: interpreted aggregate(zip_with) dot fold vs unrolled
codegen sum at 2M pairs x 64 dims.  Checks bit-identity (exact double
equality incl. the 0.0 seed's signed-zero behavior) then times both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wing_binlog_go_spark.session import get_spark

DIM = 64
N = 2_000_000


def dot_fold(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_unrolled(a, b):
    out = F.lit(0.0)
    for i in range(DIM):
        out = out + a[i] * b[i]
    return out


def main() -> None:
    spark = get_spark("ab-dot-micro")
    seeds = F.sequence(F.lit(0), F.lit(DIM - 1))
    # pseudo-random doubles in [-1, 1), plus planted zero vectors every 1000th
    def vec(salt):
        v = F.transform(
            seeds,
            lambda i: (F.xxhash64(F.col("id") + salt, i).cast("double") / F.lit(float(2**63))),
        )
        return F.when(F.col("id") % 1000 == salt, F.array_repeat(F.lit(0.0), DIM)).otherwise(v)

    base = (
        spark.range(N)
        .repartition(32)
        .select(F.col("id"), vec(0).alias("x"), vec(1).alias("y"))
        .localCheckpoint(eager=True)
    )

    mism = base.select(
        (dot_fold(F.col("x"), F.col("y")) != dot_unrolled(F.col("x"), F.col("y"))).alias("m")
    ).filter("m").count()
    # signed-zero check: compare string forms too (0.0 vs -0.0 compare equal)
    mism_str = base.select(
        (dot_fold(F.col("x"), F.col("y")).cast("string")
         != dot_unrolled(F.col("x"), F.col("y")).cast("string")).alias("m")
    ).filter("m").count()
    print(f"value_mismatches={mism} string_mismatches={mism_str}")

    frames = {
        "baseline": base.select(F.lit(0.0).alias("d")),
        "fold": base.select(dot_fold(F.col("x"), F.col("y")).alias("d")),
        "unrolled": base.select(dot_unrolled(F.col("x"), F.col("y")).alias("d")),
    }
    results = {}
    for name, df in list(frames.items()) * 3:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        results.setdefault(name, []).append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
