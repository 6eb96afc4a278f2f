"""Micro A/B: ADC distance fold (aggregate over zip_with of element_at
lookups) vs unrolled codegen sum, on the PQ shape (m=8, n_codes=16),
5M candidate pairs.  Checks bit-identity then times both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wing_binlog_go_spark.session import get_spark

M = 8
N_CODES = 16
N = 5_000_000


def adc_fold(codes, tbl):
    pairs = F.zip_with(
        codes,
        F.sequence(F.lit(0), F.lit(M - 1)),
        lambda code, j: F.element_at(tbl, (j * N_CODES + code + 1).cast("int")),
    )
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def adc_unrolled(codes, tbl):
    out = F.lit(0.0)
    for j in range(M):
        out = out + F.element_at(tbl, (F.lit(j * N_CODES) + codes[j] + 1).cast("int"))
    return out


def main() -> None:
    spark = get_spark("ab-adc-micro")
    code_seeds = F.sequence(F.lit(0), F.lit(M - 1))
    tbl_seeds = F.sequence(F.lit(0), F.lit(M * N_CODES - 1))
    base = (
        spark.range(N)
        .repartition(32)
        .select(
            F.col("id"),
            F.transform(
                code_seeds, lambda i: (F.xxhash64(F.col("id"), i) % N_CODES + N_CODES) % N_CODES
            ).alias("codes"),
            F.transform(
                tbl_seeds,
                lambda i: (F.xxhash64(F.col("id") % 100, i).cast("double") / F.lit(float(2**63))),
            ).alias("tbl"),
        )
        .localCheckpoint(eager=True)
    )

    mism = base.select(
        (adc_fold(F.col("codes"), F.col("tbl"))
         != adc_unrolled(F.col("codes"), F.col("tbl"))).alias("m")
    ).filter("m").count()
    print(f"value_mismatches={mism}")

    frames = {
        "baseline": base.select(F.lit(0.0).alias("d")),
        "fold": base.select(adc_fold(F.col("codes"), F.col("tbl")).alias("d")),
        "unrolled": base.select(adc_unrolled(F.col("codes"), F.col("tbl")).alias("d")),
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
