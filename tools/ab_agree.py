"""A/B: interpreted HOF agree (size(filter(zip_with))) vs unrolled codegen
sum of per-index equality on the q37 band-join shape.  Measures the verify
expression cost per colliding pair in isolation and in the full q37 query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wing_binlog_go_spark.session import get_spark
from wing_binlog_go_spark.operators.dedup import (
    minhash_signature,
    _band_buckets,
    _spread_if_narrow,
)
from wing_binlog_go_spark.tables import read_table

NUM_HASHES = 16
BANDS = 8


def agree_hof():
    return F.size(
        F.filter(
            F.zip_with(F.col("a.mh"), F.col("b.mh"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )


def agree_unrolled():
    terms = [
        (F.col("a.mh")[i] == F.col("b.mh")[i]).cast("int")
        for i in range(NUM_HASHES)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-agree")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = minhash_signature(
        _spread_if_narrow(docs, "doc_id"), "doc_id", "text", NUM_HASHES, 3
    ).localCheckpoint(eager=True)
    buckets = _band_buckets(sigs, "doc_id", NUM_HASHES, BANDS)
    a, b = buckets.alias("a"), buckets.alias("b")

    def pairs(agree_expr):
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                (agree_expr / F.lit(NUM_HASHES)).alias("est_jaccard"),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.first("est_jaccard").alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.2)
        )

    hof_df = pairs(agree_hof())
    unr_df = pairs(agree_unrolled())

    # correctness: identical rows
    n_hof = hof_df.count()
    diff = hof_df.exceptAll(unr_df).count() + unr_df.exceptAll(hof_df).count()
    print(f"pairs={n_hof} symmetric_diff={diff}")

    for name, df in [("hof", hof_df), ("unrolled", unr_df)] * 2:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times):.3f} all={[round(t,3) for t in times]}")

    # how many colliding pairs pre-dedup (the rows the expression runs on)
    raw = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).count()
    print(f"raw_colliding_rows={raw}")


if __name__ == "__main__":
    main()
