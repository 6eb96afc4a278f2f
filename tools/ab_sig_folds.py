"""Micro A/B: per-row cost of the signature folds (r13, VERDICT ask #4).

Three experiments, each with bit-identity assertion + noop timing
(min of N, baseline-subtracted), at a scale where per-row cost is the
term being measured:

  simhash : 64-wide ±1 fold  vs  16-lane SWAR popcount fold
            (each long holds 4×16-bit bit-position counters; the sign
            test 2*cnt > n is exactly the old sum > 0)
  rolling : 8 separate per-base char folds (8 re-splits per shingle)
            vs one fused fold carrying all 8 accumulators
  minhash : zip_with-over-sequence fold state vs named_struct state
            (same 16 xxhash64 calls; removes the per-shingle sequence
            + zip_with array machinery)

Usage: python tools/ab_sig_folds.py [simhash|rolling|minhash ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wing_binlog_go_spark.session import get_spark

N_DOCS = int(os.environ.get("AB_N_DOCS", "1000000"))
N_TOKENS = int(os.environ.get("AB_N_TOKENS", "64"))
N_SHINGLES = int(os.environ.get("AB_N_SHINGLES", "24"))
N_RUNS = int(os.environ.get("AB_N_RUNS", "5"))

LONG_MAX = 2**63 - 1
ROLL_BASES = (31, 37, 41, 43, 47, 53, 59, 61)
ROLL_P = 1_000_000_007
ROLL_SEED = 7
SWAR_MASK = 0x0001000100010001  # one 16-bit lane per 16 bit positions


# --- expression builders ----------------------------------------------------

SIMHASH_OLD = """
aggregate(
  zip_with(
    aggregate(_th, array_repeat(0, 64),
              (acc, h) -> zip_with(acc, sequence(0, 63),
                (a, b) -> a + IF((shiftright(h, b) & 1) = 1, 1, -1))),
    sequence(0, 63),
    (s, b) -> IF(s > 0, shiftleft(cast(1 as long), b),
                 cast(0 as long))),
  cast(0 as long), (acc, x) -> acc | x)
"""

SIMHASH_SWAR = f"""
aggregate(_th, array_repeat(cast(0 as long), 16),
  (acc, h) -> zip_with(acc, sequence(0, 15),
    (a, j) -> a + (shiftright(h, j) & {SWAR_MASK})),
  acc -> aggregate(sequence(0, 63), cast(0 as long),
    (s, b) -> s | IF(2 * (shiftright(acc[b % 16], 16 * (b div 16)) & 65535)
                       > size(_th),
                     shiftleft(cast(1 as long), b), cast(0 as long))))
"""


def rolling_old() -> str:
    def roll(base: int) -> str:
        return (
            f"aggregate(transform(split(s, ''), ch -> ascii(ch)), "
            f"CAST({ROLL_SEED} AS BIGINT), "
            f"(acc, c) -> ((acc * {base} + CAST(c AS BIGINT)) % {ROLL_P}))"
        )

    return (
        "array("
        + ", ".join(
            f"array_min(transform(_sh, s -> {roll(b)}))" for b in ROLL_BASES
        )
        + ")"
    )


def rolling_fused() -> str:
    seed8 = ", ".join(f"CAST({ROLL_SEED} AS BIGINT)" for _ in ROLL_BASES)
    step8 = ", ".join(
        f"((acc[{j}] * {b} + CAST(c AS BIGINT)) % {ROLL_P})"
        for j, b in enumerate(ROLL_BASES)
    )
    inner = (
        f"aggregate(transform(split(s, ''), ch -> ascii(ch)), "
        f"array({seed8}), (acc, c) -> array({step8}))"
    )
    return (
        f"aggregate(_sh, array_repeat(CAST({LONG_MAX} AS BIGINT), 8), "
        f"(mins, s) -> zip_with(mins, {inner}, (m, r) -> least(m, r)))"
    )


MINHASH_OLD = f"""
aggregate(_hs, array_repeat({LONG_MAX}L, 16),
  (acc, h) -> zip_with(acc, sequence(0, 15),
    (a, i) -> least(a, xxhash64(i, h))))
"""


def minhash_struct() -> str:
    seed = ", ".join(f"'m{i}', {LONG_MAX}L" for i in range(16))
    step = ", ".join(
        f"'m{i}', least(acc.m{i}, xxhash64({i}, h))" for i in range(16)
    )
    finish = ", ".join(f"acc.m{i}" for i in range(16))
    return (
        f"aggregate(_hs, named_struct({seed}), "
        f"(acc, h) -> named_struct({step}), "
        f"acc -> array({finish}))"
    )


FP48_OLD = """
aggregate(
  zip_with(
    aggregate(_hs, array_repeat(cast(0 as long), 48),
              (acc, h) -> zip_with(acc, sequence(0, 47),
                (a, j) -> a + IF(CAST(floor(CAST(h AS DOUBLE)
                                  / power(2.0, CAST(j AS DOUBLE))) AS BIGINT)
                                 % 2 = 1, 1, -1))),
    sequence(0, 47),
    (s, j) -> IF(s > 0, CAST(power(2.0, CAST(j AS DOUBLE)) AS BIGINT),
                 cast(0 as long))),
  cast(0 as long), (acc, x) -> acc + x)
"""

FP48_SWAR = f"""
aggregate(_hs, array_repeat(cast(0 as long), 16),
  (acc, h) -> zip_with(acc, sequence(0, 15),
    (a, j) -> a + (shiftright(h, j) & {0x0000000100010001})),
  acc -> aggregate(sequence(0, 47), cast(0 as long),
    (s, b) -> s + IF(2 * (shiftright(acc[b % 16], 16 * (b div 16)) & 65535)
                       > size(_hs),
                     shiftleft(cast(1 as long), b), cast(0 as long))))
"""


# --- harness -----------------------------------------------------------------


def _time(frames: dict, n_runs: int) -> dict:
    results: dict[str, list[float]] = {}
    for name, df in list(frames.items()) * n_runs:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        results.setdefault(name, []).append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"  {name}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")
    return {k: min(v) for k, v in results.items()}


def _identity(base, old: str, new: str, label: str) -> None:
    n_bad = base.select(
        F.expr(old).alias("o"), F.expr(new).alias("n")
    ).filter("NOT (o <=> n)").count()
    print(f"  {label} identity: {n_bad} mismatching rows")
    assert n_bad == 0, f"{label}: {n_bad} mismatches"


def run_simhash(spark) -> None:
    print(f"simhash: {N_DOCS} docs x {N_TOKENS} token hashes")
    base = (
        spark.range(N_DOCS)
        .repartition(32)
        .select(
            "id",
            F.expr(
                f"transform(sequence(0, {N_TOKENS - 1} + CAST(id % 7 AS INT)),"
                " i -> xxhash64(id, i))"
            ).alias("_th"),
        )
        .localCheckpoint(eager=True)
    )
    # edge cases: empty array, single token, all-same hash
    edge = spark.createDataFrame(
        [(0,), (1,), (2,)], "id long"
    ).select(
        "id",
        F.expr(
            "CASE WHEN id = 0 THEN array() "
            "WHEN id = 1 THEN array(xxhash64(42)) "
            "ELSE array_repeat(xxhash64(7), 5) END"
        ).cast("array<long>").alias("_th"),
    )
    _identity(base, SIMHASH_OLD, SIMHASH_SWAR, "simhash corpus")
    _identity(edge, SIMHASH_OLD, SIMHASH_SWAR, "simhash edges")
    _time(
        {
            "baseline": base.select(F.lit(0).alias("s")),
            "old64": base.select(F.expr(SIMHASH_OLD).alias("s")),
            "swar16": base.select(F.expr(SIMHASH_SWAR).alias("s")),
        },
        N_RUNS,
    )


def run_rolling(spark) -> None:
    n_docs = N_DOCS // 4  # char folds are ~10x costlier per row
    print(f"rolling: {n_docs} docs x {N_SHINGLES} shingles x ~12 chars")
    base = (
        spark.range(n_docs)
        .repartition(32)
        .select(
            "id",
            F.expr(
                f"transform(sequence(1, {N_SHINGLES}), "
                "i -> substring(md5(concat(cast(id as string), '-', i)), 1, 12))"
            ).alias("_sh"),
        )
        .localCheckpoint(eager=True)
    )
    edge = spark.createDataFrame([(0,), (1,)], "id long").select(
        "id",
        F.expr(
            "CASE WHEN id = 0 THEN array('a') ELSE array('zz', ' x y', 'a b c') END"
        ).alias("_sh"),
    )
    _identity(base, rolling_old(), rolling_fused(), "rolling corpus")
    _identity(edge, rolling_old(), rolling_fused(), "rolling edges")
    _time(
        {
            "baseline": base.select(F.lit(0).alias("s")),
            "old8x": base.select(F.expr(rolling_old()).alias("s")),
            "fused": base.select(F.expr(rolling_fused()).alias("s")),
        },
        N_RUNS,
    )


def run_minhash(spark) -> None:
    n_sh = N_SHINGLES * 2
    print(f"minhash: {N_DOCS} docs x {n_sh} shingle hashes x 16 mins")
    base = (
        spark.range(N_DOCS)
        .repartition(32)
        .select(
            "id",
            F.expr(
                f"transform(sequence(0, {n_sh - 1}), i -> xxhash64(id, i, 99))"
            ).alias("_hs"),
        )
        .localCheckpoint(eager=True)
    )
    edge = spark.createDataFrame([(0,), (1,)], "id long").select(
        "id",
        F.expr(
            "CASE WHEN id = 0 THEN array() ELSE array(xxhash64(1)) END"
        ).cast("array<long>").alias("_hs"),
    )
    _identity(base, MINHASH_OLD, minhash_struct(), "minhash corpus")
    _identity(edge, MINHASH_OLD, minhash_struct(), "minhash edges")
    _time(
        {
            "baseline": base.select(F.lit(0).alias("s")),
            "zipwith": base.select(F.expr(MINHASH_OLD).alias("s")),
            "struct": base.select(F.expr(minhash_struct()).alias("s")),
        },
        N_RUNS,
    )


def run_fp48(spark) -> None:
    """q37g's 48-bit fingerprint fold: pow/floor bit extraction vs the
    16-lane SWAR fold (rolling hashes are < 2^30, so lanes j, j+16,
    j+32 cover all 48 positions)."""
    n_sh = N_SHINGLES
    print(f"fp48: {N_DOCS} docs x {n_sh} rolling hashes x 48 bits")
    base = (
        spark.range(N_DOCS)
        .repartition(32)
        .select(
            "id",
            F.expr(
                f"transform(sequence(0, {n_sh - 1}), "
                "i -> pmod(xxhash64(id, i), 1000000007))"
            ).alias("_hs"),
        )
        .localCheckpoint(eager=True)
    )
    edge = spark.createDataFrame([(0,), (1,), (2,)], "id long").select(
        "id",
        F.expr(
            "CASE WHEN id = 0 THEN array(CAST(0 AS BIGINT)) "
            "WHEN id = 1 THEN array(CAST(1073741823 AS BIGINT)) "
            "ELSE array_repeat(CAST(7 AS BIGINT), 3) END"
        ).alias("_hs"),
    )
    _identity(base, FP48_OLD, FP48_SWAR, "fp48 corpus")
    _identity(edge, FP48_OLD, FP48_SWAR, "fp48 edges")
    _time(
        {
            "baseline": base.select(F.lit(0).alias("s")),
            "powfloor": base.select(F.expr(FP48_OLD).alias("s")),
            "swar16": base.select(F.expr(FP48_SWAR).alias("s")),
        },
        N_RUNS,
    )


def main() -> None:
    which = sys.argv[1:] or ["simhash", "rolling", "minhash", "fp48"]
    spark = get_spark("ab-sig-folds")
    for name in which:
        {
            "simhash": run_simhash,
            "rolling": run_rolling,
            "minhash": run_minhash,
            "fp48": run_fp48,
        }[name](spark)


if __name__ == "__main__":
    main()
