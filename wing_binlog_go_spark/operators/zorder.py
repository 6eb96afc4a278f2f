"""Z-order (Morton-curve) file layout for multi-column data skipping.

At 100 TB the cheapest predicate is the one that never reads the file:
parquet scans skip whole files/row-groups whose footer min/max exclude
the filter range. A single-column sort gives perfect skipping on that
column and none on any other; interleaving the bits of SEVERAL columns'
rank codes (the Morton / Z space-filling curve) makes files cluster in
every interleaved dimension at once, so a two-dimensional box predicate
prunes on both columns — the technique behind Delta's OPTIMIZE ZORDER
and Databricks' liquid clustering, here in plain open Spark.

Mechanics (all JVM expressions — the bit interleave is a STATIC sum of
shift/mask terms built in Python, no HOF, no UDF):

1. one stats agg computes each column's min/max;
2. each column scales to a ``bits``-wide integer code — linear on the
   min/max range for uniform-ish columns, or equal-mass quantile codes
   (``coding='quantile'``) so a skewed column's predicate band still
   maps to a proportionate slice of the code axis;
3. codes interleave into the z-value; ``repartitionByRange(z)`` makes
   each output file own a compact z-range (range partitioning is the
   global-sort shuffle — write-time cost, amortized over every later
   scan), ``sortWithinPartitions`` tightens row-group stats inside the
   file.

The effectiveness test reads the written footers with pyarrow and
counts files a box predicate can prune vs a single-column-sorted
layout of the same file count (`tests/test_zorder.py`).

Reference analog: none — the reference streams events and never
organizes storage (readme.md:40-43 delegates analytics); this is part
of the engine's own 100 TB posture (SCALE.md §Storage layout).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scale_to_code(col: F.Column, mn: float, mx: float, bits: int) -> F.Column:
    """Linear min/max scaling to an integer code in [0, 2^bits)."""
    top = (1 << bits) - 1
    # all-NULL column: min/max stats are None — code to 0 like the
    # constant case rather than throwing an opaque TypeError mid-OPTIMIZE
    if mn is None or mx is None or mx <= mn:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(mn))) / F.lit(float(mx - mn))
    return F.least(
        F.greatest(F.floor(scaled * top).cast("long"), F.lit(0)), F.lit(top)
    )


def _quantile_code(col: F.Column, cuts: list[float]) -> F.Column:
    """Equal-MASS coding: code = #cut-points ≤ x, cuts = the
    (2^bits − 1) approx quantile boundaries. Skewed columns waste most
    of a linear code range on empty value space; quantile codes give
    every code the same row mass, so a k%-mass predicate band touches
    ~k% of the code axis regardless of the distribution. The fold runs
    over ≤ 2^bits literals at WRITE time only."""
    arr = F.array(*[F.lit(float(b)) for b in cuts])
    return F.size(F.filter(arr, lambda b: col.cast("double") >= b)).cast("long")


def _interleave(codes: list[F.Column], bits: int) -> F.Column:
    """Morton interleave: bit i of code j lands at position
    i*n_cols + j. Built as a static sum of shift/mask expressions —
    whole-stage-codegen friendly, no higher-order functions."""
    n = len(codes)
    terms = []
    for j, c in enumerate(codes):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a + b, terms).alias("_z")


def zorder_values(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    coding: str = "linear",
) -> tuple[DataFrame, dict]:
    """df + a ``_z`` Morton-code column over ``cols``; returns the
    per-column coding stats (persist them next to the layout if later
    appends must code consistently).

    ``coding='linear'`` scales each column on its (min, max) — exact
    and cheap for uniform-ish columns; ``coding='quantile'`` codes by
    approximate quantile rank (equal mass per code), the right choice
    for skewed columns where a linear range is mostly empty. Quantile
    boundaries are a bounded driver-side array (≤ 2^bits − 1 doubles
    per column — at bits ≤ 8 that is ≤ 255 literals in the plan)."""
    if len(cols) < 2:
        raise ValueError(f"z-order needs >= 2 columns, got {cols}")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    if coding == "linear":
        stats_row = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        stats = {c: (stats_row[f"mn_{c}"], stats_row[f"mx_{c}"]) for c in cols}
        codes = [
            _scale_to_code(F.col(c), stats[c][0], stats[c][1], bits)
            for c in cols
        ]
    elif coding == "quantile":
        if bits > 8:
            raise ValueError(
                f"quantile coding caps at 8 bits/column ({bits} requested): "
                "boundaries are plan literals"
            )
        n_cuts = (1 << bits) - 1
        probs = [i / (n_cuts + 1) for i in range(1, n_cuts + 1)]
        dbl = df.select(
            *[F.col(c).cast("double").alias(c) for c in cols]
        )
        stats = {
            c: dbl.approxQuantile(c, probs, 0.001) for c in cols
        }
        codes = [_quantile_code(F.col(c), stats[c]) for c in cols]
    else:
        raise ValueError(f"unknown coding {coding!r}")
    return df.withColumn("_z", _interleave(codes, bits)), stats


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    coding: str = "linear",
    curve: str = "morton",
) -> dict:
    """Write ``df`` as ``n_files`` z-clustered parquet files: global
    range shuffle on the z-value (each file owns a compact z-range),
    sorted within files so row-group min/max stay tight. One stats agg
    + one shuffle — the standard offline OPTIMIZE cost."""
    if curve == "morton":
        zdf, stats = zorder_values(df, cols, bits, coding)
    elif curve == "hilbert":
        zdf, stats = hilbert_values(df, cols, bits, coding)
    else:
        raise ValueError(f"unknown curve {curve!r}")
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return stats


def _hilbert_d2(x: F.Column, y: F.Column, bits: int) -> F.Column:
    """Hilbert-curve index of (x, y) codes — the standard xy2d walk
    (Hamilton's bit-twiddle form) unrolled over ``bits`` levels as
    static expressions: per level read (rx, ry), accumulate the
    quadrant, and rotate/flip the frame with F.when. Hilbert beats
    Morton on locality (every curve step is an adjacent cell — no
    Z-jumps across the space), which tightens per-file bounding boxes
    at the same bit budget.

    EXPRESSION-SIZE WARNING: each level substitutes x and y into the
    next level's rotation, so the tree grows ~3^bits copies of the
    input expressions. Fine for unit-sized inputs (the reference test);
    the write path goes through :func:`_hilbert_frame`, which
    materializes each level as real columns and stays linear."""
    d = F.lit(0).cast("long")
    for s in range(bits - 1, -1, -1):
        side = F.lit(1 << s).cast("long")
        rx = F.shiftright(x, s).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, s).bitwiseAND(F.lit(1))
        d = d + side * side * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate the lower s bits of the frame
        nx = F.when(ry == 0, F.when(rx == 1, side - 1 - y).otherwise(y)) \
             .otherwise(x)
        ny = F.when(ry == 0, F.when(rx == 1, side - 1 - x).otherwise(x)) \
             .otherwise(y)
        x, y = nx, ny
    return d


def _hilbert_frame(df: DataFrame, cx: str, cy: str, bits: int) -> DataFrame:
    """Linear-size Hilbert walk: per level the rotated frame lands in
    REAL columns (withColumn), so each level references plain column
    refs instead of re-substituting the previous level's expression
    tree (which grows ~3^bits and OOMs codegen over non-trivial code
    expressions). Adds ``_z`` and drops the work columns."""
    out = df.withColumn("_hx", F.col(cx)).withColumn("_hy", F.col(cy)) \
            .withColumn("_hd", F.lit(0).cast("long"))
    for s in range(bits - 1, -1, -1):
        side = F.lit(1 << s).cast("long")
        rx = F.shiftright(F.col("_hx"), s).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), s).bitwiseAND(F.lit(1))
        out = out.withColumn(
            "_hd",
            F.col("_hd") + side * side * ((F.lit(3) * rx).bitwiseXOR(ry)),
        ).withColumn(
            "_nx",
            F.when(ry == 0, F.when(rx == 1, side - 1 - F.col("_hy"))
                   .otherwise(F.col("_hy"))).otherwise(F.col("_hx")),
        ).withColumn(
            "_ny",
            F.when(ry == 0, F.when(rx == 1, side - 1 - F.col("_hx"))
                   .otherwise(F.col("_hx"))).otherwise(F.col("_hy")),
        ).withColumn("_hx", F.col("_nx")).withColumn("_hy", F.col("_ny"))
    return out.withColumn("_z", F.col("_hd")).drop(
        "_hx", "_hy", "_hd", "_nx", "_ny"
    )


def _hilbert_skilling_frame(
    df: DataFrame, code_cols: list[str], bits: int
) -> DataFrame:
    """d-dimensional Hilbert index via Skilling's transpose algorithm
    ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 —
    public domain): undo the excess rotations level by level
    (conditional invert / bit-swap against axis 0), Gray-encode across
    axes, then apply the parity correction derived from the last
    axis. The result ("transpose form") interleaves MSB-major with
    axis 0 most significant into the final index.

    Every step is a plain bitwise column expression; like
    :func:`_hilbert_frame`, each (level, axis) update lands in REAL
    columns so the expression tree stays linear in bits·d instead of
    re-substituting per level. Adds ``_z``, drops the work columns."""
    n = len(code_cols)
    work = [f"_hx{i}" for i in range(n)]
    out = df
    for w, c in zip(work, code_cols):
        out = out.withColumn(w, F.col(c).cast("long"))
    # inverse undo: Q = M, M/2, ..., 2
    for s in range(bits - 1, 0, -1):
        q = 1 << s
        p = q - 1
        for i in range(n):
            cond = F.col(work[i]).bitwiseAND(F.lit(q)) != 0
            if i == 0:
                out = out.withColumn(
                    work[0],
                    F.when(cond, F.col(work[0]).bitwiseXOR(F.lit(p)))
                    .otherwise(F.col(work[0])),
                )
            else:
                # bit set: X[0] ^= P (invert); bit clear: swap the low
                # bits of X[0] and X[i] (t = differing bits under P)
                t = (
                    F.col(work[0]).bitwiseXOR(F.col(work[i]))
                ).bitwiseAND(F.lit(p))
                out = (
                    out.withColumn(
                        "_ht", F.when(cond, F.lit(0).cast("long")).otherwise(t)
                    )
                    .withColumn(
                        work[0],
                        F.when(cond, F.col(work[0]).bitwiseXOR(F.lit(p)))
                        .otherwise(F.col(work[0]).bitwiseXOR(F.col("_ht"))),
                    )
                    .withColumn(
                        work[i], F.col(work[i]).bitwiseXOR(F.col("_ht"))
                    )
                )
    # Gray encode across axes (sequential — each uses the UPDATED
    # previous axis, exactly Skilling's in-place loop)
    for i in range(1, n):
        out = out.withColumn(
            work[i], F.col(work[i]).bitwiseXOR(F.col(work[i - 1]))
        )
    # parity correction from the last axis: t = XOR of (Q-1) over set
    # high bits — one static XOR chain, no data-dependent loop
    tcol = F.lit(0).cast("long")
    for s in range(bits - 1, 0, -1):
        q = 1 << s
        tcol = tcol.bitwiseXOR(
            F.when(
                F.col(work[n - 1]).bitwiseAND(F.lit(q)) != 0, F.lit(q - 1)
            ).otherwise(F.lit(0)).cast("long")
        )
    out = out.withColumn("_ht", tcol)
    for i in range(n):
        out = out.withColumn(
            work[i], F.col(work[i]).bitwiseXOR(F.col("_ht"))
        )
    # transpose → index: bit s of axis i lands at s*n + (n-1-i)
    # (axis 0 most significant within each bit group, MSB-major)
    terms = []
    for i, w in enumerate(work):
        for s in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(F.col(w), s).bitwiseAND(F.lit(1)),
                    s * n + (n - 1 - i),
                )
            )
    out = out.withColumn("_z", reduce(lambda a, b: a + b, terms))
    return out.drop("_ht", *work)


def hilbert_values(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    coding: str = "linear",
) -> tuple[DataFrame, dict]:
    """``zorder_values``'s Hilbert sibling: df + ``_z`` holding the
    Hilbert index of the coded columns. Two columns walk the classic
    xy2d rotation (:func:`_hilbert_frame`, pinned cell-for-cell vs the
    canonical walk); three or more go through Skilling's transpose
    algorithm (:func:`_hilbert_skilling_frame` — the Gray-code form of
    the same rotation algebra; both are unit-step curves, verified by
    the bijectivity + adjacency property tests). Same coding options,
    same downstream write path (``write_zordered`` accepts the frame
    via ``curve='hilbert'``)."""
    if len(cols) < 2:
        raise ValueError(f"hilbert coding needs >= 2 columns, got {cols}")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    zdf, stats = zorder_values(df, cols, bits, coding)
    # recompute the codes ONCE into real columns, then run the
    # linear-size frame walk (see _hilbert_frame's size note)
    if coding == "linear":
        codes = [
            _scale_to_code(F.col(c), stats[c][0], stats[c][1], bits)
            for c in cols
        ]
    else:
        codes = [_quantile_code(F.col(c), stats[c]) for c in cols]
    coded = zdf.drop("_z")
    names = [f"_c{i}" for i in range(len(cols))]
    for nm, code in zip(names, codes):
        coded = coded.withColumn(nm, code)
    if len(cols) == 2:
        walked = _hilbert_frame(coded, names[0], names[1], bits)
    else:
        walked = _hilbert_skilling_frame(coded, names, bits)
    return walked.drop(*names), stats
