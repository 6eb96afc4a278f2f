"""Round-3 query surface extensions (q78-q85).

The reference delegates analytics to downstream consumers
(`readme.md:40-43`); these queries extend the declared surface with the
grouped-dedup / corpus-curation / point-in-time-join operators a
training-data pipeline consumer of the CDC stream needs, plus one more
TPC-H-grade relational workload. Every query pairs a Catalyst-built-in
DataFrame plan with a DuckDB oracle (same cross-engine hash rules as
`plans/relational.py`: decimal-cast sums, identical aliases, total
ORDER BY).

Scale notes (100 TB design):

- q78/q83 window on HIGH-cardinality keys (content fingerprint /
  (user,type,bucket)) — per-key groups are tiny, the window
  parallelizes like any hash shuffle.
- q79 does top-k over a LOW-cardinality group key (language) with the
  two-phase local-top-k pattern: per-shuffle-partition top-k first
  (parallel), then the exact top-k over the tiny candidate union. A
  single `Window.partitionBy(lang)` would serialize each language's
  whole vocabulary onto one task.
- q80 computes exact per-language NTILE with the shard-prefixed
  range-partitioned running total (`with_running_total`,
  functions/envelope.py) — no single-task per-language sort — and a
  closed-form bucket formula identical to SQL NTILE semantics.
- q81/q82 are pure map-side row expressions + one partial aggregation.
- q84 broadcasts the dimensions and lets the fact-fact join sort-merge.
- q85's interval join is an equi-join on the user key with the time
  range as a post-join predicate — never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from wing_binlog_go_spark.functions.envelope import with_running_total
from wing_binlog_go_spark.functions.mixing import _hash_threshold, sample_key
from wing_binlog_go_spark.operators.dedup import tokens
from wing_binlog_go_spark.plans.relational import QuerySpec, _dec, _t

QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# q78: grouped exact dedup — keep the first doc per (lang, content hash)
# ---------------------------------------------------------------------------


@register(
    "q78_grouped_dedup",
    """SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
                ROW_NUMBER() OVER (PARTITION BY lang, md5(text)
                                   ORDER BY doc_id) AS rn
         FROM documents) t WHERE rn = 1
       ORDER BY doc_id LIMIT 200""",
)
def q78(spark, sf_dir):
    # Survivor selection scoped to a group key — the per-language form
    # of exact dedup (q36 is corpus-global). Partition key includes the
    # md5 fingerprint, so cardinality ~= row count: tiny per-key groups,
    # fully parallel at any scale.
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy("doc_id")
        .limit(200)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# q79: top terms per language — two-phase top-k over a low-card group key
# ---------------------------------------------------------------------------

_TOPK = 5


@register(
    "q79_top_terms_per_lang",
    f"""WITH toks AS (
         SELECT lang, unnest(string_split(lower(text), ' ')) AS term
         FROM documents
       ), counts AS (
         SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
         WHERE length(term) > 3 GROUP BY lang, term
       )
       SELECT lang, term, cnt FROM (
         SELECT lang, term, cnt,
                ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY cnt DESC, term) AS rn
         FROM counts) t WHERE rn <= {_TOPK}
       ORDER BY lang, cnt DESC, term""",
)
def q79(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(tokens("text")).alias("term"))
        .filter(F.length("term") > 3)
        .groupBy("lang", "term")
        .agg(F.count("*").alias("cnt"))
    )
    # Two-phase exact top-k: every global top-k row is in its shuffle
    # partition's local top-k (at most k-1 rows outrank it anywhere, so
    # at most k-1 in its own partition), so the local pass is a superset
    # — then the exact window runs on ≤ k×#partitions candidate rows
    # per language instead of the full vocabulary.
    order = [F.col("cnt").desc(), F.col("term").asc()]
    local_w = Window.partitionBy("lang", F.spark_partition_id()).orderBy(*order)
    candidates = (
        counts.withColumn("_lrn", F.row_number().over(local_w))
        .filter(F.col("_lrn") <= _TOPK)
        .drop("_lrn")
    )
    final_w = Window.partitionBy("lang").orderBy(*order)
    return (
        candidates.withColumn("rn", F.row_number().over(final_w))
        .filter(F.col("rn") <= _TOPK)
        .orderBy("lang", F.col("cnt").desc(), "term")
        .select("lang", "term", "cnt")
    )


# ---------------------------------------------------------------------------
# q80: exact per-language quartile bins without a per-language sort task
# ---------------------------------------------------------------------------

_NBINS = 4


@register(
    "q80_quantile_bins",
    f"""WITH binned AS (
         SELECT lang, n_chars,
                NTILE({_NBINS}) OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id) AS bin
         FROM documents)
       SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
              MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
       FROM binned GROUP BY lang, bin ORDER BY lang, bin""",
)
def q80(spark, sf_dir):
    # NTILE(PARTITION BY lang) would put each language's full sub-corpus
    # on one task. Instead: per-language rank via the shard-prefixed
    # range-partitioned running total (parallel within a language), then
    # the closed-form NTILE bucket (first cnt%n buckets get one extra
    # row — verified identical to SQL NTILE).
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    ranked = with_running_total(
        d,
        ["n_chars", "doc_id"],
        F.lit(1).cast("long"),
        out="rn",
        partition_cols=["lang"],
    )
    cnt = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    n = _NBINS
    binned = ranked.join(broadcast(cnt), "lang").withColumn(
        "bin",
        F.expr(
            f"""CASE WHEN rn <= (cnt % {n}) * (cnt DIV {n} + 1)
                 THEN (rn - 1) DIV (cnt DIV {n} + 1)
                 ELSE (cnt % {n})
                      + (rn - 1 - (cnt % {n}) * (cnt DIV {n} + 1))
                        DIV (cnt DIV {n})
            END + 1"""
        ).cast("bigint"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "bin")
    )


# ---------------------------------------------------------------------------
# q81: length/token curation accounting per (lang, source)
# ---------------------------------------------------------------------------

_LEN_LO, _LEN_HI, _MIN_TOKENS = 150, 450, 30


@register(
    "q81_doc_length_curation",
    f"""SELECT lang, source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN n_chars BETWEEN {_LEN_LO} AND {_LEN_HI}
                            AND len(string_split(lower(text), ' ')) >= {_MIN_TOKENS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(SUM(CASE WHEN n_chars BETWEEN {_LEN_LO} AND {_LEN_HI}
                            AND len(string_split(lower(text), ' ')) >= {_MIN_TOKENS}
                       THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       FROM documents GROUP BY lang, source ORDER BY lang, source""",
)
def q81(spark, sf_dir):
    # Per-stratum keep/drop accounting for a length+token-count curation
    # rule — the audit table every corpus-filtering run must emit. Pure
    # row expressions into a partial aggregation; no pre-shuffle.
    d = _t(spark, sf_dir, "documents")
    keep = F.col("n_chars").between(_LEN_LO, _LEN_HI) & (
        F.size(tokens("text")) >= _MIN_TOKENS
    )
    return (
        d.withColumn("_k", keep.cast("int"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_k").alias("n_kept"),
            F.sum(F.when(F.col("_k") == 1, F.col("n_chars")).otherwise(0)).alias(
                "kept_chars"
            ),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# q82: cross-lingual mixture — seeded per-language downsampling, audited
# ---------------------------------------------------------------------------

_MIX_SEED = 7
_MIX_RATES = {"en": 0.3, "zh": 0.9}
_MIX_DEFAULT = 0.2


def _mix_case() -> str:
    arms = " ".join(
        f"WHEN lang = '{lang}' THEN '{_hash_threshold(rate)}'"
        for lang, rate in _MIX_RATES.items()
    )
    return f"CASE {arms} ELSE '{_hash_threshold(_MIX_DEFAULT)}' END"


@register(
    "q82_cross_lingual_mix",
    f"""WITH sampled AS (
         SELECT * FROM documents
         WHERE substring(md5('{_MIX_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)
               < {_mix_case()}
       )
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       FROM sampled GROUP BY lang ORDER BY lang""",
)
def q82(spark, sf_dir):
    # The "rebalance languages into a training mix" step: deterministic
    # seeded hash-threshold sampling (same draw function as
    # mixing.stratified_sample) + the per-language audit aggregate.
    # Row-local filter ⇒ no shuffle before the final tiny aggregation.
    d = _t(spark, sf_dir, "documents")
    threshold = F.lit(_hash_threshold(_MIX_DEFAULT))
    for lang, rate in _MIX_RATES.items():
        threshold = F.when(
            F.col("lang") == lang, F.lit(_hash_threshold(rate))
        ).otherwise(threshold)
    return (
        d.filter(sample_key("doc_id", _MIX_SEED) < threshold)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q83: event stream dedup — first event per (user, type, 10-min bucket)
# ---------------------------------------------------------------------------

_BUCKET_SECONDS = 600


@register(
    "q83_event_dedup_window",
    f"""SELECT event_id, user_id, event_type FROM (
         SELECT event_id, user_id, event_type,
                ROW_NUMBER() OVER (
                  PARTITION BY user_id, event_type,
                               CAST(floor(epoch(ts)/{_BUCKET_SECONDS}) AS BIGINT)
                  ORDER BY ts, event_id) AS rn
         FROM events) t WHERE rn = 1
       ORDER BY event_id LIMIT 200""",
)
def q83(spark, sf_dir):
    # Batch twin of the S4 stateful stream dedupe: collapse repeated
    # (user, event_type) rows inside a time bucket to the earliest — the
    # standard event-stream debounce. Window key includes the bucket, so
    # cardinality scales with the data; groups stay tiny.
    e = _t(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / _BUCKET_SECONDS).cast("bigint")
    w = Window.partitionBy("user_id", "event_type", bucket).orderBy(
        "ts", "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy("event_id")
        .limit(200)
        .select("event_id", "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# q84: TPC-H Q10 — returned-item revenue per customer
# ---------------------------------------------------------------------------


@register(
    "q84_tpch_q10",
    """SELECT c.c_custkey, c.c_name, n.n_name,
              ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)::DOUBLE
                AS revenue,
              ROUND(c.c_acctbal, 2) AS acctbal
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
         AND o.o_orderdate < TIMESTAMP '1996-01-01'
         AND l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
       ORDER BY revenue DESC, c.c_custkey LIMIT 20""",
)
def q84(spark, sf_dir):
    # TPC-H Q10 shape: date + returnflag filters push into both fact
    # scans; customer/nation broadcast; orders⋈lineitem sort-merges.
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q85: point-in-time feature join — prior-window aggregates per anchor
# ---------------------------------------------------------------------------

_LOOKBACK_SECONDS = 3600


@register(
    "q85_point_in_time_join",
    f"""WITH anchors AS (
         SELECT event_id, user_id, ts FROM events
         WHERE event_type = 'purchase'
       )
       SELECT a.event_id,
              CAST(COUNT(e.event_id) AS BIGINT) AS n_prior,
              ROUND(COALESCE(SUM(CAST(e.value AS DECIMAL(18,6))), 0), 4)::DOUBLE
                AS prior_value
       FROM anchors a
       LEFT JOIN events e
         ON e.user_id = a.user_id
        AND e.ts >= a.ts - INTERVAL {_LOOKBACK_SECONDS} SECONDS
        AND e.ts < a.ts
       GROUP BY a.event_id
       ORDER BY a.event_id LIMIT 100""",
)
def q85(spark, sf_dir):
    # Feature backfill: for every anchor event, aggregate the same
    # user's activity in the preceding hour, leakage-free (strictly
    # before the anchor). The join is an EQUI-join on user_id with the
    # time range as a join-time filter — Catalyst plans a hash/sort-merge
    # join on user_id, never a cross product; per-user fan-out is
    # bounded by the lookback window.
    e = _t(spark, sf_dir, "events")
    anchors = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("a_ts")
    )
    hist = e.select(
        F.col("user_id").alias("h_user"),
        F.col("event_id").alias("h_id"),
        F.col("ts").alias("h_ts"),
        F.col("value").alias("h_value"),
    )
    joined = anchors.join(
        hist,
        (F.col("user_id") == F.col("h_user"))
        & (
            F.col("h_ts")
            >= F.col("a_ts") - F.expr(f"INTERVAL {_LOOKBACK_SECONDS} SECONDS")
        )
        & (F.col("h_ts") < F.col("a_ts")),
        "left",
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.count("h_id").alias("n_prior"),
            F.round(
                F.coalesce(F.sum(F.col("h_value").cast("decimal(18,6)")), F.lit(0)),
                4,
            )
            .cast("double")
            .alias("prior_value"),
        )
        .orderBy("event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q86: TPC-H Q18 — large-volume orders (semi-join on a HAVING subquery)
# ---------------------------------------------------------------------------

_Q18_QTY = 250


@register(
    "q86_tpch_q18",
    f"""SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
              ROUND(o.o_totalprice, 2) AS totalprice,
              ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 2)::DOUBLE AS sum_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderkey IN (
         SELECT l_orderkey FROM lineitem
         GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
       )
       GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
       ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""",
)
def q86(spark, sf_dir):
    # TPC-H Q18 shape. The HAVING subquery reuses the same lineitem
    # relation — one partial-agg pass building the big-order key set,
    # then a left-semi join back onto the fact. The semi side is the
    # ~0.1% of orders clearing the quantity bar, so at scale it
    # broadcast-prunes the fact scan before the customer join.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q87: TPC-H Q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"


@register(
    "q87_tpch_q7",
    f"""SELECT supp_nation, cust_nation, l_year,
              ROUND(SUM(volume), 2)::DOUBLE AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                YEAR(l.l_shipdate) AS l_year,
                CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
         FROM supplier s
         JOIN lineitem l ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
             OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
           AND l.l_shipdate >= TIMESTAMP '1995-01-01'
           AND l.l_shipdate < TIMESTAMP '1997-01-01'
       ) shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
)
def q87(spark, sf_dir):
    # TPC-H Q7 shape: the nation-pair predicate prunes supplier and
    # customer through their broadcast nation joins BEFORE the fact-fact
    # join, and the shipdate range pushes into the lineitem scan. The
    # only shuffles left are lineitem⋈orders and the final tiny agg.
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pair = F.col("n_name").isin(_Q7_N1, _Q7_N2)
    sn = s.join(broadcast(n.filter(pair)), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cn = c.join(broadcast(n.filter(pair)), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    volume = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q88: TPC-H Q13 — customer order-count distribution (outer join histogram)
# ---------------------------------------------------------------------------


@register(
    "q88_tpch_q13",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
       FROM (
         SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
         FROM customer c
         LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
         GROUP BY c.c_custkey
       ) t
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
)
def q88(spark, sf_dir):
    # TPC-H Q13 shape: the filter lives in the JOIN CONDITION, not a
    # WHERE (customers whose only orders are urgent must still count as
    # zero-order customers). Two aggregations: per-customer count (high
    # cardinality, parallel) then the tiny histogram.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q89: TPC-H Q16 — supplier-count per part attribute (distinct agg + NOT IN)
# ---------------------------------------------------------------------------


@register(
    "q89_tpch_q16",
    """SELECT p.p_brand, p.p_type, p.p_size,
              CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
       WHERE p.p_brand <> 'BRAND_1'
         AND p.p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
         AND l.l_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
         )
       GROUP BY p.p_brand, p.p_type, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
       LIMIT 100""",
)
def q89(spark, sf_dir):
    # TPC-H Q16 shape (lineitem stands in for partsupp — the testdata
    # ships no partsupp table): IN-list + inequality push into the part
    # scan, the excluded-supplier set is a broadcast anti-join, and the
    # distinct count shuffles once on the (brand, type, size) group key.
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_1")
        & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q90: TPC-H Q17 — small-quantity-order revenue (correlated avg per part)
# ---------------------------------------------------------------------------


@register(
    "q90_tpch_q17",
    """SELECT ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand = 'BRAND_2'
         AND l.l_quantity < (
           SELECT 0.2 * AVG(CAST(l2.l_quantity AS DECIMAL(18,4)))
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
         )""",
)
def q90(spark, sf_dir):
    # TPC-H Q17 shape: the correlated scalar subquery decorrelates to a
    # per-part average computed ONCE (partial agg on l_partkey), joined
    # back to the filtered fact — never a per-row subquery execution.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "BRAND_2")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg(_dec("l_quantity", 4))).alias("_bar")
    )
    return (
        li.join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_bar"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")) / 7.0, 2).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q91: TPC-H Q19 — disjunctive multi-attribute predicates
# ---------------------------------------------------------------------------


@register(
    "q91_tpch_q19",
    """SELECT ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)::DOUBLE
                AS revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'BRAND_1' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'BRAND_2' AND p.p_size BETWEEN 10 AND 25
              AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'BRAND_3' AND p.p_size BETWEEN 20 AND 35
              AND l.l_quantity BETWEEN 20 AND 30)""",
)
def q91(spark, sf_dir):
    # TPC-H Q19 shape: OR-of-ANDs across both join sides. The part-only
    # disjunct (brand ∈ {1,2,3}) is implied by the full predicate and
    # prunes the broadcast side before the join; the mixed terms stay as
    # the post-join filter. Catalyst derives the implied single-side
    # filters via constraint propagation.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "BRAND_1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "BRAND_2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "BRAND_3")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        li.join(broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q92: TPC-H Q22 shape — rich idle customers (scalar subquery + anti join)
# ---------------------------------------------------------------------------


@register(
    "q92_tpch_q22",
    """WITH bar AS (
         SELECT AVG(CAST(c_acctbal AS DECIMAL(18,4))) AS avg_bal
         FROM customer WHERE c_acctbal > 0
       )
       SELECT c.c_mktsegment,
              CAST(COUNT(*) AS BIGINT) AS numcust,
              ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2)::DOUBLE AS totacctbal
       FROM customer c, bar
       WHERE c.c_acctbal > bar.avg_bal
         AND NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
         )
       GROUP BY c.c_mktsegment
       ORDER BY c.c_mktsegment""",
)
def q92(spark, sf_dir):
    # TPC-H Q22 shape (mktsegment stands in for the phone country code —
    # no phone column in the testdata): scalar-subquery threshold, then
    # an anti join against orders, then a tiny aggregate. The threshold
    # is one scalar crossJoin-broadcast; the anti join shuffles on the
    # customer key unless AQE broadcasts the smaller side.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    bar = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg(_dec("c_acctbal", 4)).alias("_avg_bal")
    )
    return (
        c.crossJoin(broadcast(bar))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q93: TPC-H Q4 — order priority checking (EXISTS semi-join + date arith)
# ---------------------------------------------------------------------------


@register(
    "q93_tpch_q4",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       FROM orders
       WHERE EXISTS (
         SELECT 1 FROM lineitem
         WHERE l_orderkey = o_orderkey
           AND l_shipdate > o_orderdate + INTERVAL 90 DAY
       )
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
)
def q93(spark, sf_dir):
    # TPC-H Q4 shape ("late" = shipped >90 days after the order date —
    # the testdata carries no commit/receipt dates): correlated EXISTS
    # becomes a left-semi join whose date condition rides in the join
    # predicate, then a tiny priority aggregate.
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q94: TPC-H Q6 — forecast revenue change (pure scan-side filters)
# ---------------------------------------------------------------------------


@register(
    "q94_tpch_q6",
    """SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))), 2)::DOUBLE AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.03 AND 0.07
         AND l_quantity < 24""",
)
def q94(spark, sf_dir):
    # TPC-H Q6: every predicate pushes into the parquet scan; the plan
    # is scan → partial agg → one-row exchange. The canonical "is
    # pushdown actually working" workload.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q95: TPC-H Q14 — promotion revenue share (conditional agg over a join)
# ---------------------------------------------------------------------------


@register(
    "q95_tpch_q14",
    """SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE 0 END)
              / SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 4)::DOUBLE
                AS promo_revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1996-02-01'""",
)
def q95(spark, sf_dir):
    # TPC-H Q14: month filter pushes into the fact scan, part broadcast,
    # numerator/denominator in ONE aggregation pass (conditional agg).
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                4,
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q96: TPC-H Q15 — top supplier (aggregate + scalar-max self-reference)
# ---------------------------------------------------------------------------


@register(
    "q96_tpch_q15",
    """WITH rev AS (
         SELECT l_suppkey,
                SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey
       )
       SELECT s.s_suppkey, s.s_name, ROUND(rev.total_rev, 2)::DOUBLE AS total_rev
       FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
       WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
       ORDER BY s.s_suppkey""",
)
def q96(spark, sf_dir):
    # TPC-H Q15: the revenue view is computed ONCE and referenced twice
    # (rows + scalar max) — decimal arithmetic makes the equality exact,
    # so ties surface identically in both engines.
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("_top"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(broadcast(top))
        .filter(F.col("total_rev") == F.col("_top"))
        .join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q97: TPC-H Q21 — suppliers who alone shipped late (semi + double anti)
# ---------------------------------------------------------------------------


@register(
    "q97_tpch_q21",
    """WITH late AS (
         SELECT l.l_orderkey, l.l_suppkey
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       )
       , pairs AS (
         SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
         FROM lineitem l1
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         WHERE o.o_orderstatus = 'F'
       )
       SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
       FROM pairs p
       JOIN supplier s ON s.s_suppkey = p.l_suppkey
       WHERE EXISTS (SELECT 1 FROM late
                     WHERE late.l_orderkey = p.l_orderkey
                       AND late.l_suppkey = p.l_suppkey)
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = p.l_orderkey
                       AND l2.l_suppkey <> p.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late
                         WHERE late.l_orderkey = p.l_orderkey
                           AND late.l_suppkey <> p.l_suppkey)
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name
       LIMIT 50""",
)
def q97(spark, sf_dir):
    # TPC-H Q21 shape ("late" = shipped >60 days after order date): the
    # hardest subquery combo in the suite — a semi join (this supplier
    # WAS late on the order), another semi (the order had OTHER
    # suppliers), and an anti (no OTHER supplier was late). Each
    # decorrelates to a join on (orderkey, suppkey-inequality); dedup
    # before the joins keeps the fan-out bounded.
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    base = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .drop("o_orderkey")
    )
    l_late = late.select(
        F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls")
    )
    mine_late = base.join(
        l_late,
        (F.col("l_orderkey") == F.col("lo")) & (F.col("l_suppkey") == F.col("ls")),
        "left_semi",
    )
    others = li.select(
        F.col("l_orderkey").alias("oo"), F.col("l_suppkey").alias("os")
    ).distinct()
    has_others = mine_late.join(
        others,
        (F.col("l_orderkey") == F.col("oo")) & (F.col("l_suppkey") != F.col("os")),
        "left_semi",
    )
    no_other_late = has_others.join(
        l_late,
        (F.col("l_orderkey") == F.col("lo")) & (F.col("l_suppkey") != F.col("ls")),
        "left_anti",
    )
    return (
        no_other_late.join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q98: TPC-H Q8 — national market share (5-way join + conditional agg)
# ---------------------------------------------------------------------------


@register(
    "q98_tpch_q8",
    """SELECT o_year,
              ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                    / SUM(volume), 6)::DOUBLE AS mkt_share
       FROM (
         SELECT YEAR(o.o_orderdate) AS o_year,
                CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
                n2.n_name AS supp_nation
         FROM lineitem l
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
         JOIN region r ON r.r_regionkey = n1.n_regionkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1995-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
       ) shares
       GROUP BY o_year
       ORDER BY o_year""",
)
def q98(spark, sf_dir):
    # TPC-H Q8: seven relations; every dimension chain (customer→nation
    # →region, supplier→nation) broadcasts, and the single fact-fact
    # join (lineitem⋈orders) carries the date filter pushed into the
    # orders scan. Market share = conditional / total in one agg pass.
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = c.join(
        broadcast(
            n.join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = s.join(
        broadcast(n.select(F.col("n_nationkey").alias("_nk2"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("_nk2"),
    ).select("s_suppkey", "supp_nation")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust_nation), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0))
                )
                / F.sum("volume"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q99: TPC-H Q9 — product-line profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "q99_tpch_q9",
    """SELECT nation, o_year, ROUND(SUM(amount), 2)::DOUBLE AS sum_profit
       FROM (
         SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
                CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2)) * 0.1
                  * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
         FROM lineitem l
         JOIN part p ON p.p_partkey = l.l_partkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE p.p_type = 'ECONOMY'
       ) profit
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
)
def q99(spark, sf_dir):
    # TPC-H Q9 shape (supply cost proxied at 10% of retail price per
    # unit — the testdata ships no partsupp): the part filter prunes the
    # broadcast side FIRST, so the fact scan join output is ~1/6 of
    # lineitem before the orders join.
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    sn = s.join(
        broadcast(n.select(F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("_nk"),
    ).select("s_suppkey", "nation")
    amount = _dec("l_extendedprice") * (1 - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * F.lit(0.1).cast("decimal(18,2)") * _dec("l_quantity")
    return (
        li.join(broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q100: TPC-H Q11 — important stock (group + global-fraction threshold)
# ---------------------------------------------------------------------------


@register(
    "q100_tpch_q11",
    """WITH value_by_part AS (
         SELECT l.l_partkey,
                SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(l.l_quantity AS DECIMAL(18,2))) AS val
         FROM lineitem l
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         WHERE n.n_name = 'NATION_3'
         GROUP BY l.l_partkey
       )
       SELECT l_partkey, ROUND(val, 2)::DOUBLE AS val
       FROM value_by_part
       WHERE val > (SELECT SUM(val) * 0.0003 FROM value_by_part)
       ORDER BY val DESC, l_partkey
       LIMIT 100""",
)
def q100(spark, sf_dir):
    # TPC-H Q11 shape (lineitem value per part standing in for partsupp
    # stock value): the per-part aggregate is referenced twice — rows
    # and the global-fraction scalar — computed once, scalar broadcast.
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sn = s.join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    # `sn` is DERIVED (supplier filtered to one nation), not a fixed-size
    # dim: supplier grows with SF, so a compile-time broadcast hint here
    # would be an OOM assertion at 100×. No hint — AQE broadcasts it at
    # runtime when the measured size allows, else shuffles. Only the
    # 25-row `nation` keeps its hint.
    by_part = (
        li.join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("val"))
    )
    # 0.0003 keeps the threshold non-degenerate at BOTH test scales
    # (0.001 selects zero parts at sf0.1 — the value spread tightens as
    # the corpus grows)
    bar = by_part.agg((F.sum("val") * F.lit(0.0003)).alias("_bar"))
    return (
        by_part.crossJoin(broadcast(bar))
        .filter(F.col("val") > F.col("_bar"))
        .select("l_partkey", F.round("val", 2).cast("double").alias("val"))
        .orderBy(F.desc("val"), "l_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q101: TPC-H Q20 — excess-shipment suppliers (nested semi-join chain)
# ---------------------------------------------------------------------------


@register(
    "q101_tpch_q20",
    """SELECT s.s_name, CAST(s.s_suppkey AS BIGINT) AS s_suppkey
       FROM supplier s
       WHERE s.s_suppkey IN (
         SELECT l.l_suppkey FROM lineitem l
         WHERE l.l_partkey IN (
           SELECT p_partkey FROM part WHERE p_name LIKE '%a%'
         )
         AND l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l.l_suppkey, l.l_partkey
         HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 50
       )
       ORDER BY s.s_name, s_suppkey""",
)
def q101(spark, sf_dir):
    # TPC-H Q20 shape (shipped quantity stands in for stock): part-name
    # filter → per-(supplier, part) quantity HAVING → supplier semi
    # join. Each level is an equi-join on keys the previous level
    # produced; nothing fans out.
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%")).select(
        "p_partkey"
    )
    # Neither join side below gets a compile-time broadcast hint: `p` is
    # a '%a%'-filtered slice of part (≈half the table — grows with SF)
    # and `heavy` is a derived aggregate with unknowable size. A hint is
    # a compile-time OOM assertion at 100×; AQE converts either join to
    # broadcast at runtime iff the measured size fits the budget.
    heavy = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_suppkey").cast("bigint").alias("s_suppkey"))
        .orderBy("s_name", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# q102: TPC-H Q2 — min-cost supplier per part (correlated min + multi-join)
# ---------------------------------------------------------------------------


@register(
    "q102_tpch_q2",
    """WITH cost AS (
         SELECT l.l_partkey, l.l_suppkey,
                SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
         FROM lineitem l
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         JOIN region r ON r.r_regionkey = n.n_regionkey
         WHERE r.r_name = 'ASIA'
         GROUP BY l.l_partkey, l.l_suppkey
       )
       SELECT s.s_name, n.n_name, p.p_partkey, ROUND(c.val, 2)::DOUBLE AS val
       FROM part p
       JOIN cost c ON c.l_partkey = p.p_partkey
       JOIN supplier s ON s.s_suppkey = c.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE p.p_size = 15
         AND c.val = (SELECT MIN(val) FROM cost c2
                      WHERE c2.l_partkey = p.p_partkey)
       ORDER BY p.p_partkey, s.s_name
       LIMIT 100""",
)
def q102(spark, sf_dir):
    # TPC-H Q2 shape (per-(part, supplier) sale value from lineitem
    # stands in for partsupp supply cost; exact decimal SUM makes the
    # correlated-min equality engine-stable): the correlated subquery
    # decorrelates to a per-part min joined back — computed once, not
    # per row. Region/nation chains broadcast.
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    asia_supp = (
        s.join(
            broadcast(n.join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    # `asia_supp` and the filtered `p` are DERIVED sides whose size grows
    # with SF (supplier/part are SF-proportional, unlike nation/region) —
    # no compile-time broadcast hints on them; AQE broadcasts at runtime
    # when measured sizes fit. Hints stay only on the 25/5-row
    # nation⋈region chain above.
    cost = (
        li.join(
            asia_supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("val"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("_mpk")).agg(
        F.min("val").alias("_minval")
    )
    return (
        cost.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            min_cost,
            (F.col("l_partkey") == F.col("_mpk")) & (F.col("val") == F.col("_minval")),
        )
        .join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            F.round("val", 2).cast("double").alias("val"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q103: TPC-H Q12 — shipmode priority counts (derived l_shipmode)
# ---------------------------------------------------------------------------

# The testdata lineitem has no l_shipmode / l_commitdate / l_receiptdate
# (FIXTURES.md), so the Q12 shape derives all three deterministically
# from (l_orderkey, l_linenumber, l_shipdate) with the SAME integer/date
# arithmetic in Spark and DuckDB — engine-parity by construction, which
# keeps the query fully oracle-checkable. Multipliers 3/5, 11, 13 are
# coprime with the moduli so the derived columns aren't degenerate
# functions of l_linenumber alone.
_SHIPMODES = ("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")


@register(
    "q103_tpch_q12",
    """WITH li AS (
         SELECT l_orderkey,
                CASE CAST((l_orderkey * 3 + l_linenumber * 5) % 7 AS INTEGER)
                  WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
                  WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
                  ELSE 'FOB' END AS l_shipmode,
                CAST(l_shipdate AS DATE) AS ship_d,
                CAST(l_shipdate AS DATE)
                  + CAST((l_orderkey * 13 + l_linenumber) % 60 - 30 AS INTEGER)
                  AS commit_d,
                CAST(l_shipdate AS DATE)
                  + CAST((l_orderkey * 11 + l_linenumber) % 30 + 1 AS INTEGER)
                  AS receipt_d
         FROM lineitem)
       SELECT li.l_shipmode,
              CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
       WHERE li.l_shipmode IN ('MAIL', 'SHIP')
         AND li.commit_d < li.receipt_d
         AND li.ship_d < li.commit_d
         AND li.receipt_d >= DATE '1996-01-01'
         AND li.receipt_d < DATE '1997-01-01'
       GROUP BY li.l_shipmode ORDER BY li.l_shipmode""",
)
def q103(spark, sf_dir):
    # TPC-H Q12 (spec 2.15): late-shipment priority counts by ship mode.
    # All derived-column predicates are map-side row expressions on the
    # lineitem scan (whole-stage codegen, no UDF); they cut the fact to a
    # small slice BEFORE the orders join, which AQE then broadcasts at
    # test scale and sort-merges at 100 TB — either way the join key is
    # the order key, no fan-out. Two-row result after a partial+final
    # conditional aggregate.
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    mode_idx = ((F.col("l_orderkey") * 3 + F.col("l_linenumber") * 5) % 7).cast("int")
    ship_d = F.col("l_shipdate").cast("date")
    commit_d = F.date_add(
        ship_d, ((F.col("l_orderkey") * 13 + F.col("l_linenumber")) % 60 - 30).cast("int")
    )
    receipt_d = F.date_add(
        ship_d, ((F.col("l_orderkey") * 11 + F.col("l_linenumber")) % 30 + 1).cast("int")
    )
    shaped = li.select(
        "l_orderkey",
        F.element_at(F.array(*[F.lit(m) for m in _SHIPMODES]), mode_idx + 1).alias(
            "l_shipmode"
        ),
        ship_d.alias("ship_d"),
        commit_d.alias("commit_d"),
        receipt_d.alias("receipt_d"),
    ).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("commit_d") < F.col("receipt_d"))
        & (F.col("ship_d") < F.col("commit_d"))
        & (F.col("receipt_d") >= F.lit("1996-01-01").cast("date"))
        & (F.col("receipt_d") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        shaped.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


# ---------------------------------------------------------------------------
# q104: LATERAL correlated join — per-row derived relation
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c_custkey, t.cnt, t.total
FROM customer c, LATERAL (
  SELECT COUNT(*) AS cnt,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
  FROM orders WHERE o_custkey = c.c_custkey
) t
WHERE c_custkey <= 200 ORDER BY c_custkey
"""


@register("q104_lateral_join", _LATERAL_SQL)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LATERAL correlated subquery (SQL:2016 / Spark 3.4+): the derived
    # relation re-evaluates per outer row; Catalyst decorrelates it to
    # an aggregate + outer join, so the plan is a join, not a loop —
    # identical SQL runs on the DuckDB side.
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# q105: mode / exact median — ordered-statistic aggregates
# ---------------------------------------------------------------------------

_MODE_MEDIAN_SQL = """
SELECT mode(CASE WHEN l_quantity > 20 THEN 'heavy' ELSE 'light' END) AS mode_band,
       ROUND(median(CAST(l_quantity AS DOUBLE)), 2) AS med_qty,
       ROUND(median(CAST(l_extendedprice AS DOUBLE)), 2) AS med_price,
       COUNT(*) AS n
FROM lineitem
"""


@register("q105_mode_median", _MODE_MEDIAN_SQL)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mode() over a two-band CASE whose frequencies differ by design
    # (quantity is ~uniform on 1..50, so >20 covers 60% of rows at any
    # scale factor — the modal band can never tie); median() is the
    # exact interpolating form in both engines.
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_MODE_MEDIAN_SQL)


# ---------------------------------------------------------------------------
# q106: GROUPING SETS — multi-granularity aggregation in one pass
# ---------------------------------------------------------------------------

_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status,
       ROUND(SUM(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("q106_grouping_sets", _GROUPING_SETS_SQL)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arbitrary GROUPING SETS (the general form behind q19's rollup and
    # q76's cube): three granularities in ONE scan — Spark expands the
    # sets with a single Expand node feeding one partial+final hash
    # agg, so the fact table is read once however many granularities
    # ship. grouping() markers disambiguate NULL data from NULL
    # "grouped-out" columns; NULLS FIRST pins the engines' differing
    # sort defaults. Identical SQL runs on both engines.
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# q107: time-weighted average — irregular-series analytics
# ---------------------------------------------------------------------------

_TWA_SQL = """
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS ts_us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
  FROM events
)
SELECT user_id,
       ROUND(SUM(value * (nxt_us - ts_us)) / SUM(nxt_us - ts_us), 6) AS twa,
       COUNT(*) AS n_intervals
FROM seq WHERE nxt_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


@register("q107_time_weighted_avg", _TWA_SQL)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The hypertable-style time_weight('LOCF') aggregate over an
    # irregular event series: each reading is weighted by how long it
    # held (microsecond-exact via unix_micros ↔ DuckDB epoch_us — the
    # second-truncating unix_timestamp would diverge on sub-second
    # gaps). One window (keyed by user_id, real cardinality) + one
    # hash agg; weights cancel units in the ratio.
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "user_id", "value",
        us.alias("ts_us"),
        F.lead(us).over(w).alias("nxt_us"),
    )
    return (
        seq.filter(F.col("nxt_us").isNotNull())
        .withColumn("dur", F.col("nxt_us") - F.col("ts_us"))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6).alias("twa"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q108: gap-fill + LOCF — spine join with last-observation carry-forward
# ---------------------------------------------------------------------------

_LOCF_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         ROUND(max_by(value, ts), 2) AS v
  FROM events WHERE user_id < 20 GROUP BY user_id, date_trunc('hour', ts)
), spine AS (
  SELECT g AS h FROM generate_series(
    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-30 23:00:00',
    INTERVAL '1 hour') AS t(g)
), grid AS (
  SELECT u.user_id, s.h
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u CROSS JOIN spine s
)
SELECT g.user_id, g.h,
       last_value(hr.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
ORDER BY g.user_id, g.h
"""


@register("q108_gap_fill_locf", _LOCF_SQL)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hypertable gap-fill: downsample to hourly (max_by over the
    # tie-free (user, ts) key — uniqueness asserted by the fixture), a
    # fixed calendar spine (same constant-range pattern as q75; the
    # fixture's event window is 2024-01), the users×hours grid as the
    # ONLY intentional cross join (both sides bounded dimensions:
    # |users∩filter| × 720 rows), then LOCF via last(ignorenulls) over
    # an unbounded-preceding frame keyed by user — the shuffle key is
    # the entity id, never the calendar.
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("user_id") < 20)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.max_by("value", "ts"), 2).alias("v"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-30 23:00:00").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h")
    )
    users = e.filter(F.col("user_id") < 20).select("user_id").distinct()
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        users.join(spine)
        .join(hourly, ["user_id", "h"], "left")
        .withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
        .select("user_id", "h", "v_filled")
        .orderBy("user_id", "h")
    )


# ---------------------------------------------------------------------------
# q109: reset-aware counter increase — PromQL increase() semantics
# ---------------------------------------------------------------------------

_COUNTER_SQL = """
WITH d AS (
  SELECT user_id, ts, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id, date_trunc('day', ts) AS day,
       ROUND(SUM(CASE WHEN prev IS NULL THEN 0.0
                      WHEN value >= prev THEN value - prev
                      ELSE value END), 4) AS increase,
       COUNT(*) AS samples
FROM d GROUP BY user_id, date_trunc('day', ts)
ORDER BY user_id, day
"""


@register("q109_counter_increase", _COUNTER_SQL)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Metrics-pipeline parity: PromQL-style increase() over counter
    # samples — positive deltas accumulate; a decrease means the
    # counter reset, so the post-reset value IS the increase since the
    # restart. One entity-keyed window + one hash agg; the window key
    # (user_id) is the real cardinality, never the calendar.
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.select("user_id", "ts", "event_id", "value").withColumn(
        "prev", F.lag("value").over(w)
    ).withColumn(
        "inc",
        F.when(F.col("prev").isNull(), F.lit(0.0))
         .when(F.col("value") >= F.col("prev"), F.col("value") - F.col("prev"))
         .otherwise(F.col("value")),
    )
    return (
        d.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.sum("inc"), 4).alias("increase"),
            F.count("*").alias("samples"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# q110: linear-interpolation gap fill (exact integer arithmetic)
# ---------------------------------------------------------------------------

_INTERP_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(ROUND(max_by(value, ts) * 100, 0) AS BIGINT) AS vi
  FROM events WHERE user_id < 10 GROUP BY user_id, date_trunc('hour', ts)
), spine AS (
  SELECT g AS h FROM generate_series(
    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-30 23:00:00',
    INTERVAL '1 hour') AS t(g)
), grid AS (
  SELECT u.user_id, s.h, hr.vi
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10) u
  CROSS JOIN spine s
  LEFT JOIN hourly hr ON u.user_id = hr.user_id AND s.h = hr.h
), ctx AS (
  SELECT user_id, h, vi,
    last_value(vi IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN vi IS NOT NULL THEN h END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(vi IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN vi IS NOT NULL THEN h END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM grid
), rat AS (
  SELECT user_id, h, pv, nv,
         CAST((epoch_us(h) - epoch_us(ph)) / 3600000000 AS BIGINT) AS k,
         CAST((epoch_us(nh) - epoch_us(ph)) / 3600000000 AS BIGINT) AS n
  FROM ctx
)
SELECT user_id, h,
  CASE
    WHEN pv IS NULL THEN nv * 100
    WHEN nv IS NULL OR n = 0 THEN pv * 100
    ELSE (200 * (pv * n + (nv - pv) * k) + n) // (2 * n)
  END AS v_interp_e4
FROM rat ORDER BY user_id, h
"""


@register("q110_gap_fill_interp", _INTERP_SQL)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Linear-interpolation gap fill (the other hypertable fill mode
    # next to q108's LOCF): neighbors found with last/first(ignorenulls)
    # over opposite unbounded frames, then the interpolated value is
    # computed ENTIRELY in integers — hundredth-scaled samples, whole-
    # hour offsets, one half-up integer division (DIV / //) — and
    # reported in 1e-4 units. Rationale: with ROUND(double, 4) the two
    # engines disagree on .xxxx5 boundaries (Spark rounds the shortest
    # decimal repr HALF_UP, DuckDB rounds the binary double), so exact
    # integer arithmetic is the only hash-stable formulation.
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("user_id") < 10)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.max_by("value", "ts") * 100, 0).cast("bigint").alias("vi"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-30 23:00:00").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h")
    )
    users = e.filter(F.col("user_id") < 10).select("user_id").distinct()
    g = users.join(spine).join(hourly, ["user_id", "h"], "left")
    wb = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        0, Window.unboundedFollowing
    )
    hk = F.when(F.col("vi").isNotNull(), F.col("h"))

    def hrs(a, b):
        return (
            (F.unix_micros(a.cast("timestamp")) - F.unix_micros(b.cast("timestamp")))
            / F.lit(3600000000)
        ).cast("bigint")

    return (
        g.withColumn("pv", F.last("vi", ignorenulls=True).over(wb))
        .withColumn("ph", F.last(hk, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("vi", ignorenulls=True).over(wf))
        .withColumn("nh", F.first(hk, ignorenulls=True).over(wf))
        .withColumn("k", hrs(F.col("h"), F.col("ph")))
        .withColumn("n", hrs(F.col("nh"), F.col("ph")))
        .withColumn(
            "v_interp_e4",
            F.when(F.col("pv").isNull(), F.col("nv") * 100)
            .when(F.col("nv").isNull() | (F.col("n") == 0), F.col("pv") * 100)
            .otherwise(
                F.expr("(200 * (pv * n + (nv - pv) * k) + n) DIV (2 * n)")
            ),
        )
        .select("user_id", "h", "v_interp_e4")
        .orderBy("user_id", "h")
    )


# ---------------------------------------------------------------------------
# q113: SCD Type-2 history — change-compressed versions with validity spans
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, value FROM ordered
  WHERE prev IS NULL OR value <> prev
)
SELECT user_id,
       ROW_NUMBER() OVER w AS version_n,
       value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       CAST(LEAD(ts) OVER w IS NULL AS INT) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version_n LIMIT 500
"""


@register("q113_scd2_history", _SCD2_SQL)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The batch form of the SCD Type-2 materializer
    # (streaming/pipeline.py::scd2_upsert_parquet): treat the event
    # stream as attribute changes per entity, compress consecutive
    # identical values (a CDC feed can re-deliver unchanged images),
    # open a version at each change and close it at the next — the
    # "what did this row look like at time T" dimension-history shape.
    # Both windows key on user_id (real cardinality, short per-key
    # history — parallelizes like any hash shuffle; never a global
    # sort). value passes through untouched so the cross-engine hash
    # needs no decimal canonicalization.
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
    )
    return (
        changes.withColumn("version_n", F.row_number().over(w))
        .withColumn("valid_from", F.col("ts"))
        .withColumn("valid_to", F.lead("ts").over(w))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .select("user_id", "version_n", "value", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "version_n")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# q115: point-in-time join against SCD2 history — the dimension-history
# lookup the reference's "Realtime analytics" consumers run downstream
# (readme.md:40-43): instead of re-scanning raw events per anchor
# (q85's form), anchors probe the change-COMPRESSED validity windows of
# q113's materializer, so per-anchor work is one interval hit, not a
# window re-aggregation.
# ---------------------------------------------------------------------------

_PIT_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, value FROM ordered
  WHERE prev IS NULL OR value <> prev
), hist AS (
  SELECT user_id,
         ROW_NUMBER() OVER w AS version_n,
         value,
         ts AS valid_from,
         LEAD(ts) OVER w AS valid_to
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), anchors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id, a.user_id,
       h.version_n AS asof_version, h.value AS asof_value
FROM anchors a JOIN hist h
  ON h.user_id = a.user_id
 AND h.valid_from <= a.ts
 AND (h.valid_to > a.ts OR h.valid_to IS NULL)
ORDER BY a.event_id LIMIT 300
"""


@register("q115_pit_scd2_join", _PIT_SCD2_SQL)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    # History side: q113's change compression (consecutive identical
    # values collapse; each change opens a version, closed by the next
    # change's start). The half-open [valid_from, valid_to) windows
    # partition each user's timeline, so the point-in-time predicate
    # hits EXACTLY one version per anchor — no dedupe needed.
    #
    # Scale shape: the join is EQUI on user_id with the interval test
    # as a join-time filter (hash/sort-merge on the key, never a cross
    # product — plan-gated); the history side is pre-compressed, so
    # per-user fan-out is #versions, typically orders of magnitude
    # below #events. At 100 TB the history table would be materialized
    # once by scd2_history_writer and bucketed by the entity key; the
    # probe is then a co-located join instead of this inline rebuild.
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
    )
    hist = (
        changes.withColumn("version_n", F.row_number().over(w))
        .withColumn("valid_from", F.col("ts"))
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            F.col("user_id").alias("h_user"),
            "version_n",
            F.col("value").alias("h_value"),
            "valid_from",
            "valid_to",
        )
    )
    anchors = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("a_ts")
    )
    return (
        anchors.join(
            hist,
            (F.col("user_id") == F.col("h_user"))
            & (F.col("valid_from") <= F.col("a_ts"))
            & ((F.col("valid_to") > F.col("a_ts")) | F.col("valid_to").isNull()),
        )
        .select(
            "event_id",
            "user_id",
            F.col("version_n").alias("asof_version"),
            F.col("h_value").alias("asof_value"),
        )
        .orderBy("event_id")
        .limit(300)
    )


# ---------------------------------------------------------------------------
# q127: event-transition matrix — Markov first-order transition counts
# and probabilities over each user's event sequence (the clickstream
# "what happens after X" analytics a CDC consumer of the events table
# runs; reference readme.md:40-43 delegates exactly this to consumers)
# ---------------------------------------------------------------------------


@register(
    "q127_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ), c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE) /
                 SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    ORDER BY from_type, to_type
    """,
)
def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the LEAD window partitions on user_id — entity-keyed,
    millions of small groups, parallelizes like any hash shuffle (never
    a global sort). The transition matrix is |event_types|² rows, so the
    probability-normalizing window over from_type runs on a bounded
    aggregate, not the raw stream. Deterministic under ts ties via the
    (ts, event_id) composite order."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    c = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# q130: exponential time-decay features — recency-weighted per-user
# aggregates (the standard feature-engineering transform for churn /
# engagement models: yesterday's purchase counts more than last
# month's). Decay at day granularity so the weight is an exact integer
# power in both engines.
# ---------------------------------------------------------------------------


@register(
    "q130_decay_features",
    """
    WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_d FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value,
           ROUND(SUM(value * exp(-date_diff('day', CAST(ts AS DATE), ref_d)
                                 / 30.0)), 6) AS decayed_value
    FROM events CROSS JOIN ref
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def _q_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one scan, one partial→final hash aggregate on
    user_id; the reference date is a single driver-side scalar (same
    budget class as BM25's avgdl), folded into the row expression so
    the decay weight stays inside codegen. Day-granular decay keeps the
    exponent an exact integer in both engines (a sub-second exponent
    would hash-diverge on timestamp-to-double conventions)."""
    e = _t(spark, sf_dir, "events")
    ref_d = e.agg(F.max(F.to_date("ts"))).first()[0]
    days = F.datediff(F.lit(ref_d), F.to_date("ts"))
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.round(
                F.sum(F.col("value") * F.exp(-days / F.lit(30.0))), 6
            ).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q132: time-bound conversion funnel — signup → purchase within a
# 1-hour window of the user's FIRST signup (q69's funnel counts steps
# ever; real product funnels bound the conversion window)
# ---------------------------------------------------------------------------


@register(
    "q132_windowed_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
      SELECT DISTINCT s.user_id
      FROM s JOIN events e ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= s.s_ts AND e.ts < s.s_ts + INTERVAL 1 HOUR
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signups,
           CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted_1h,
           ROUND(CAST((SELECT COUNT(*) FROM conv) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s), 6) AS conversion_rate
    """,
)
def _q_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: anchor table is one hash agg (first signup per
    user); the conversion probe is an equi-join on user_id with the
    time window as a join filter — the q85/q115 interval pattern,
    never a cross product. Both totals fold into one single-row
    aggregate."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    conv = (
        s.join(
            e.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
            ),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_semi",
        )
    )
    return s.agg(F.count("*").alias("n_signups")).crossJoin(
        conv.agg(F.count("*").alias("n_converted_1h"))
    ).select(
        "n_signups",
        "n_converted_1h",
        F.round(
            F.col("n_converted_1h").cast("double") / F.col("n_signups"), 6
        ).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# q133: last-touch attribution — every purchase credits the user's
# most recent PRECEDING non-purchase event (the marketing-attribution
# query every clickstream consumer runs)
# ---------------------------------------------------------------------------


@register(
    "q133_last_touch_attribution",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM seq WHERE event_type = 'purchase'
    GROUP BY touch ORDER BY touch NULLS FIRST
    """,
)
def _q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one entity-keyed window (user_id — parallel hash
    shuffle) carrying a null-skipping LAST over the frame ending one
    row before the purchase, then a tiny |event_types|-row aggregate.
    First-event purchases attribute to NULL (no prior touch) — kept,
    not dropped: silent attribution loss is the classic bug in this
    query."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.select("event_type", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy("touch")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy(F.asc_nulls_first("touch"))
    )
