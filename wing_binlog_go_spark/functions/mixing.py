"""Corpus mixing / sampling / packing for training-data pipelines.

The reference system feeds downstream consumers that assemble training
corpora (`readme.md:40-43` delegates analytics/ETL to subscribers); this
module supplies the corpus-assembly operators those consumers need:

- **stratified_sample** — deterministic per-stratum downsampling by a
  seeded hash threshold (the standard "mixture weights" step when
  combining sources/languages into one training mix).
- **sequence_pack** — assign documents to fixed-token-capacity packs
  (context-window packing), parallel across shards.
- **shuffle_rank** — a deterministic, seeded global shuffle order
  (training-data shuffling must be reproducible; ORDER BY rand() is not).
- **token_budget_head** — take the best documents, in quality order,
  until a token budget is filled (corpus targeting "N tokens").

Everything is Catalyst built-ins; the two global-order operators reuse
the range-partitioned two-phase pattern (no single-partition windows),
so each survives a 1000-executor / 100 TB scale-up.

Hash parity note: sampling/shuffle keys are md5 hex strings — md5 is
identical in Spark (JVM) and DuckDB, which makes every operator here
oracle-checkable, unlike rand()/hash() which differ per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wing_binlog_go_spark.functions.envelope import with_dense_index, with_running_total
from wing_binlog_go_spark.operators.dedup import tokens
from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}

# Default language mixture for the registered query (weights are the
# operator's input, not a claim about good mixtures).
DEFAULT_RATES: dict[str, float] = {
    "en": 0.5,
    "fr": 0.25,
    "de": 0.25,
    "es": 0.125,
    "zh": 0.125,
}
DEFAULT_RATE = 0.05


def _hash_threshold(rate: float) -> str:
    """Rate → 8-hex-digit threshold: P(substr(md5,1,8) < t) == rate.

    Fixed-width lowercase hex compares lexicographically == numerically,
    so the same string comparison works in Spark and DuckDB. rate >= 1
    returns "g", which every hex string sorts below ('f' < 'g') — NOT a
    9-digit number: '100000000' would sort BELOW 'ffffffff' under string
    comparison and silently keep only the '0'-prefixed ~6% of draws.
    """
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 2**32), 0), "08x")


def sample_key(id_col: str | Column, seed: int) -> Column:
    """Seeded uniform draw in hex: substr(md5('<seed>:<id>'), 1, 8).

    NULL ids are coalesced to a sentinel BEFORE hashing: concat_ws
    silently skips NULLs, which would collapse every NULL-id row onto
    the single draw md5('<seed>:') — kept or dropped as one block
    instead of independently. One shared draw for all NULL ids is still
    a single block, so callers that may see NULL ids should supply a
    unique key; the sentinel just keeps NULLs from also colliding with
    the legitimate empty-string id.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    keyed = F.coalesce(c.cast("string"), F.lit("\x00null\x00"))
    return F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), keyed)), 1, 8)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = DEFAULT_RATE,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    A pure row-local filter (no shuffle, no state): the keep/drop
    decision is a function of (seed, id) alone, so the sample is
    reproducible across runs, engines, and cluster layouts, and two
    overlapping runs agree on every shared row — the property training
    pipelines need for resumable corpus builds. Filter is a column
    predicate ⇒ pushes into the scan where the format allows.
    """
    threshold: Column = F.lit(_hash_threshold(default_rate))
    for stratum, rate in rates.items():
        threshold = (
            F.when(F.col(stratum_col) == stratum, F.lit(_hash_threshold(rate)))
            .otherwise(threshold)
        )
    return df.filter(sample_key(id_col, seed) < threshold)


def sequence_pack(
    df: DataFrame,
    capacity: int,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed-capacity token pack.

    Greedy start-bin rule: documents are laid out in ``id_col`` order
    within each shard; a document belongs to the pack where its first
    token lands (``floor(tokens_before / capacity)``). Packs are built
    independently per shard.

    The per-shard running token total uses the shard-prefixed
    range-partitioned two-phase pattern (``with_running_total`` with
    ``partition_cols``), NOT ``Window.partitionBy(shard)``: the default
    shard key is a language column with a handful of distinct values, so
    a plain window would serialize each language's entire sub-corpus
    onto ONE task — at 100 TB that's a single-task sort/OOM. With the
    range form one shard spans many contiguous range partitions and the
    cumsum parallelizes within the shard.

    Returns (id, shard, n_tokens, pack_id).
    """
    n_tok = F.size(tokens(text_col)).cast("bigint")
    scored = df.select(
        F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens")
    )
    cum = with_running_total(
        scored,
        [id_col],
        F.col("n_tokens"),
        out="_cum_tokens",
        partition_cols=[shard_col],
    )
    return cum.select(
        id_col,
        shard_col,
        "n_tokens",
        F.floor(
            (F.col("_cum_tokens") - F.col("n_tokens")) / F.lit(float(capacity))
        )
        .cast("bigint")
        .alias("pack_id"),
    )


def shuffle_rank(
    df: DataFrame, id_col: str = "doc_id", seed: int = 17, out: str = "shuffle_pos"
) -> DataFrame:
    """Deterministic seeded global shuffle position (1-based).

    The shuffle key is a seeded md5 draw, so the permutation is a pure
    function of (seed, ids) — reproducible across runs and engines.
    Ranking reuses ``with_dense_index`` (range-repartition + in-partition
    row_number + driver-side offset map): no single-partition global
    window, so the sort scales like any Spark global sort.
    """
    keyed = df.withColumn("_shuf", sample_key(id_col, seed))
    ranked = with_dense_index(keyed, ["_shuf", id_col], out=out)
    return ranked.drop("_shuf")


def token_budget_head(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Highest-quality documents until the token budget fills.

    Quality = distinct-token ratio (the repetition filter's signal),
    descending, id ascending as the total-order tiebreak. A document is
    kept iff the inclusive running token total in that order stays
    within budget — the deterministic "give me the best N-token corpus"
    selector. Returns (id, n_tokens, cum_tokens).
    """
    toks = tokens(text_col)
    scored = df.select(
        id_col,
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("_q"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    order: list[Column | str] = [F.col("_q").desc(), F.col(id_col).asc()]
    running = with_running_total(scored, order, F.col("n_tokens"), out="cum_tokens")
    return running.filter(F.col("cum_tokens") <= budget).select(
        id_col, "n_tokens", "cum_tokens"
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    total: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """α-temperature mixture sampling: draw ≈``total`` rows with each
    group's quota ∝ n_g^α (the multilingual-rebalancing rule from
    published LM data recipes — α<1 upweights low-resource groups
    relative to their raw counts; α=1 is proportional, α=0 uniform).

    Fully deterministic: each group's quota is
    ``min(n_g, floor(total · n_g^α / Σ n^α + ε))`` and the rows taken
    are the group's lowest seeded-md5 draws, so reruns and overlapping
    corpus builds agree row-for-row (same property as
    ``stratified_sample``, which takes *rates* as input; this operator
    derives the rates from measured counts).

    Scale shape: the counts aggregate is map-side partial over a
    low-cardinality key; the per-group rank is the shard-prefixed
    range-partitioned running total (``with_running_total`` with
    ``partition_cols``), NOT ``Window.partitionBy(group)`` — a plain
    window would serialize each group (a language!) onto one task at
    100 TB. Quotas are a tiny broadcast join. The ε=1e-9 guards the
    floor against last-ulp differences in the float Σ n^α between
    engines/plans; a quota would have to land within 1e-9 of an integer
    boundary to flip.

    Returns (id, group) for the selected rows.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    z = counts.agg(F.sum(F.pow("_n", F.lit(alpha))).alias("_z"))
    takes = counts.crossJoin(F.broadcast(z)).select(
        group_col,
        F.least(
            F.col("_n"),
            F.floor(F.lit(float(total)) * F.pow("_n", F.lit(alpha)) / F.col("_z") + 1e-9),
        ).alias("_take"),
    )
    keyed = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "_draw", sample_key(id_col, seed)
    )
    ranked = with_running_total(
        keyed,
        ["_draw", id_col],
        F.lit(1),
        out="_rn",
        partition_cols=[group_col],
    )
    # NULL-safe quota join: counts/z/takes all include a NULL group
    # (its n^α consumes z-mass and quota), so a plain equality join —
    # where NULL never matches NULL — would silently drop every
    # NULL-group row AND undershoot ``total`` by that group's quota.
    # The siblings (source_cap, stratified_sample) already keep NULL
    # groups; <=> keeps this a hash-joinable equi-join.
    t = F.broadcast(takes).withColumnRenamed(group_col, "_tg")
    return (
        ranked.join(t, F.col(group_col).eqNullSafe(F.col("_tg")))
        .filter(F.col("_rn") <= F.col("_take"))
        .select(id_col, group_col)
    )


def source_cap(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-source frequency cap: keep at most ``cap`` documents from any
    one source/domain — the domain-balancing rule web-corpus recipes
    apply so a handful of giant domains can't dominate the training mix
    (the per-domain cap step in published web-curation pipelines, e.g.
    RefinedWeb/Dolma-style dedup-then-cap).

    Deterministic: the kept rows are the ``cap`` lowest seeded-md5
    draws per source, so re-runs, audits, and overlapping corpus builds
    agree row-for-row (same draw as ``stratified_sample``).

    Scale shape: ranking uses the shard-prefixed range-partitioned
    running total (``with_running_total`` with ``partition_cols``), NOT
    ``Window.partitionBy(source)`` — a plain window would serialize a
    mega-domain (the exact rows this operator exists to bound) onto one
    task. The rank is computed on an (id, source) projection and
    semi-joined back, so full-width rows move through one hash join,
    not the sort.
    """
    keyed = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "_draw", sample_key(id_col, seed)
    )
    ranked = with_running_total(
        keyed,
        ["_draw", id_col],
        F.lit(1),
        out="_rn",
        partition_cols=[group_col],
    )
    kept = ranked.filter(F.col("_rn") <= cap).select(id_col)
    return df.join(kept, id_col, "left_semi")


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


_SAMPLE_SEED = 42


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", DEFAULT_RATES, seed=_SAMPLE_SEED)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
        .limit(300)
    )


def _stratified_oracle() -> str:
    case = "CASE "
    for stratum, rate in DEFAULT_RATES.items():
        case += f"WHEN lang = '{stratum}' THEN '{_hash_threshold(rate)}' "
    case += f"ELSE '{_hash_threshold(DEFAULT_RATE)}' END"
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) < {case}
ORDER BY doc_id LIMIT 300
"""


_PACK_CAPACITY = 2048


def _q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return sequence_pack(d, _PACK_CAPACITY).orderBy("doc_id").limit(300)


_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / {_PACK_CAPACITY}.0) AS BIGINT) AS pack_id
FROM t ORDER BY doc_id LIMIT 300
"""


_SHUFFLE_SEED = 17


def _q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        shuffle_rank(d, seed=_SHUFFLE_SEED)
        .select("doc_id", "shuffle_pos")
        .orderBy("doc_id")
        .limit(200)
    )


_SHUFFLE_ORACLE = f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY substring(md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8),
                  doc_id) AS BIGINT) AS shuffle_pos
FROM documents ORDER BY doc_id LIMIT 200
"""


_TOKEN_BUDGET = 15000


def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return token_budget_head(d, _TOKEN_BUDGET).orderBy("doc_id").limit(300)


_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         ROUND(len(list_distinct(string_split(lower(text), ' ')))
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 6) AS q,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
), r AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY q DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens FROM r
WHERE cum_tokens <= {_TOKEN_BUDGET}
ORDER BY doc_id LIMIT 300
"""


_MIX_TOTAL = 200


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        temperature_mix(d, "lang", _MIX_TOTAL, alpha=0.5, seed=_SAMPLE_SEED)
        .orderBy("doc_id")
    )


_TEMPERATURE_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), tot AS (
  SELECT SUM(POW(n, 0.5)) AS z FROM counts
), takes AS (
  SELECT lang, LEAST(n, CAST(FLOOR({_MIX_TOTAL} * POW(n, 0.5) / z + 1e-9) AS BIGINT)) AS take
  FROM counts, tot
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8),
                      doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang FROM ranked JOIN takes USING (lang)
WHERE rn <= take ORDER BY doc_id
"""


_CAP = 10


def _q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        source_cap(d, _CAP, seed=_SAMPLE_SEED)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


_SOURCE_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8),
                      doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, lang FROM ranked WHERE rn <= {_CAP} ORDER BY doc_id
"""


QUERIES["q39l_stratified_sample"] = QuerySpec(_q_stratified_sample, _stratified_oracle())
QUERIES["q39v_source_cap"] = QuerySpec(_q_source_cap, _SOURCE_CAP_ORACLE)
QUERIES["q39q_temperature_mix"] = QuerySpec(_q_temperature_mix, _TEMPERATURE_MIX_ORACLE)
QUERIES["q39m_sequence_pack"] = QuerySpec(_q_sequence_pack, _PACK_ORACLE)
QUERIES["q39n_corpus_shuffle"] = QuerySpec(_q_corpus_shuffle, _SHUFFLE_ORACLE)
QUERIES["q39o_token_budget"] = QuerySpec(_q_token_budget, _TOKEN_BUDGET_ORACLE)


# ---------------------------------------------------------------------------
# context-window chunking (document → training sequences with overlap)
# ---------------------------------------------------------------------------


def context_chunks(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into strided context windows
    — the document → training-example step of an LM data pipeline
    (window = model context length, ``window - stride`` tokens of
    overlap carry context across boundaries).

    Chunks start at token 1, 1+stride, 1+2·stride, …; each takes up to
    ``window`` tokens; a ragged tail shorter than ``min_tokens`` is
    dropped UNLESS it is the document's only chunk (short docs still
    yield one example). Deterministic, purely positional — and a pure
    per-row map (sequence/transform/explode, no shuffle at any scale:
    the operator parallelizes as the scan does).

    Returns (id, chunk_no, n_tokens, chunk) with chunk_no 0-based.
    """
    toks = tokens(text_col)
    out = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)),
                    lambda s: F.slice(toks, s, window),
                ),
                lambda c, i: (F.size(c) >= min_tokens) | (i == 0),
            )
        ).alias("chunk_no", "_c"),
    )
    return out.select(
        id_col,
        F.col("chunk_no").cast("bigint").alias("chunk_no"),
        F.size("_c").cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", "_c").alias("chunk"),
    )


_CHUNK_W, _CHUNK_S, _CHUNK_MIN = 32, 24, 8


def _q_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return context_chunks(
        d, window=_CHUNK_W, stride=_CHUNK_S, min_tokens=_CHUNK_MIN
    ).orderBy("doc_id", "chunk_no")


_CONTEXT_CHUNKS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), starts AS (
  SELECT doc_id, t, unnest(range(1, GREATEST(len(t), 1) + 1, {_CHUNK_S})) AS st
  FROM toks
), chunks AS (
  SELECT doc_id,
         CAST((st - 1) / {_CHUNK_S} AS BIGINT) AS chunk_no,
         t[st:st + {_CHUNK_W} - 1] AS c
  FROM starts
)
SELECT doc_id, chunk_no,
       CAST(len(c) AS BIGINT) AS n_tokens,
       array_to_string(c, ' ') AS chunk
FROM chunks
WHERE len(c) >= {_CHUNK_MIN} OR chunk_no = 0
ORDER BY doc_id, chunk_no
"""

QUERIES["q118_context_chunks"] = QuerySpec(_q_context_chunks, _CONTEXT_CHUNKS_ORACLE)


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


def deterministic_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Assign each row to a named split by its seeded hash draw —
    train/val/test assignment as a PURE FUNCTION of (seed, id).

    Cumulative-threshold scheme over ``fractions`` in dict order: a
    row lands in the first bucket whose cumulative boundary its draw
    falls under, the last bucket absorbs rounding remainder. Because
    boundaries are cumulative, growing or shrinking a LATER bucket
    never reassigns rows already in an earlier one — the stability
    property that keeps train membership fixed while val/test are
    re-carved (no train/test leakage across pipeline versions). Row-
    local filter ⇒ zero shuffle, reproducible across runs and engines
    (the md5 scheme of ``sample_key``, shared with the oracle).

    Seed hygiene: pick a seed INDEPENDENT of any upstream hash-
    sampling stage (``stratified_sample`` / ``temperature_mix`` /
    ``source_cap``). Those stages keep the rows with the smallest
    draws for their seed; splitting on the same seed re-reads the
    same draws and piles every survivor into the first bucket.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be a non-empty dict of >= 0 rates")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = sample_key(id_col, seed)
    names = list(fractions)
    cum = 0.0
    expr = F.lit(names[-1])  # last bucket = remainder
    branches = []
    for name in names[:-1]:
        cum += fractions[name]
        branches.append((name, _hash_threshold(cum)))
    for name, thr in reversed(branches):
        expr = F.when(key < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def _q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        deterministic_split(d, seed=_SAMPLE_SEED)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE
         WHEN substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)
              < '{format(int(0.8 * 2**32), "08x")}' THEN 'train'
         WHEN substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)
              < '{format(int(0.9 * 2**32), "08x")}' THEN 'val'
         ELSE 'test'
       END AS split
FROM documents
ORDER BY doc_id
"""

QUERIES["q120_deterministic_split"] = QuerySpec(_q_split, _SPLIT_ORACLE)


# ---------------------------------------------------------------------------
# sorted corpus export
# ---------------------------------------------------------------------------


def export_sorted_shards(
    df: DataFrame,
    out_dir: str,
    order_col: str = "shuffle_pos",
    n_shards: int = 8,
    max_records_per_file: int = 0,
) -> None:
    """Write the corpus globally ordered by ``order_col`` into
    ``n_shards`` range shards — the training-data export step (pair it
    with ``shuffle_rank`` for a seeded global shuffle, then stream the
    files in name order).

    Scale shape: ``repartitionByRange`` samples range boundaries and
    sorts each shard IN PARALLEL — never the single-task global sort a
    plain ``orderBy().write`` can degenerate to at the final stage.
    ``max_records_per_file`` bounds individual parquet files (a shard
    splits into part-…-c000/c001/… in order), so downstream loaders
    get uniformly-sized files regardless of shard skew. Global order
    holds across files in lexicographic filename order: range
    partition ids are ordered, and the cNNN split counter preserves
    the in-partition sort.
    """
    out = df.repartitionByRange(n_shards, F.col(order_col)).sortWithinPartitions(
        order_col
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_dir)


def export_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    members: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 8,
) -> None:
    """Export samples as WebDataset-style tar shards: each sample is a
    group of adjacent tar members sharing a basename key —
    ``<key>.<ext>`` per ``members`` entry (ext → column) — the
    sequential-read layout multimodal training loaders stream. Binary
    columns write as-is, strings as UTF-8, anything else as JSON.

    Deterministic end to end: shard = md5-hash of the key (the shared
    ``sample_key`` scheme), members sort by key within a shard, tar
    metadata is pinned (mtime 0, USTAR) — re-exporting the same corpus
    yields byte-identical shards, so downstream caches can key on
    content.

    Scale shape: one hash repartition + in-partition sort; each task
    STREAMS its rows into tar files (roll on shard change — no
    per-partition materialization, memory = one row). Tars land under
    ``out_dir`` as shard-NNNNN.tar; pick n_shards so a shard is the
    loader-friendly ~1 GB. out_dir must be task-writable shared
    storage (same POSIX constraint as the maintainer state dirs —
    at cloud scale point this at the fuse mount or swap the open() for
    the object-store client; the tar layout is unchanged).
    """
    import os

    if not members:
        raise ValueError("members must map at least one extension to a column")
    os.makedirs(out_dir, exist_ok=True)
    shard = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long") % n_shards
    cols = [F.col(key_col).cast("string").alias("_key"), shard.alias("_shard")]
    exts = sorted(members)
    for ext in exts:
        cols.append(F.col(members[ext]).alias(f"_m_{ext}"))
    staged = (
        df.select(*cols)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
    )

    def write_partition(rows):
        import io
        import json as _json
        import tarfile

        tar, cur = None, None
        try:
            for row in rows:
                if row._shard != cur:
                    if tar is not None:
                        tar.close()
                    cur = row._shard
                    tar = tarfile.open(
                        os.path.join(out_dir, f"shard-{cur:05d}.tar"),
                        "w",
                        format=tarfile.USTAR_FORMAT,
                    )
                for ext in exts:
                    v = row[f"_m_{ext}"]
                    if v is None:
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        payload = bytes(v)
                    elif isinstance(v, str):
                        payload = v.encode("utf-8")
                    else:
                        payload = _json.dumps(
                            v, sort_keys=True, default=str
                        ).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{row._key}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(payload))
        finally:
            if tar is not None:
                tar.close()

    staged.foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# leakage-safe split: near-dup clusters stay inside one split
# ---------------------------------------------------------------------------


def leakage_safe_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.1,
    seed: int = _SAMPLE_SEED,
) -> DataFrame:
    """Train/val/test assignment that cannot leak through near-
    duplicates: ``deterministic_split`` keyed on the document's
    NEAR-DUP CLUSTER label instead of its own id, so every member of a
    duplicate cluster lands in the same split. Splitting per-doc while
    near-dups straddle the boundary is the classic eval contamination
    — the test set "generalization" is just train paraphrases.

    Composition of two independently-oracled operators:
    ``ngram_jaccard_pairs`` (q37c) → ``dedup_clusters`` (q129) labels
    each doc with its component's min doc_id; singletons keep their own
    id; ``deterministic_split`` (q120) hashes the label. Inherits
    q120's stability property at cluster granularity: re-carving
    val/test never moves a cluster already in train.

    Returns (id_col, cluster, split). Scale shape = the sum of its
    parts: the pair join is the inverted-index equi-join, label
    propagation is diameter-bounded, the split itself is row-local.
    """
    from wing_binlog_go_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold)
    clusters = dedup_clusters(pairs)
    labeled = (
        docs.join(clusters, docs[id_col] == clusters["doc"], "left")
        .withColumn("cluster", F.coalesce(F.col("cluster"), F.col(id_col)))
        .select(id_col, "cluster")
    )
    return deterministic_split(labeled, fractions, id_col="cluster", seed=seed)


def _q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return leakage_safe_split(d).orderBy("doc_id")


# q129's transitive closure + q120's md5 scheme, keyed on the cluster
# label — the oracle checks the COMPOSITION end to end.
_LEAKAGE_SPLIT_ORACLE = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id AS doc,
         unnest(list_distinct(
           CASE WHEN len(t) >= 5
                THEN list_transform(range(1, len(t) - 3),
                                    i -> array_to_string(t[i:i+4], ' '))
                ELSE [array_to_string(t, ' ')] END)) AS s
  FROM toks
), sizes AS (
  SELECT doc, COUNT(*) AS n FROM sh GROUP BY doc
), common AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc
  GROUP BY a.doc, b.doc
), edges AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes na ON na.doc = doc_a
  JOIN sizes nb ON nb.doc = doc_b
  WHERE ROUND(common / (na.n + nb.n - common), 6) >= 0.1
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM edges
  UNION
  SELECT doc_b, doc_a FROM edges
), cc AS (
  SELECT a AS doc, a AS lbl FROM sym
  UNION
  SELECT s.b AS doc, cc.lbl FROM cc JOIN sym s ON cc.doc = s.a
), lbl AS (
  SELECT doc, MIN(lbl) AS cluster FROM cc GROUP BY doc
), keyed AS (
  SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN lbl l ON l.doc = d.doc_id
)
SELECT doc_id, cluster,
       CASE
         WHEN substring(md5('{_SAMPLE_SEED}:' || CAST(cluster AS VARCHAR)), 1, 8)
              < 'cccccccc' THEN 'train'
         WHEN substring(md5('{_SAMPLE_SEED}:' || CAST(cluster AS VARCHAR)), 1, 8)
              < 'e6666666' THEN 'val'
         ELSE 'test'
       END AS split
FROM keyed
ORDER BY doc_id
"""

QUERIES["q141_leakage_safe_split"] = QuerySpec(
    _q_leakage_safe_split, _LEAKAGE_SPLIT_ORACLE
)


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = _SAMPLE_SEED,
) -> DataFrame:
    """Seeded weighted sample WITHOUT replacement: the k rows with the
    largest u_i^(1/w_i) draws (Efraimidis-Spirakis, IPL 2006), computed
    as ln(u_i)/w_i (same ordering, no tiny-power underflow). Inclusion
    probability is proportional-to-size without the rejection loops or
    the replacement bias of naive weighted picks — the corpus-sampling
    form ("sample documents ∝ token count") the mixing stages need.

    u_i comes from the shared md5 scheme (``sample_key`` hex → integer
    → (h+0.5)/2³²), so the draw is a pure cross-engine function of
    (seed, id): the same rows are chosen by Spark and the SQL oracle,
    and re-runs are reproducible. Rows with weight ≤ 0 or NULL are
    excluded (they cannot be drawn — their key is undefined).

    Scale shape: one row-local projection + a global top-k
    (TakeOrderedAndProject — k·partitions driver cost, never a full
    sort). Floats exist only INSIDE the ordering key; the output is
    (id, weight), so engine ulp differences cannot reach the result
    unless two keys collide to ~1 ulp (ids hash independently;
    probability ~n²·2⁻⁵²).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(sample_key(id_col, seed), 16, 10).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_es_key", F.log(u) / w)
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        weighted_sample(d, k=25, weight_col="n_chars")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


_WEIGHTED_SAMPLE_ORACLE = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ln((CAST(concat('0x',
               substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) + 0.5) / 4294967296.0) / n_chars AS es_key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
  ORDER BY es_key DESC, doc_id
  LIMIT 25
)
ORDER BY doc_id
"""

QUERIES["q142_weighted_sample"] = QuerySpec(
    _q_weighted_sample, _WEIGHTED_SAMPLE_ORACLE
)


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = _SAMPLE_SEED,
) -> DataFrame:
    """Stratified form of ``weighted_sample``: the top-k
    Efraimidis-Spirakis draws WITHIN each group — per-language (or
    per-source) proportional-to-size sampling in one entity-keyed
    window, no global sort and no driver loop over strata. Same
    cross-engine draw, so the per-group chosen sets hash-match SQL."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(sample_key(id_col, seed), 16, 10).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    w = F.col(weight_col).cast("double")
    win = Window.partitionBy(group_col).orderBy(
        (F.log(u) / w).desc(), F.col(id_col)
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _q_weighted_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        weighted_sample_per_group(d, k=10, weight_col="n_chars", group_col="lang")
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


_WEIGHTED_GROUP_ORACLE = f"""
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ln((CAST(concat('0x',
                 substring(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) + 0.5) / 4294967296.0) / n_chars DESC, doc_id
         ) AS rn
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
WHERE rn <= 10
ORDER BY lang, doc_id
"""

QUERIES["q144_weighted_sample_per_group"] = QuerySpec(
    _q_weighted_sample_per_group, _WEIGHTED_GROUP_ORACLE
)
