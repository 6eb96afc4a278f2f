"""Text-analysis functions over the ``documents`` table.

Training-data-pipeline text ops (driver north star): language ID (stopword
n-gram heuristic), quality scoring (length / stopword-ratio features),
token counting (whitespace + regex "BPE-ish"), document fingerprinting
(md5 exact + minhash-sketch). Everything is column expressions — JVM-side,
codegen-fused, shuffle-free except the explicit groupBys.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wing_binlog_go_spark.operators.dedup import tokens, word_ngrams_all, word_shingles
from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}

# Marker stopwords per language, checked in fixed priority order for
# deterministic argmax ties. (The corpus text is synthetic; determinism,
# not linguistic accuracy, is what the oracle checks.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "in"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "y", "es"),
}


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df.withColumn("_toks", tokens(text_col))
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"_score_{lang}", _count_in(F.col("_toks"), words))
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> tuple[DataFrame, Column]:
    """Predicted language: argmax marker count, 'und' (undetermined) if 0.
    Returns (scored_df, prediction_column) — the column references score
    columns that only exist on the returned DataFrame."""
    scored = lang_scores(df, text_col)
    best = F.greatest(*[F.col(f"_score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # reversed: earlier languages win ties (en > de > fr > es)
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(
            (F.col(f"_score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored, pred


def quality_features(text_col: str = "text") -> dict[str, Column]:
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = _count_in(toks, ("the", "a", "and", "of", "in"))
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus spaces
    return {
        "n_tokens": n_tokens.cast("bigint"),
        "n_chars": n_chars.cast("bigint"),
        "stop_ratio": F.round(stop / n_tokens, 6),
        "avg_tok_len": F.round(avg_tok_len, 6),
    }


def minhash_sketch(text_col: str = "text", k: int = 3, size: int = 8) -> Column:
    """Bottom-``size`` sketch of shingle hashes — a compact doc fingerprint
    whose overlap estimates Jaccard (non-oracle: DuckDB lacks xxhash64)."""
    hashes = F.transform(word_shingles(text_col, k), lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(hashes), 1, size)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def _q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(20)
    )


_WORD_COUNT_ORACLE = """
SELECT w, COUNT(*) AS c FROM
  (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) t
GROUP BY w ORDER BY c DESC, w LIMIT 20
"""


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(tokens("text")).cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(tokens("text"))).cast("bigint").alias("n_uniq"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


_TOKEN_STATS_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS n_uniq
FROM documents ORDER BY doc_id LIMIT 200
"""


def _q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.agg(
        F.sum(F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)))
        .alias("n_bpe_tokens")
    )


_BPE_ORACLE = """
SELECT CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
       AS n_bpe_tokens
FROM documents
"""


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    # Take the 200 smallest doc_ids FIRST (top-k heap over the unique sort
    # key — no full sort, no exchange), then compute the token features on
    # those 200 rows only. The features do not affect the sort key, so the
    # result is identical to computing them corpus-wide before the limit;
    # at scale this turns O(corpus) tokenization passes into O(200)
    # (guide §1.2: don't compute things you throw away).
    return (
        d.select("doc_id", "text")
        .orderBy("doc_id")
        .limit(200)
        .select("doc_id", *[c.alias(n) for n, c in feats.items()])
    )


_QUALITY_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split(lower(text), ' ') AS toks,
         length(text) AS nc
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(nc AS BIGINT) AS n_chars,
       ROUND(len(list_filter(toks, t -> t IN ('the','a','and','of','in')))
             / len(toks), 6) AS stop_ratio,
       ROUND((nc - (len(toks) - 1)) / len(toks), 6) AS avg_tok_len
FROM t ORDER BY doc_id LIMIT 200
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    scored, pred = lang_id(d, "text")
    return (
        scored.select("doc_id", pred.alias("pred_lang"), F.col("lang").alias("label"))
        .orderBy("doc_id")
        .limit(200)
    )


def _lang_oracle() -> str:
    score_exprs = ",\n         ".join(
        f"len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in ws)}))) AS s_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    # same priority order as the Spark side: first language hitting the max wins
    case = "CASE "
    for lang in LANG_MARKERS:
        case += f"WHEN s_{lang} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
         {score_exprs}
  FROM t
)
SELECT doc_id, {case} AS pred_lang, lang AS label
FROM s ORDER BY doc_id LIMIT 200
"""


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.lower("text")).alias("fp"))
        .orderBy("doc_id")
        .limit(200)
    )


_FINGERPRINT_ORACLE = """
SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id LIMIT 200
"""


def _q_minhash_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    # concat_ws so the driver compares a scalar column, not an array
    return (
        d.select(
            "doc_id",
            F.concat_ws(",", minhash_sketch("text").cast("array<string>")).alias(
                "sketch"
            ),
        )
        .orderBy("doc_id")
        .limit(50)
    )


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): the corpus-size pass of BPE training — ONE shuffle
    over the full corpus; every training iteration afterwards works on
    this table only (distinct words, ~10^6-10^7 rows even at 100 TB of
    text — the classic reason BPE trainers aggregate words first)."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pairs_udf(ops: list[tuple[str, str]]):
    """Arrow-batched greedy left-to-right application of one ROUND of
    learned pairs, in learned order — each merge is inherently
    sequential within a word (overlaps: 'aaa' under (a,a) must become
    (aa, a)), so this is a legitimate Pandas-UDF step; it runs over
    the WORD table, not the corpus."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def merge(col: pd.Series) -> pd.Series:
        def apply(s):
            for a, b in ops:
                out, i, n = [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            return s

        return col.map(lambda s: apply(list(s)))

    return merge


def _word_symbols(w: Column) -> Column:
    """Initial BPE symbolization: characters + '</w>' end-of-word
    marker (Sennrich et al. 2016, arXiv:1508.07909 — public spec)."""
    return F.concat(F.split(w, ""), F.array(F.lit("</w>")))


def _compatible_merge_prefix(
    top: list, floor: int, cap: int, min_count: int
) -> list[tuple[str, str, int]]:
    """The maximal PREFIX of this round's count-ordered pair window that
    can be applied in one pass while staying EXACTLY equivalent to
    sequential BPE (same merges, same order, same counts).

    Pair j is accepted only if, at its sequential turn, it would still
    be the strict argmax after the earlier accepted merges:

    - its symbols are disjoint from every earlier accepted pair's (so
      its own count is unchanged — a merge replaces two symbols with
      one, it can neither create nor destroy an (a_j, b_j) adjacency
      that doesn't touch a_i/b_i);
    - neither symbol equals an earlier round-new symbol ``a_i + b_i``;
    - its count STRICTLY exceeds every earlier pair's new-pair bound:
      merging (a_i, b_i) → X only creates pairs (x, X) / (X, y) whose
      counts are bounded by the pre-round counts of (x, a_i) / (b_i, y)
      — bounded inside the collected window by the max count among
      pairs with right == a_i or left == b_i, and outside it by
      ``floor`` (the smallest collected count, a ceiling on everything
      uncollected).  Strictness keeps the (count desc, pair asc)
      tie-break intact: a new pair may tie but then loses on order
      only if it sorts later, which we can't know — so ties stop the
      prefix.

    The first pair needs no checks (it IS the argmax). Stopping at the
    first violation — never skipping — is what makes the prefix
    contiguous in the total order, which the equivalence proof needs.
    """
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    new_syms: set[str] = set()
    bounds: list[int] = []
    for row in top:
        a, b, cnt = row["a"], row["b"], int(row["cnt"])
        if cnt < min_count or len(accepted) >= cap:
            break
        if accepted:
            if {a, b} & used or a in new_syms or b in new_syms:
                break
            if any(cnt <= bd for bd in bounds):
                break
        nb = floor
        for q in top:
            if q["b"] == a or q["a"] == b:
                nb = max(nb, int(q["cnt"]))
        accepted.append((a, b, cnt))
        used.update((a, b))
        new_syms.add(a + b)
        bounds.append(nb)
    return accepted


def _greedy_merge_batch(
    top: list, cap: int, min_count: int
) -> list[tuple[str, str, int]]:
    """mode="greedy": the standard distributed-BPE batching trick —
    accept the top ``cap`` pairwise symbol-disjoint pairs of the round,
    SKIPPING conflicting pairs instead of stopping at them.  Maximal
    round compression (~cap× at the head of training), but the merge
    LIST is no longer guaranteed order-identical to sequential BPE:
    when counts tie (the low-count tail) the picked merges can diverge.
    Empirically the downstream segmentation quality is preserved — the
    corpus-total token count under greedy merges matches sequential
    exactly on the fixture corpus (pinned in ``tests/test_bpe.py``) —
    which is why production BPE trainers use exactly this relaxation.
    """
    acc: list[tuple[str, str, int]] = []
    used: set[str] = set()
    new_syms: set[str] = set()
    for row in top:
        a, b, cnt = row["a"], row["b"], int(row["cnt"])
        if cnt < min_count or len(acc) >= cap:
            break
        if {a, b} & used or a in new_syms or b in new_syms:
            continue
        acc.append((a, b, cnt))
        used.update((a, b))
        new_syms.add(a + b)
    return acc


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 6,
    batch: int = 16,
    mode: str = "exact",
) -> list[tuple[str, str, int]]:
    """Learn byte-pair-encoding merges from a corpus, distributed.

    Structure (what survives 100 TB): the corpus is touched ONCE
    (``word_freqs``); training then runs on the word-frequency table —
    pair counts via a JVM slice/zip_with explode + partial-aggregating
    groupBy, the per-round top window via a sorted limit (count desc,
    pair asc — the deterministic tie-break), and merge application as
    one Arrow pass per round.

    Each round applies up to ``batch`` merges from ONE Spark job: the
    acceptance set of the count-ordered pair window, under one of two
    contracts:

    - ``mode="exact"`` (default): the maximal compatible PREFIX
      (``_compatible_merge_prefix``) — provably identical output to
      one-merge-at-a-time training.  Measured round compression is
      bounded by pair-interaction structure (~1.5× on the fixture
      corpus: high-count merges mint new high-count pairs, which the
      equivalence proof must respect).
    - ``mode="greedy"``: the standard distributed-trainer relaxation
      (``_greedy_merge_batch``) — top ``batch`` symbol-disjoint pairs,
      conflicts skipped.  ~5× fewer rounds on the fixture corpus and
      ~batch× at the head of a production run, so a 32k-merge vocab
      costs hundreds-to-thousands of jobs instead of 32k; the merge
      list may diverge from sequential in count-tied tails, with
      measured-identical downstream segmentation (test-pinned).

    Lineage is cut with an eager localCheckpoint every
    ``checkpoint_every`` rounds (the dedup_clusters pattern).  Training
    stops early — loudly, via the returned length — when the best pair
    drops below ``min_count``.

    Returns [(left, right, pair_count)] in merge order.
    """
    if mode not in ("exact", "greedy"):
        raise ValueError(f"mode must be 'exact' or 'greedy', got {mode!r}")
    vocab = (
        word_freqs(docs, text_col)
        .select(_word_symbols(F.col("w")).alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        pairs = vocab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, size(syms)-1)"),
                    F.expr("slice(syms, 2, size(syms)-1)"),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        # collect past the batch cap: in exact mode the extra rows
        # sharpen the new-pair bounds and the floor for everything
        # uncollected; in greedy mode they supply disjoint candidates
        # to fill the batch after skipping conflicts
        window = max(4 * batch, 64) if mode == "greedy" else max(2 * batch, batch + 8)
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(window)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        floor = int(top[-1]["cnt"]) if len(top) == window else 0
        cap = min(batch, n_merges - len(merges))
        if mode == "greedy":
            accepted = _greedy_merge_batch(top, cap, min_count)
        else:
            accepted = _compatible_merge_prefix(top, floor, cap, min_count)
        merges.extend(accepted)
        vocab = vocab.select(
            _merge_pairs_udf([(a, b) for a, b, _ in accepted])(
                F.col("syms")
            ).alias("syms"),
            "freq",
        )
        rounds += 1
        if rounds % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_segment(merges: list[tuple[str, str, int]]):
    """Tokenizer closure for learned merges: applies them in learned
    order (the standard BPE apply — later merges operate on earlier
    merges' output). Returns an Arrow-batched UDF word → tokens."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ops = [(a, b) for a, b, _ in merges]

    @pandas_udf("array<string>")
    def segment(col: pd.Series) -> pd.Series:
        def apply(w):
            s = list(w) + ["</w>"]
            for a, b in ops:
                out, i, n = [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            return s

        return col.map(apply)

    return segment


def bpe_tokenize_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bpe_tokens) under the learned merges: per-document token
    counts after greedy application — the sizing pass a training-data
    pipeline runs before packing sequences. Words segment via one
    Arrow pass over the DISTINCT words in the batch, then join back —
    the corpus-side work is an equi-join, not a per-row Python call."""
    words = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.col("w") != "")
    distinct_words = words.select("w").distinct()
    seg = bpe_segment(merges)
    lut = distinct_words.select(
        "w", F.size(seg(F.col("w"))).cast("bigint").alias("n_toks")
    )
    return (
        words.join(lut, "w")
        .groupBy(id_col)
        .agg(F.sum("n_toks").alias("n_bpe_tokens"))
    )


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    merges = bpe_train(d, n_merges=20)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, left string, right string, pair_count bigint",
    )


def _q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    merges = bpe_train(d, n_merges=20)
    return (
        bpe_tokenize_counts(d, merges)
        .orderBy("doc_id")
        .limit(200)
    )


# --- BPE oracle: sequential training unrolled as chained CTEs -------------
#
# The r8 verdict's last tokenizer-family gap: q39x/q39y were rows-only.
# The exact-mode batched trainer is PROVABLY order-identical to
# one-merge-at-a-time BPE (``_compatible_merge_prefix``), so the oracle
# replays sequential BPE: 20 unrolled MATERIALIZED CTE levels (the
# q146 GD-unroll precedent), each level = weighted adjacent-pair count
# → argmax (count desc, pair asc — the trainer's tie-break) → apply.
#
# Merge application uses the delimiter-wrap trick: a word's symbol list
# rides as chr(31)·s1·chr(31)chr(31)·s2·…·chr(31) (every symbol wrapped
# on both sides), so SQL ``replace`` of ``\x1f a \x1f\x1f b \x1f`` with
# ``\x1f ab \x1f`` is EXACTLY BPE's greedy left-to-right non-overlapping
# pairing — including the 'aaa' → (aa, a) overlap case, because the
# shared delimiter is consumed by the first match. chr(31) cannot appear
# in the corpus (tokens() splits on space; fixture text is printable
# ASCII) and symbols never start or end with it, so trim+split by the
# double delimiter recovers the symbol list losslessly.
#
# Early-stop (min_count=2) is deliberately not replayed: the fixture
# corpus's 20th merge still counts >950 at both driver scales, and the
# local oracle suite would fail loudly if a regenerated corpus ever
# dropped below the threshold (NULL scalar subqueries poison the chain).

_BPE_SEP = "chr(31)"
_BPE_N_MERGES = 20


def _bpe_wrapped_expr(w: str = "w") -> str:
    """chars + '</w>', each wrapped in the delimiter."""
    return (
        f"{_BPE_SEP} || array_to_string(list_append("
        f"list_transform(range(1, length({w}) + 1), i -> {w}[i]), '</w>'), "
        f"{_BPE_SEP} || {_BPE_SEP}) || {_BPE_SEP}"
    )


def _bpe_train_cte(n_merges: int = _BPE_N_MERGES) -> str:
    sep = _BPE_SEP
    parts = [f"""
WITH words AS MATERIALIZED (
  SELECT w FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w != ''
), vocab_0 AS MATERIALIZED (
  SELECT w, {_bpe_wrapped_expr('w')} AS s, COUNT(*)::BIGINT AS freq
  FROM words GROUP BY w
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f""", pairs_{k} AS MATERIALIZED (
  SELECT p.z[1] AS a, p.z[2] AS b, SUM(freq)::BIGINT AS cnt FROM (
    SELECT freq, unnest(list_zip(list_slice(l, 1, len(l) - 1),
                                 list_slice(l, 2, len(l)))) AS z
    FROM (SELECT freq, string_split(trim(s, {sep}), {sep} || {sep}) AS l
          FROM vocab_{p})
  ) p GROUP BY 1, 2
), best_{k} AS MATERIALIZED (
  SELECT a, b, cnt FROM pairs_{k} ORDER BY cnt DESC, a, b LIMIT 1
), vocab_{k} AS MATERIALIZED (
  SELECT w, replace(s,
      {sep} || (SELECT a FROM best_{k}) || {sep} || {sep} || (SELECT b FROM best_{k}) || {sep},
      {sep} || (SELECT a FROM best_{k}) || (SELECT b FROM best_{k}) || {sep}) AS s,
    freq
  FROM vocab_{p}
)""")
    return "".join(parts)


def _bpe_train_oracle(n_merges: int = _BPE_N_MERGES) -> str:
    union = "\nUNION ALL\n".join(
        f'SELECT {k} AS merge_rank, a AS "left", b AS "right", '
        f"cnt AS pair_count FROM best_{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        _bpe_train_cte(n_merges)
        + "\nSELECT * FROM (\n" + union + "\n) ORDER BY merge_rank\n"
    )


def _bpe_tokenize_oracle(n_merges: int = _BPE_N_MERGES) -> str:
    """vocab_N IS every distinct word's final segmentation, so the
    per-word token count is free: symbols = delimiter count / 2."""
    sep = _BPE_SEP
    return _bpe_train_cte(n_merges) + f""", lut AS MATERIALIZED (
  SELECT w,
         CAST((length(s) - length(replace(s, {sep}, ''))) / 2 AS BIGINT) AS n_toks
  FROM vocab_{n_merges}
), dwords AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w != ''
)
SELECT doc_id, CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens
FROM dwords JOIN lut USING (w)
GROUP BY doc_id ORDER BY doc_id LIMIT 200
"""


def tf_idf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-(doc, term) TF-IDF: tf × ln(N/df). Two shuffles (term counts,
    doc frequencies) + an equi-join on term; no ML pipeline object, just
    relational algebra, so it composes with everything.

    The df table is the VOCABULARY — at web scale that's billions of
    distinct tokens, so it must NOT carry a compile-time broadcast()
    hint (driver/executor OOM at 100×). The term join stays an
    unhinted equi-join: AQE broadcasts it at runtime when the measured
    size is actually small, and sort-merges on term otherwise."""
    # localCheckpoint: tok feeds BOTH aggregations below; without the
    # barrier the tokenize+explode scan runs once per consumer
    tok = docs.select(
        id_col, F.explode(tokens(text_col)).alias("term")
    ).localCheckpoint(eager=True)
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    df_tbl = (
        tok.distinct().groupBy("term").agg(F.count("*").alias("df"))
    )
    return tf.join(df_tbl, "term").select(
        id_col,
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        tf_idf(d)
        .orderBy(F.desc("tfidf"), F.asc("doc_id"), F.asc("term"))
        .limit(50)
    )


_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, tf.term,
       ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
ORDER BY tfidf DESC, doc_id, tf.term LIMIT 50
"""

# ---------------------------------------------------------------------------
# repetition features (published quality heuristics: a document whose
# mass concentrates in one repeated n-gram is boilerplate/spam — the
# "duplicate n-gram fraction" family of filters used for LM corpora)
# ---------------------------------------------------------------------------


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, distinct_token_ratio, top_bigram_frac) per document.

    - distinct_token_ratio: |distinct tokens| / |tokens| — low ⇒ loops.
    - top_bigram_frac: occurrences of the most frequent bigram / all
      bigram occurrences — high ⇒ template repetition.

    distinct ratio is a pure row expression; the bigram mode needs one
    explode + two combiner-friendly aggregations keyed by doc (shuffle
    bounded by corpus token count, same shape as word-count q39)."""
    toks = tokens(text_col)
    bigrams = df.select(
        F.col(id_col),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
            "distinct_token_ratio"
        ),
        # word_ngrams_all: regex fast path (codegen) with per-row HOF
        # fallback — all overlapping bigrams, repeats included
        F.explode(word_ngrams_all(text_col, 2)).alias("bg"),
    )
    per_bigram = bigrams.groupBy(id_col, "distinct_token_ratio", "bg").agg(
        F.count("*").alias("c")
    )
    return per_bigram.groupBy(id_col, "distinct_token_ratio").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return repetition_features(docs).orderBy("doc_id").limit(100)


# single-token docs: one "bigram" that is just the token (word_ngrams_all
# collapses docs shorter than k to one n-gram of the remaining tokens).
# The oracle's CASE WHEN i+1 <= len mirrors this shape.
_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), base AS (
  SELECT doc_id,
         ROUND(len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 6)
           AS distinct_token_ratio,
         t
  FROM toks
), bg AS (
  SELECT doc_id, distinct_token_ratio,
         unnest(list_transform(range(1, GREATEST(len(t) - 1, 1) + 1),
                i -> CASE WHEN i + 1 <= len(t)
                          THEN t[i] || ' ' || t[i + 1]
                          ELSE t[i] END)) AS bg
  FROM base
), per AS (
  SELECT doc_id, distinct_token_ratio, bg, COUNT(*) AS c
  FROM bg GROUP BY 1, 2, 3
)
SELECT doc_id, distinct_token_ratio,
       ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_bigram_frac
FROM per GROUP BY 1, 2
ORDER BY doc_id LIMIT 100
"""


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# Patterns kept to the Java/RE2 common subset so the same regex runs in
# Spark (Java) and DuckDB (RE2) — no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_counts(text_col: str = "text") -> dict[str, Column]:
    """Per-category PII hit counts for one document (column exprs).

    regexp_count is JVM-side and codegen-friendly; a corpus-wide scrub
    is a pure map stage."""
    c = F.col(text_col)
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


def redact_pii(text_col: str = "text", replacement: str = "[PII]") -> Column:
    """Replace every PII span with ``replacement`` (chained
    regexp_replace — one pass per category, all JVM-side)."""
    c = F.col(text_col)
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, replacement)
    return c


def _q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide PII audit: docs-hit and total hits per category."""
    docs = read_table(spark, sf_dir, "documents")
    counts = pii_counts("text")
    agg = []
    for name in PII_PATTERNS:
        agg.append(F.sum((counts[name] > 0).cast("bigint")).alias(f"docs_{name}"))
        agg.append(F.sum(counts[name].cast("bigint")).alias(f"hits_{name}"))
    return docs.agg(*agg)


def _pii_oracle() -> str:
    cols = []
    for name, pat in PII_PATTERNS.items():
        dpat = pat.replace("'", "''")
        cols.append(
            f"CAST(SUM(CASE WHEN regexp_matches(text, '{dpat}') THEN 1 ELSE 0 END) AS BIGINT) AS docs_{name}"
        )
        cols.append(
            f"CAST(SUM(len(regexp_extract_all(text, '{dpat}'))) AS BIGINT) AS hits_{name}"
        )
    return "SELECT " + ", ".join(cols) + " FROM documents"


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------


def contamination_overlap(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, overlapping_ngrams): training docs sharing any
    k-gram with a benchmark/eval document — the standard train/test
    decontamination check (n-gram overlap filtering as published for
    large LM training corpora).

    Scale shape: the benchmark side is small by nature (eval sets are
    thousands of docs) → broadcast; the corpus side is a pure
    map+explode scan. The only shuffle is the final (doc, bench) count
    aggregation, which is combiner-friendly.
    """
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, k)).alias("s"),
    )
    bench_sh = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(word_shingles(bench_text_col, k)).alias("s"),
    ).distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), "s")
        # shingles are distinct per doc (word_shingles), so COUNT(*) is
        # the number of DISTINCT overlapping k-grams
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlapping_ngrams"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Drop training documents overlapping any benchmark doc by ≥
    ``min_overlap`` k-grams (left_anti on the contaminated id set)."""
    dirty = (
        contamination_overlap(
            docs, bench, k, id_col, text_col, bench_id_col, bench_text_col
        )
        .groupBy("doc_id")
        .agg(F.sum("overlapping_ngrams").alias("total"))
        .filter(F.col("total") >= min_overlap)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(dirty, id_col, "left_anti")


def _bloom_positions(col, m_bits: int, n_hashes: int):
    """array<long> of ``n_hashes`` bloom bit positions for a string
    column — xxhash64 with the seed as a leading lit, so the SAME hash
    family is computed JVM-side on both the build and probe sides."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits))
            for i in range(n_hashes)
        ]
    )


def bloom_contamination_overlap(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """``contamination_overlap`` for eval suites too big to broadcast
    raw: a Bloom bit-array over the benchmark k-grams prefilters the
    corpus map-side, then survivors take the exact equi-join.

    Why: q39i broadcasts the benchmark's exploded shingle STRINGS —
    fine for thousands of eval docs, not for a full eval-harness union
    (hundreds of thousands of docs → tens of GB of shingles). Here the
    broadcast is ``m_bits/8`` bytes regardless of shingle count
    (128 KiB at the default 2^20), and the shuffle join only sees the
    corpus shingles the bloom passes.

    Exactness: blooms have NO false negatives, so every truly-shared
    shingle survives the prefilter; false positives are removed by the
    verify join. Output is therefore IDENTICAL to
    ``contamination_overlap`` (test-asserted) and shares its oracle.

    Scale shape: build = one map pass over bench shingles + per-
    partition bit-array OR (mapInPandas) + driver OR of ≤#partitions
    arrays; probe = JVM-side xxhash64 positions + ONE Arrow-batched
    numpy bit-test per shingle (the membership test is the one place
    Python is unavoidable without a JVM bloom UDF — it is O(n_hashes)
    int ops per row on packed bits, not string work); verify = equi-
    join on the surviving shingles, combiner-friendly count agg.
    """
    import numpy as np

    spark = docs.sparkSession
    n_bytes = (m_bits + 7) // 8

    # referenced by the bloom build AND the verify join — without the
    # barrier the benchmark explode+distinct shuffle runs twice (the
    # apss_prefix_pairs lesson)
    bench_sh = (
        bench.select(
            F.col(bench_id_col).alias("bench_id"),
            F.explode(word_shingles(bench_text_col, k)).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    pos_df = bench_sh.select(
        F.explode(_bloom_positions(F.col("s"), m_bits, n_hashes)).alias("pos")
    )

    def _pack(pdf_iter):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in pdf_iter:
            p = pdf["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    bloom = np.zeros(n_bytes, dtype=np.uint8)
    for row in pos_df.mapInPandas(_pack, "bits binary").collect():
        bloom |= np.frombuffer(row.bits, dtype=np.uint8)
    bloom_bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def _might_contain(positions: pd.Series) -> pd.Series:
        blm = bloom_bc.value

        def chk(arr):
            a = np.asarray(arr, dtype=np.int64)
            return bool(
                np.all(blm[a >> 3] & (1 << (a & 7)).astype(np.uint8))
            )

        return positions.map(chk)

    doc_sh = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(text_col, k)).alias("s"),
        )
        .filter(_might_contain(_bloom_positions(F.col("s"), m_bits, n_hashes)))
    )
    return (
        doc_sh.join(bench_sh, "s")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlapping_ngrams"))
    )


def bloom_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    min_overlap: int = 1,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """``decontaminate`` through the bloom-prefiltered overlap — the
    drop step for eval suites too big to broadcast raw. Same exact
    semantics (the prefilter has no false negatives and the verify
    join removes false positives), same contract: training docs with
    ≥ ``min_overlap`` shared k-grams are dropped via left_anti."""
    dirty = (
        bloom_contamination_overlap(
            docs, bench, k, m_bits, n_hashes,
            id_col, text_col, bench_id_col, bench_text_col,
        )
        .groupBy("doc_id")
        .agg(F.sum("overlapping_ngrams").alias("total"))
        .filter(F.col("total") >= min_overlap)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(dirty, id_col, "left_anti")


def _q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fixture/semantics as q39i, bloom-prefiltered path."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return bloom_contamination_overlap(
        corpus, bench, k=5, bench_id_col="doc_id"
    ).orderBy("doc_id", "bench_id")


def _q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic benchmark = every 97th doc; overlap vs the rest."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_overlap(
        corpus, bench, k=5, bench_id_col="doc_id"
    ).orderBy("doc_id", "bench_id")


_DECONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(t) >= 5
                THEN list_transform(range(1, len(t) - 3),
                                    i -> array_to_string(t[i:i+4], ' '))
                ELSE [array_to_string(t, ' ')] END)) AS s
  FROM toks
)
SELECT d.doc_id AS doc_id, b.doc_id AS bench_id,
       CAST(COUNT(*) AS BIGINT) AS overlapping_ngrams
FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) d
JOIN (SELECT * FROM sh WHERE doc_id % 97 = 0) b ON d.s = b.s
GROUP BY 1, 2
ORDER BY 1, 2
"""

def boilerplate_ngrams(
    docs: DataFrame,
    k: int = 3,
    min_doc_frac: float = 0.01,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """High-document-frequency k-grams — the boilerplate/template set.

    A k-gram appearing in ≥ max(min_df, min_doc_frac·|corpus|) distinct
    documents is, by construction, template text (headers, footers,
    license banners, navigation chrome) rather than content. Document
    frequency is computed over DISTINCT k-grams per doc, so a doc
    repeating its own header doesn't inflate df.

    Scale: the df aggregation shuffles on the k-gram (high cardinality,
    parallel); the OUTPUT is small by definition — a gram must clear the
    corpus-fraction bar, so |output| ≤ 1/min_doc_frac × (grams per doc),
    independent of corpus size — which is what makes the downstream
    per-doc join a broadcast (`boilerplate_stats`). The one driver-side
    scalar is |corpus| (same class as IVF's centroid fit).

    Returns (gram, df).
    """
    n_docs = docs.count()
    bar = max(min_df, math.ceil(min_doc_frac * n_docs))
    grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams_all(text_col, k))).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= F.lit(bar))
    )


def boilerplate_stats(
    docs: DataFrame,
    k: int = 3,
    min_doc_frac: float = 0.01,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate share: how much of each doc's k-gram
    stream (multiset — repeats count) falls in the corpus boilerplate
    set. The standard curation signal for dropping template-heavy pages.

    Plan shape at 100 TB: corpus scanned twice (df pass + stats pass);
    the boilerplate set is broadcast (small by construction, see
    ``boilerplate_ngrams``), so the stats pass is map-side join +
    one groupBy on the document id (high cardinality, parallel).

    Returns (id, n_grams, n_boiler, boiler_ratio).
    """
    boiler = boilerplate_ngrams(docs, k, min_doc_frac, min_df, id_col, text_col)
    occurrences = docs.select(
        F.col(id_col), F.explode(word_ngrams_all(text_col, k)).alias("gram")
    )
    tagged = occurrences.join(
        F.broadcast(boiler.select("gram", F.lit(1).alias("_b"))), "gram", "left"
    )
    return tagged.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.coalesce(F.sum("_b"), F.lit(0)).alias("n_boiler"),
        F.round(
            F.coalesce(F.sum("_b"), F.lit(0)) / F.count("*"), 6
        ).alias("boiler_ratio"),
    )


def winnowing_fingerprints(
    text_col: str = "text", k: int = 3, window: int = 4
) -> Column:
    """Winnowing document fingerprints (the MOSS scheme, Schleimer et
    al. SIGMOD'03): hash every overlapping k-gram IN ORDER, slide a
    ``window``-wide window over the hash sequence, keep each window's
    minimum — the guaranteed-coverage selection rule (any shared
    substring of ≥ k+window-1 tokens shares ≥ 1 fingerprint between two
    documents, which is what makes the fingerprint set joinable for
    substring-level overlap detection, unlike minhash which sketches
    whole-document similarity).

    Hash = md5 hex (engine-portable, uniform for min-selection); the
    classic polynomial *rolling* hash is a constant-factor trick for
    sequential scanners — under columnar execution each k-gram hash is
    an independent codegen-fused expression, so nothing rolls. Pure
    per-row column expression: zero shuffle, scales embarrassingly.

    Returns the sorted distinct fingerprint array for each document.
    """
    grams = word_ngrams_all(text_col, k)
    hashes = F.transform(grams, lambda g: F.md5(g))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(hashes) - (window - 1), F.lit(1))
    )
    wins = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, window)))
    return F.array_sort(F.array_distinct(wins))


def _q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.explode(winnowing_fingerprints("text", k=3, window=4)).alias("fp"),
        )
        .orderBy("doc_id", "fp")
    )


_WINNOWING_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
  WHERE doc_id < 100
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 1),
                                  i -> array_to_string(t[i:i+2], ' '))
              ELSE [array_to_string(t, ' ')] END AS gs
  FROM toks
), hs AS (
  SELECT doc_id, list_transform(gs, g -> md5(g)) AS h FROM grams
)
SELECT doc_id,
       unnest(list_sort(list_distinct(
         list_transform(range(1, greatest(len(h) - 3, 1) + 1),
                        i -> list_aggregate(h[i:i+3], 'min'))))) AS fp
FROM hs
ORDER BY doc_id, fp
"""


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average negative log-likelihood under an add-one
    bigram language model trained on the corpus itself — the n-gram
    stand-in for perplexity-based quality filtering (published pipelines
    score documents with a reference LM and drop the tail; with no
    neural runtime in scope, a smoothed bigram model is the same signal
    computed in pure SQL algebra). High NLL = improbable word sequences:
    gibberish, boilerplate soup, wrong-language fragments.

    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), add-one smoothed over the
    unigram vocabulary V; score = −mean log P over the doc's bigrams.

    Scale shape: two corpus-derived count tables (unigram, bigram) built
    with ordinary partial-agg groupBys; the scoring pass joins the
    exploded bigram stream to both on their natural keys — vocabulary-
    sized equi-joins, NEVER broadcast (the r2 tf_idf lesson: a web-scale
    vocabulary broadcast OOMs; AQE picks the strategy from measured
    sizes). The single driver scalar is |V| (same class as corpus
    counts elsewhere). Docs with <2 tokens have no bigrams and drop out
    — by construction, not by silent cap.

    Returns (id, n_bigrams, nll).
    """
    toks = tokens(text_col)
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    vocab = uni.count()
    bigrams = docs.filter(F.size(toks) >= 2).select(
        F.col(id_col), F.explode(word_ngrams_all(text_col, 2)).alias("bg")
    )
    bigc = bigrams.groupBy("bg").agg(F.count("*").alias("cbg"))
    scored = (
        bigrams.join(bigc, "bg")
        .withColumn("w", F.split(F.col("bg"), " ").getItem(0))
        .join(uni, "w")
        .select(
            id_col,
            F.log(
                (F.col("cbg") + F.lit(1.0)) / (F.col("cw") + F.lit(vocab))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(-F.avg("_lp"), 4).alias("nll"),
    )


def _q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs).orderBy("doc_id").limit(200)


_BIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), uni AS (
  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), voc AS (SELECT COUNT(*) AS v FROM uni),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> array_to_string(t[i:i+1], ' '))) AS bg
  FROM toks WHERE len(t) >= 2
), bigc AS (
  SELECT bg, COUNT(*) AS cbg FROM big GROUP BY bg
), scored AS (
  SELECT b.doc_id,
         ln((bigc.cbg + 1.0) / (uni.cw + voc.v)) AS lp
  FROM big b
  JOIN bigc ON b.bg = bigc.bg
  JOIN uni ON string_split(b.bg, ' ')[1] = uni.w
  CROSS JOIN voc
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, ROUND(-AVG(lp), 4) AS nll
FROM scored GROUP BY doc_id
ORDER BY doc_id LIMIT 200
"""


def duplicate_span_removal(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level dedup: REWRITE documents by deleting every
    repeated k-token span except its first occurrence — the span-removal
    family of published dedup pipelines (C4 drops repeated three-sentence
    spans; Lee et al. 2021 "Deduplicating Training Data Makes Language
    Models Better" deletes repeated 50-token substrings via a suffix
    array). Token-granular spans replace the suffix array: a suffix
    array is a sequential single-machine structure, while the k-gram
    occurrence relation shuffles on the gram key and scales like any
    aggregation.

    Deterministic semantics (identical in the DuckDB oracle):
    tokens are 1-indexed per doc; every k-token span occurrence is
    (doc, p, gram); occurrences of each gram are ranked by (doc_id, p);
    every occurrence ranked ≥ 2 marks its k covered token positions for
    removal; surviving tokens are rejoined with single spaces. Output:
    (id, n_tokens, n_removed, clean_text) — one row per input doc, a
    fully-deleted doc yields clean_text ''.

    Scale shape: posexplode → window over the gram (high-cardinality
    key, parallel) → position anti-join → per-doc rebuild groupBy.
    Every shuffle is keyed on gram or doc id; nothing is broadcast or
    driver-side. Rebuilding collects one doc's surviving tokens into an
    array — bounded by document length, the same per-row bound every
    text op here lives with.
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    tok_rows = base.select(
        id_col, F.posexplode("_t").alias("_pos0", "tok")
    ).select(id_col, (F.col("_pos0") + 1).alias("pos"), "tok")
    span_arr = F.when(
        F.size("_t") < k, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice("_t", i, k)),
        )
    )
    spans = base.select(id_col, F.posexplode(span_arr).alias("_p0", "gram")).select(
        id_col, (F.col("_p0") + 1).alias("p"), "gram"
    )
    w = Window.partitionBy("gram").orderBy(id_col, "p")
    rm = (
        spans.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") >= 2)
        .select(
            id_col,
            F.explode(F.sequence(F.col("p"), F.col("p") + (k - 1))).alias("pos"),
        )
        .distinct()
    )
    kept = tok_rows.join(rm, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select(id_col, F.size("_t").cast("bigint").alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0))).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def _q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        duplicate_span_removal(docs.filter(F.col("doc_id") < 200), k=3)
        .orderBy("doc_id")
    )


_SPAN_DEDUP_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t
  FROM documents WHERE doc_id < 200
), toks AS (
  SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, unnest(t) AS tok FROM base
), spans AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS p,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                               i -> array_to_string(t[i:i+2], ' '))) AS gram
  FROM base
), occ AS (
  SELECT doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
  FROM spans
), rm AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, unnest(range(p, p + 3)) AS pos FROM occ WHERE rn >= 2
  )
), kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok FROM toks tk
  WHERE NOT EXISTS (
    SELECT 1 FROM rm WHERE rm.doc_id = tk.doc_id AND rm.pos = tk.pos
  )
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
       CAST(len(b.t) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
ORDER BY b.doc_id
"""


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 1000,
    id_hint: int = 4,
) -> DataFrame:
    """EXACT frequent items (frequency > n/k) via Misra-Gries candidate
    pruning + exact recount — bounded memory at any corpus size.

    Why not a plain GROUP BY: at 10^11 tokens the full count table IS
    the shuffle. Misra-Gries guarantees every item with global
    freq > n/k survives a (k·overshoot)-counter summary of each
    partition (averaging argument: a globally-heavy item is locally
    heavy in at least one partition), so phase 1 produces a tiny
    candidate set with NO token shuffle; phase 2 recounts ONLY the
    candidates exactly (broadcast semi-join, then a candidate-sized
    aggregation). Result = exactly the items a full GROUP BY + HAVING
    would return, with both phases bounded by |candidates| ≈ k.

    The per-partition sketch is an Arrow-batched pandas pass (a
    documented exception like the dense-algebra UDFs: MG's
    decrement-all step is inherently imperative). ``id_hint`` sizes the
    summary at k·id_hint counters to absorb batch-boundary error.

    Returns (item, freq) for items with freq > total/k.
    """
    import pandas as pd

    cap = k * id_hint

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < cap:
                    counters[item] = 1
                else:
                    dead = [i for i in counters if counters[i] == 1]
                    for i in counters:
                        counters[i] -= 1
                    for i in dead:
                        del counters[i]
        if counters:
            yield pd.DataFrame({"item": list(counters.keys())})

    src = df.select(F.col(col))
    candidates = (
        src.mapInPandas(mg, "item string").select("item").distinct()
    )
    total = src.count()
    bar = total / k
    return (
        src.join(
            F.broadcast(candidates), src[col] == F.col("item"), "left_semi"
        )
        .groupBy(col)
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > bar)
        .select(F.col(col).alias("item"), "freq")
    )


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("w"))
    return heavy_hitters(toks, "w", k=100).orderBy(F.desc("freq"), "item")


_HEAVY_HITTERS_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
), n AS (SELECT COUNT(*) AS total FROM toks)
SELECT w AS item, CAST(COUNT(*) AS BIGINT) AS freq
FROM toks, n
GROUP BY w, n.total
HAVING COUNT(*) > n.total / 100.0
ORDER BY freq DESC, item
"""


def _q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        boilerplate_stats(docs, k=3, min_doc_frac=0.01)
        .orderBy("doc_id")
        .limit(200)
    )


_BOILERPLATE_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), gram_lists AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 1),
                                  i -> array_to_string(t[i:i+2], ' '))
              ELSE [array_to_string(t, ' ')] END AS gs
  FROM toks
), dfreq AS (
  SELECT g, COUNT(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM gram_lists)
  GROUP BY g
), boiler AS (
  SELECT g FROM dfreq
  WHERE df >= GREATEST(2, CAST(CEIL(0.01 * (SELECT COUNT(*) FROM documents)) AS BIGINT))
), occ AS (
  SELECT doc_id, unnest(gs) AS g FROM gram_lists
)
SELECT occ.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(boiler.g) AS BIGINT) AS n_boiler,
       ROUND(COUNT(boiler.g) / COUNT(*), 6) AS boiler_ratio
FROM occ LEFT JOIN boiler ON occ.g = boiler.g
GROUP BY occ.doc_id
ORDER BY occ.doc_id
LIMIT 200
"""


QUERIES["q39h_tfidf"] = QuerySpec(_q_tfidf, _TFIDF_ORACLE)
QUERIES["q39i_decontamination"] = QuerySpec(_q_decontamination, _DECONTAMINATION_ORACLE)
# bloom prefilter is exact (no false negatives + verify join) → same oracle
QUERIES["q39z_bloom_decontamination"] = QuerySpec(
    _q_bloom_decontamination, _DECONTAMINATION_ORACLE
)
QUERIES["q39j_pii_scan"] = QuerySpec(_q_pii_scan, _pii_oracle())
QUERIES["q39k_repetition"] = QuerySpec(_q_repetition, _REPETITION_ORACLE)
QUERIES["q39_word_count"] = QuerySpec(_q_word_count, _WORD_COUNT_ORACLE)
QUERIES["q39b_token_stats"] = QuerySpec(_q_token_stats, _TOKEN_STATS_ORACLE)
QUERIES["q39c_bpe_token_count"] = QuerySpec(_q_bpe_token_count, _BPE_ORACLE)
QUERIES["q39d_quality_score"] = QuerySpec(_q_quality, _QUALITY_ORACLE)
QUERIES["q39e_lang_id"] = QuerySpec(_q_lang_id, _lang_oracle())
QUERIES["q39f_fingerprint_md5"] = QuerySpec(_q_fingerprint, _FINGERPRINT_ORACLE)
QUERIES["q39g_minhash_sketch"] = QuerySpec(_q_minhash_sketch, None)  # no xxhash64 in DuckDB
QUERIES["q39p_boilerplate"] = QuerySpec(_q_boilerplate, _BOILERPLATE_ORACLE)
QUERIES["q39r_winnowing"] = QuerySpec(_q_winnowing, _WINNOWING_ORACLE)
QUERIES["q39s_bigram_lm"] = QuerySpec(_q_bigram_lm, _BIGRAM_LM_ORACLE)
QUERIES["q39t_heavy_hitters"] = QuerySpec(_q_heavy_hitters, _HEAVY_HITTERS_ORACLE)
QUERIES["q39w_span_dedup"] = QuerySpec(_q_span_dedup, _SPAN_DEDUP_ORACLE)
# iterative global-argmax training / learned-merge tokenization — no SQL
# oracle; equality-tested against a sequential reference implementation
# r9: rows-only → oracle upgrade. The exact-mode batched trainer is
# order-identical to sequential BPE, so both the merge table and the
# downstream token counts hash-match the 20-level unrolled-CTE replay.
QUERIES["q39x_bpe_train"] = QuerySpec(_q_bpe_train, _bpe_train_oracle())
QUERIES["q39y_bpe_tokenize"] = QuerySpec(_q_bpe_tokenize, _bpe_tokenize_oracle())


# --- frozen-merges tokenizer: pure JVM column expressions ------------------

_BPE_SEP_CHAR = "\x1f"


def load_frozen_bpe_merges(
    name: str = "bpe_merges_q39u",
) -> list[tuple[str, str]]:
    """Merge list from the committed tokenizer store — the BPE member
    of the frozen-quantizer family (`resources/bpe_merges_q39u.json`,
    trained once by ``bpe_train`` exact mode and versioned): a
    production pipeline tokenizes every corpus with the SAME released
    tokenizer, it never retrains per run."""
    import json as _json
    import os as _os

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "resources", f"{name}.json",
    )
    with open(path) as f:
        return [(a, b) for a, b in _json.load(f)["merges"]]


def bpe_token_count_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-word BPE token count under FROZEN merges as pure column
    expressions — no Python anywhere: the word's symbols ride as a
    ``\\x1f``-wrapped string and each merge is one ``replace`` (the
    delimiter-wrap trick from the q39x/q39y oracle, which proves the
    replace chain IS greedy left-to-right BPE application), so the
    whole tokenizer inlines into whole-stage codegen. This is the
    hot-path form: ``bpe_segment``'s Arrow UDF exists for IN-RUN
    learned merges, whose list Python built moments earlier anyway;
    with a released tokenizer the merges are literals and the JVM
    needs no round-trip. Count = delimiter count / 2 (each symbol
    carries exactly two)."""
    sep = _BPE_SEP_CHAR
    syms = _word_symbols(word)
    s = F.concat(F.lit(sep), F.array_join(syms, sep + sep), F.lit(sep))
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(sep + a + sep + sep + b + sep),
            F.lit(sep + a + b + sep),
        )
    return (
        (F.length(s) - F.length(F.replace(s, F.lit(sep), F.lit("")))) / 2
    ).cast("bigint")


def bpe_tokenize_counts_frozen(
    docs: DataFrame,
    merges: "list[tuple[str, str]] | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bpe_tokens) under the COMMITTED frozen merges — the same
    distinct-words → count → join-back shape as
    :func:`bpe_tokenize_counts` (the replace chain runs once per
    DISTINCT word, corpus rows only pay an equi-join), but with zero
    Python in the plan."""
    merges = merges if merges is not None else load_frozen_bpe_merges()
    words = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.col("w") != "")
    lut = (
        words.select("w")
        .distinct()
        .select("w", bpe_token_count_expr(F.col("w"), merges).alias("n_toks"))
    )
    return (
        words.join(lut, "w")
        .groupBy(id_col)
        .agg(F.sum("n_toks").alias("n_bpe_tokens"))
    )


def _q_bpe_tokenize_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return bpe_tokenize_counts_frozen(d).orderBy("doc_id").limit(200)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_tokenize_frozen_oracle() -> str:
    """The committed merges as literals — the replace chain alone, no
    train CTEs (contrast q39y, which replays training too)."""
    sep = _BPE_SEP
    s = _bpe_wrapped_expr("w")
    for a, b in load_frozen_bpe_merges():
        s = (
            f"replace({s}, {sep} || {_sql_quote(a)} || {sep} || {sep} || "
            f"{_sql_quote(b)} || {sep}, "
            f"{sep} || {_sql_quote(a + b)} || {sep})"
        )
    return f"""
WITH dwords AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w != ''
), lut AS MATERIALIZED (
  SELECT w,
         CAST((length(seg) - length(replace(seg, {sep}, ''))) / 2 AS BIGINT)
           AS n_toks
  FROM (SELECT w, {s} AS seg FROM (SELECT DISTINCT w FROM dwords))
)
SELECT doc_id, CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens
FROM dwords JOIN lut USING (w)
GROUP BY doc_id ORDER BY doc_id LIMIT 200
"""


QUERIES["q39u_bpe_tokenize_frozen"] = QuerySpec(
    _q_bpe_tokenize_frozen, _bpe_tokenize_frozen_oracle()
)


# ---------------------------------------------------------------------------
# Gopher-style quality rule bundle
# ---------------------------------------------------------------------------


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    stopwords: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with"),
    min_stopword_hits: int = 2,
    with_rules: bool = False,
) -> DataFrame:
    """Per-document quality features + keep verdict after the published
    Gopher filtering rules (Rae et al. 2021, §A1.1 — the de-facto
    standard heuristic bundle for web-corpus cleaning): word-count
    bounds, mean word length bounds, symbol-to-word ratio (#/ellipsis),
    minimum fraction of words containing an alphabetic character, and a
    minimum number of DISTINCT stopwords present (the "real prose"
    test). Rules are emitted as columns so downstream can audit which
    rule fired; ``keep`` is their conjunction.

    All row-local column expressions — zero shuffle, filter-pushdown
    friendly; mean word length uses the chars-minus-spaces identity
    (stays in codegen) rather than a per-token HOF fold.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    mean_len = (F.length(text_col) - (n - 1)) / n
    symbol_ratio = F.size(
        F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
    ) / n
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in stopwords])
        )
    )
    rules = {
        "pass_words": n.between(min_words, max_words),
        "pass_word_len": mean_len.between(min_mean_word_len, max_mean_word_len),
        "pass_symbols": symbol_ratio <= max_symbol_ratio,
        "pass_alpha": alpha_ratio >= min_alpha_ratio,
        "pass_stopwords": stop_hits >= min_stopword_hits,
    }
    keep = (
        rules["pass_words"]
        & rules["pass_word_len"]
        & rules["pass_symbols"]
        & rules["pass_alpha"]
        & rules["pass_stopwords"]
    )
    out = [
        F.col(id_col),
        n.cast("bigint").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("bigint").alias("stop_hits"),
        keep.alias("keep"),
    ]
    if with_rules:
        # opt-in per-rule verdicts (the curation-stats route aggregates
        # these); the default schema stays the q121 oracle contract
        out += [expr.alias(name) for name, expr in rules.items()]
    return df.select(*out)


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_stopword_hits=1: the synthetic corpus draws at most one of
    # the Gopher stopwords per doc, so the published default of 2 would
    # make ``keep`` constantly false — a verdict the oracle can't
    # discriminate. At 1, ~half the fixture passes and half fails.
    d = read_table(spark, sf_dir, "documents")
    return gopher_quality_flags(d, min_stopword_hits=1).orderBy("doc_id").limit(300)


_GOPHER_ORACLE = """
WITH t AS (
  SELECT doc_id,
         string_split(lower(text), ' ') AS toks,
         length(text) AS nc
  FROM documents
), f AS (
  SELECT doc_id,
         len(toks) AS n,
         (nc - (len(toks) - 1)) / len(toks) AS mean_len,
         len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...')))
           / len(toks) AS sym,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           / len(toks) AS alpha,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       ROUND(mean_len, 6) AS mean_word_len,
       ROUND(sym, 6) AS symbol_ratio,
       ROUND(alpha, 6) AS alpha_ratio,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       (n BETWEEN 50 AND 100000 AND mean_len BETWEEN 3.0 AND 10.0
        AND sym <= 0.1 AND alpha >= 0.8 AND stop_hits >= 1) AS keep
FROM f ORDER BY doc_id LIMIT 300
"""

QUERIES["q121_gopher_quality"] = QuerySpec(_q_gopher_quality, _GOPHER_ORACLE)


# ---------------------------------------------------------------------------
# text normalization (C4-style cleanup)
# ---------------------------------------------------------------------------


def normalize_text(col) -> "Column":
    """Canonical text form for dedup/fingerprint stability (the C4-ish
    cleanup pass): strip C0/C1 control characters, collapse every
    whitespace run to one space, trim, lowercase. Pure JVM regexp
    chain — row-local, codegen-fused, zero shuffle; appliable before
    any of the dedup/fingerprint family so byte-level noise (CRLF vs
    LF, tabs, doubled spaces) stops defeating exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, "[\\x00-\\x1f\\x7f-\\x9f]", " ")
    collapsed = F.regexp_replace(cleaned, "\\s+", " ")
    return F.lower(F.trim(collapsed))


def _q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            normalize_text("text").alias("norm"),
            F.md5(normalize_text("text")).alias("norm_fp"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


_TEXT_NORMALIZE_ORACLE = """
WITH n AS (
  SELECT doc_id,
         lower(trim(regexp_replace(
           regexp_replace(text, '[\\x00-\\x1f\\x7f-\\x9f]', ' ', 'g'),
           '\\s+', ' ', 'g'))) AS norm
  FROM documents
)
SELECT doc_id, norm, md5(norm) AS norm_fp
FROM n ORDER BY doc_id LIMIT 300
"""

QUERIES["q123_text_normalize"] = QuerySpec(_q_text_normalize, _TEXT_NORMALIZE_ORACLE)


def _q_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DROP half of decontamination as a driver-verified query:
    corpus ids surviving ``decontaminate`` (>= 2 shared 5-grams with
    any benchmark doc ⇒ dropped) — q39i verifies the overlap table,
    this verifies the anti-join built on it."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).withColumnRenamed(
        "doc_id", "bench_id"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return (
        decontaminate(corpus, bench, k=5, min_overlap=2)
        .select("doc_id")
        .orderBy("doc_id")
    )


_DECONTAMINATED_CORPUS_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(t) >= 5
                THEN list_transform(range(1, len(t) - 3),
                                    i -> array_to_string(t[i:i+4], ' '))
                ELSE [array_to_string(t, ' ')] END)) AS s
  FROM toks
), dirty AS (
  SELECT d.doc_id
  FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) d
  JOIN (SELECT * FROM sh WHERE doc_id % 97 = 0) b ON d.s = b.s
  GROUP BY d.doc_id
  HAVING COUNT(*) >= 2
)
SELECT doc_id FROM documents
WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
ORDER BY doc_id
"""

QUERIES["q124_decontaminated_corpus"] = QuerySpec(
    _q_decontaminated_corpus, _DECONTAMINATED_CORPUS_ORACLE
)


# ---------------------------------------------------------------------------
# Okapi BM25 ranking (Robertson/Spärck Jones; the standard lexical
# retrieval scorer — the reference's consumers run ad-hoc text search
# over replicated tables, readme.md:40-43 "Realtime analytics")
# ---------------------------------------------------------------------------


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) Okapi BM25 of each document against ``query_terms``.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene/+1 form, never
    negative), tf component = tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).

    Scale shape: one tokenize+explode scan feeds doc lengths AND the
    term-filtered tf table (localCheckpoint barrier, the standard
    CollapseProject guard).  ``query_terms`` is a bounded literal list,
    so tf is filtered DOWN to query terms before any shuffle — the
    groupBy aggregates |q| terms per doc, not the vocabulary; df for
    the |q| terms is a filtered aggregate of the same shape.  No
    vocabulary-sized broadcast anywhere (the r2 tf_idf lesson).  Docs
    containing no query term score 0 and are kept via a left join so
    the operator is a total ranking, not a filter.
    """
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    tok = docs.select(
        id_col, F.explode(tokens(text_col)).alias("term")
    ).localCheckpoint(eager=True)
    dl = tok.groupBy(id_col).agg(F.count("*").alias("dl"))
    hit = tok.filter(F.col("term").isin(terms))
    tf = hit.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_tbl = (
        hit.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n_docs = docs.count()
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    # scalar avgdl: one driver-side aggregate (same budget class as
    # tf_idf's n_docs count)
    avgdl_row = dl.agg(F.avg("dl")).first()[0]
    if avgdl_row is None:  # empty corpus: total ranking of nothing
        return docs.select(id_col, F.lit(0.0).alias("bm25"))
    avgdl = float(avgdl_row)
    # dl joins AFTER the term filter: |q|-term rows join doc lengths,
    # never the full token stream
    scored = (
        tf.join(df_tbl, "term")
        .join(dl, id_col)
        .select(
            id_col,
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("part"),
        )
        .groupBy(id_col)
        .agg(F.sum("part").alias("score"))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce(F.col("score"), F.lit(0.0)), 6).alias("bm25"),
        )
    )


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        bm25_scores(d, ["hash", "stream", "spark"])
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(100)
    )


_BM25_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), hit AS (
  SELECT * FROM tok WHERE term IN ('hash', 'stream', 'spark')
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM hit GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM hit) GROUP BY term
), consts AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl
), scored AS (
  SELECT tf.doc_id,
         SUM(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ) AS score
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN consts
  GROUP BY tf.doc_id
)
SELECT d.doc_id, ROUND(COALESCE(score, 0.0), 6) AS bm25
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
ORDER BY bm25 DESC, d.doc_id LIMIT 100
"""

QUERIES["q125_bm25"] = QuerySpec(_q_bm25, _BM25_ORACLE)


# ---------------------------------------------------------------------------
# PMI collocations (Church & Hanks 1990 — the standard association
# measure for finding multi-word expressions in a corpus; the phrase-
# mining pass a tokenizer/vocab pipeline runs before merging MWEs)
# ---------------------------------------------------------------------------


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(a, b, n_ab, pmi) for adjacent word pairs with
    PMI = ln( (c_ab/N_pairs) / ((c_a/N_words)·(c_b/N_words)) ).

    Scale shape: bigrams come from zipping each token array with its
    own tail — row-local, no per-token window shuffle; one scan feeds
    unigram counts, bigram counts, and both totals (localCheckpoint
    barrier).  The unigram join is vocabulary-sized so it carries NO
    broadcast hint (the r2 tf_idf lesson) — AQE broadcasts when small,
    sort-merges otherwise.  ``min_count`` prunes the bigram tail BEFORE
    the two unigram joins.
    """
    toks = docs.select(id_col, tokens(text_col).alias("t")).localCheckpoint(
        eager=True
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("a"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("b"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    # both scalars from ONE shuffle-free row-local aggregate (token and
    # pair totals are per-row array sizes — no need to re-run the
    # vocabulary groupBy, and one action instead of two)
    totals = toks.agg(
        F.sum(F.size("t")).alias("n_words"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("n_pairs"),
    ).first()
    if totals["n_words"] is None or not totals["n_pairs"]:
        # degenerate corpus (empty, or no doc has 2+ tokens): no pairs
        return bi.select("a", "b", "n_ab", F.lit(0.0).alias("pmi")).limit(0)
    n_words = float(totals["n_words"])
    n_pairs = float(totals["n_pairs"])
    ca = uni.select(F.col("w").alias("a"), F.col("c_w").alias("c_a"))
    cb = uni.select(F.col("w").alias("b"), F.col("c_w").alias("c_b"))
    return (
        bi.join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.lit(n_pairs))
                    / (
                        (F.col("c_a") / F.lit(n_words))
                        * (F.col("c_b") / F.lit(n_words))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return (
        pmi_collocations(d, min_count=5)
        .orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
        .limit(100)
    )


_PMI_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), uni AS (
  SELECT w, COUNT(*) AS c_w
  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
), bi AS (
  SELECT a, b, COUNT(*) AS n_ab FROM (
    SELECT t[i] AS a, t[i + 1] AS b
    FROM tok, unnest(range(1, len(t))) AS r(i)
  ) GROUP BY a, b
  HAVING COUNT(*) >= 5
), consts AS (
  SELECT (SELECT CAST(SUM(c_w) AS DOUBLE) FROM uni) AS n_words,
         (SELECT CAST(SUM(GREATEST(len(t) - 1, 0)) AS DOUBLE) FROM tok)
           AS n_pairs
)
SELECT bi.a, bi.b, n_ab,
       ROUND(ln((n_ab / n_pairs) /
                ((ca.c_w / n_words) * (cb.c_w / n_words))), 6) AS pmi
FROM bi
JOIN uni ca ON bi.a = ca.w
JOIN uni cb ON bi.b = cb.w
CROSS JOIN consts
ORDER BY pmi DESC, bi.a, bi.b LIMIT 100
"""

QUERIES["q128_pmi_collocations"] = QuerySpec(_q_pmi, _PMI_ORACLE)


# ---------------------------------------------------------------------------
# inverted-index export (the retrieval-side artifact BM25 consumes:
# term → document frequency + sorted posting list)
# ---------------------------------------------------------------------------


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(term, df, postings) — postings as a comma-joined sorted id
    string (engine-portable textual form).  One tokenize scan, one
    distinct, one groupBy on term.

    Skew note for 100 TB: a stop word's posting list is corpus-sized —
    real systems shard postings by (term, id-range) blocks.  Here
    ``min_df`` prunes the long TAIL (hapaxes) and the caller caps the
    HEAD by dropping stopword-frequency terms (df above a ceiling)
    before export; both are single filters on the df column.
    """
    pairs = docs.select(
        F.explode(tokens(text_col)).alias("term"), F.col(id_col).alias("_id")
    ).distinct()
    return (
        pairs.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(F.sort_array(F.collect_list("_id")), ",").alias(
                "postings"
            ),
        )
        .filter(F.col("df") >= min_df)
    )


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return inverted_index(d, min_df=5).orderBy("term")


_INVERTED_INDEX_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS term, doc_id
    FROM documents
  )
)
SELECT term, COUNT(*) AS df,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM pairs
GROUP BY term
HAVING COUNT(*) >= 5
ORDER BY term
"""

QUERIES["q135_inverted_index"] = QuerySpec(_q_inverted_index, _INVERTED_INDEX_ORACLE)


# ---------------------------------------------------------------------------
# CCNet-style perplexity-bucketed corpus selection
# ---------------------------------------------------------------------------


def perplexity_bucket_mix(
    docs: DataFrame,
    n_buckets: int = 3,
    keep_buckets: tuple[int, ...] = (1, 2),
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet selection recipe (Wenzek et al. 2020) as one composed
    operator: score every document with the corpus bigram LM
    (``bigram_lm_scores`` — the engine's perplexity proxy, q39s), split
    each LANGUAGE into ``n_buckets`` equal perplexity tiles
    (head = most fluent), and keep ``keep_buckets`` (CCNet's default
    drops the tail tier). Per-language tiling is the point: absolute
    NLL is not comparable across languages, so a global cut would
    silently empty the rarer ones.

    Docs with <2 tokens carry no bigram evidence and are excluded (by
    construction of the LM, not a silent cap — callers route them to a
    length filter instead). Returns (id, lang, nll, bucket) for kept
    docs.

    Scale shape = its parts: two partial-agg count tables + natural-key
    equi-joins from the LM, then ONE entity-keyed window (ntile over
    lang partitions — never a global sort). Buckets tie-break on id, so
    the tiling is deterministic and engine-portable on the ROUNDED nll
    the scorer emits.
    """
    scored = bigram_lm_scores(docs, id_col, text_col).join(
        docs.select(id_col, lang_col), id_col
    )
    win = Window.partitionBy(lang_col).orderBy(F.col("nll").asc(), F.col(id_col))
    tiled = scored.withColumn("bucket", F.ntile(n_buckets).over(win))
    return tiled.filter(F.col("bucket").isin(list(keep_buckets))).select(
        id_col, lang_col, "nll", "bucket"
    )


def _q_ccnet_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return perplexity_bucket_mix(docs).orderBy("doc_id")


_CCNET_MIX_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), uni AS (
  SELECT w, COUNT(*) AS cw FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), voc AS (SELECT COUNT(*) AS v FROM uni),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> array_to_string(t[i:i+1], ' '))) AS bg
  FROM toks WHERE len(t) >= 2
), bigc AS (
  SELECT bg, COUNT(*) AS cbg FROM big GROUP BY bg
), scored AS (
  SELECT b.doc_id,
         ln((bigc.cbg + 1.0) / (uni.cw + voc.v)) AS lp
  FROM big b
  JOIN bigc ON b.bg = bigc.bg
  JOIN uni ON string_split(b.bg, ' ')[1] = uni.w
  CROSS JOIN voc
), nlls AS (
  SELECT doc_id, ROUND(-AVG(lp), 4) AS nll FROM scored GROUP BY doc_id
), tiled AS (
  SELECT n.doc_id, d.lang, n.nll,
         NTILE(3) OVER (PARTITION BY d.lang ORDER BY n.nll ASC, n.doc_id)
           AS bucket
  FROM nlls n JOIN documents d ON d.doc_id = n.doc_id
)
SELECT doc_id, lang, nll, bucket FROM tiled
WHERE bucket IN (1, 2)
ORDER BY doc_id
"""

QUERIES["q145_ccnet_mix"] = QuerySpec(_q_ccnet_mix, _CCNET_MIX_ORACLE)


# ---------------------------------------------------------------------------
# q148: n-gram novelty — first-occurrence attribution
# ---------------------------------------------------------------------------


def ngram_novelty(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_shingles, n_novel, novelty): per document, the fraction
    of its DISTINCT k-shingles whose first corpus occurrence (minimum
    id in arrival order) is this document — "how much did this doc add
    that the corpus hadn't seen". Near-copies, quotes, and template
    pages all score ≈0 regardless of WHICH dedup family would catch
    them, which makes novelty the cheap one-pass triage signal ahead
    of the pairwise dedup operators, and a natural sampling weight
    (weight ∝ novelty keeps first sources and starves mirrors).

    Scale shape: one shingle-keyed partial agg (min over the corpus)
    and one id-keyed agg — two shuffles total, no joins against the
    corpus text, output exactly one row per doc.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, k)).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("doc").alias("first_doc"))
    return (
        sh.join(first, "s")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, k=3).orderBy("doc_id")


_NGRAM_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id AS doc,
         unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [array_to_string(t, ' ')] END)) AS s
  FROM toks
), first AS (
  SELECT s, MIN(doc) AS first_doc FROM sh GROUP BY s
)
SELECT sh.doc AS doc_id,
       COUNT(*) AS n_shingles,
       SUM((first.first_doc = sh.doc)::BIGINT)::BIGINT AS n_novel,
       ROUND(SUM((first.first_doc = sh.doc)::BIGINT)::DOUBLE / COUNT(*), 6)
         AS novelty
FROM sh JOIN first USING (s)
GROUP BY sh.doc
ORDER BY doc_id
"""

QUERIES["q148_ngram_novelty"] = QuerySpec(_q_ngram_novelty, _NGRAM_NOVELTY_ORACLE)


def incremental_novelty_apply(
    spark: SparkSession,
    new_docs: DataFrame,
    store_dir: str,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "tuple[DataFrame, dict]":
    """Arrival-order n-gram novelty as an ingest increment — the
    streaming form of :func:`ngram_novelty`, which is INHERENTLY
    incremental (novelty is defined by first occurrence in arrival
    order, so a batch's scores depend only on history + the batch).

    Store layout and commit reasoning (the containment-store pattern):

        shingles/  (s, first_doc) — the seen set with its attribution
        novelty/   (doc_id, n_shingles, n_novel, novelty)

    ``shingles/`` appends FIRST; a shingle's attribution rides with it,
    so a crash after the shingle append but before the novelty write
    replays safely: the doc's own id is the stored ``first_doc``, and
    HISTORY WINS (``coalesce(hist_first, batch_first)``) — a replayed
    doc's shingles still carry its own id in the store, so it counts
    them as novel, while a shingle any earlier arrival owns stays
    credited to that arrival. Duplicate (s, first_doc) rows from such
    replays cost storage, never correctness (reads take the min). Ids
    already in ``novelty/`` are replay no-ops.

    The union of every batch's novelty rows equals the batch operator
    on the cumulative corpus whenever ids are monotone with arrival
    (the CDC stream's event_index contract, O10); for out-of-order ids
    the incremental form keeps true ARRIVAL-order attribution — a
    later-arriving smaller id is NOT novel for a shingle history
    already owns (the stream semantics; r7 advice: the earlier
    ``least(batch_first, hist_first)`` form double-credited that
    shingle to both arrivals) — while the batch operator uses global
    min id (test-asserted equality under the monotone condition,
    divergence-by-design asserted for out-of-order ids).

    Returns (novelty_rows_for_fresh_docs, stats).
    """
    import os as _os

    # in-batch id dedup (see incremental_dedup_apply in operators.dedup):
    # a duplicate would double its shingle postings and emit two
    # novelty rows for one doc
    new_docs = new_docs.dropDuplicates([id_col])

    sh_dir = _os.path.join(store_dir, "shingles")
    nov_dir = _os.path.join(store_dir, "novelty")

    n_batch = new_docs.count()
    if _os.path.exists(nov_dir):
        done = spark.read.parquet(nov_dir).select(F.col(id_col))
        fresh = new_docs.join(done, id_col, "left_anti")
    else:
        fresh = new_docs
    sh = fresh.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, k)).alias("s"),
    ).localCheckpoint(eager=True)
    n_fresh = sh.select("doc").distinct().count()
    if n_fresh == 0:
        # schema derives from the caller's id column (name AND type) —
        # hardcoding "doc_id long" would break string-id callers on
        # exactly (and only) the replay path
        empty = (
            new_docs.select(F.col(id_col)).limit(0)
            .withColumn("n_shingles", F.lit(0).cast("long"))
            .withColumn("n_novel", F.lit(0).cast("long"))
            .withColumn("novelty", F.lit(0.0))
        )
        return empty, {"batch": n_batch, "replayed": n_batch, "appended": 0}

    batch_first = sh.groupBy("s").agg(F.min("doc").alias("batch_first"))
    if _os.path.exists(sh_dir):
        hist = (
            spark.read.parquet(sh_dir)
            .groupBy("s")
            .agg(F.min("first_doc").alias("hist_first"))
        )
        # history wins: attribution is arrival order, not min id — an
        # out-of-order smaller id must not steal (and double-credit) a
        # shingle already attributed. A replayed doc's own shingles
        # have hist_first == doc, so replay self-credit still works.
        first = batch_first.join(hist, "s", "left").select(
            "s",
            F.coalesce("hist_first", "batch_first").alias("first_doc"),
            F.col("hist_first").isNull().alias("_new"),
        )
        write_mode = "append"
    else:
        first = batch_first.select(
            "s",
            F.col("batch_first").alias("first_doc"),
            F.lit(True).alias("_new"),
        )
        write_mode = "errorifexists"
    first = first.localCheckpoint(eager=True)
    # shingle append FIRST (see commit reasoning above)
    first.filter("_new").select("s", "first_doc").write.mode(write_mode).parquet(
        sh_dir
    )
    novelty = (
        sh.join(first.select("s", "first_doc"), "s")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
        .localCheckpoint(eager=True)
    )
    novelty.write.mode("append" if _os.path.exists(nov_dir) else "errorifexists").parquet(
        nov_dir
    )
    return novelty, {
        "batch": n_batch,
        "replayed": n_batch - n_fresh,
        "appended": n_fresh,
    }


# ---------------------------------------------------------------------------
# q151: per-source curation scorecard
# ---------------------------------------------------------------------------


def source_scorecard(
    docs: DataFrame,
    k: int = 3,
    min_stopword_hits: int = 1,
) -> DataFrame:
    """(source, n_docs, keep_rate, avg_novelty, avg_words): the
    per-source dashboard a corpus operator watches — quality keep rate
    (Gopher rules), mean n-gram novelty (a mirror/near-copy source
    shows up as a novelty crater batches before corpus size moves),
    and mean length. Pure composition of the oracled interiors
    (``gopher_quality_flags`` + ``ngram_novelty``), so the whole
    scorecard stays hash-checked vs DuckDB.

    Scale shape: novelty's two shuffles + one row-local flags pass +
    one source-keyed agg (low cardinality — AQE coalesces it)."""
    flags = gopher_quality_flags(
        docs, min_stopword_hits=min_stopword_hits
    ).select("doc_id", "n_words", "keep")
    nov = ngram_novelty(docs, k=k).select("doc_id", "novelty")
    return (
        docs.select("doc_id", "source")
        .join(flags, "doc_id")
        .join(nov, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.col("keep").cast("double")), 6).alias("keep_rate"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
            F.round(F.avg("n_words"), 6).alias("avg_words"),
        )
    )


def _q_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return source_scorecard(docs).orderBy("source")


_SOURCE_SCORECARD_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         string_split(lower(text), ' ') AS toks,
         length(text) AS nc
  FROM documents
), f AS (
  SELECT doc_id, source,
         len(toks) AS n,
         (nc - (len(toks) - 1)) / len(toks) AS mean_len,
         len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...')))
           / len(toks) AS sym,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           / len(toks) AS alpha,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM t
), flags AS (
  SELECT doc_id, source, n,
         (n BETWEEN 50 AND 100000 AND mean_len BETWEEN 3.0 AND 10.0
          AND sym <= 0.1 AND alpha >= 0.8 AND stop_hits >= 1) AS keep
  FROM f
), sh AS (
  SELECT doc_id AS doc,
         unnest(list_distinct(
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> array_to_string(toks[i:i+2], ' '))
                ELSE [array_to_string(toks, ' ')] END)) AS s
  FROM t
), first AS (
  SELECT s, MIN(doc) AS first_doc FROM sh GROUP BY s
), nov AS (
  SELECT sh.doc AS doc_id,
         SUM((first.first_doc = sh.doc)::BIGINT)::DOUBLE / COUNT(*) AS novelty
  FROM sh JOIN first USING (s)
  GROUP BY sh.doc
)
SELECT flags.source,
       COUNT(*) AS n_docs,
       ROUND(AVG(flags.keep::DOUBLE), 6) AS keep_rate,
       ROUND(AVG(ROUND(nov.novelty, 6)), 6) AS avg_novelty,
       ROUND(AVG(flags.n), 6) AS avg_words
FROM flags JOIN nov USING (doc_id)
GROUP BY flags.source
ORDER BY flags.source
"""

QUERIES["q151_source_scorecard"] = QuerySpec(
    _q_source_scorecard, _SOURCE_SCORECARD_ORACLE
)


def bpe_segments_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-word BPE segmentation under FROZEN merges as a pure column
    expression: the same replace chain as :func:`bpe_token_count_expr`,
    but returning the token ARRAY (strip the outer delimiters, split on
    the double delimiter) instead of just its size — full-fidelity
    tokenization, still zero Python in the plan."""
    sep = _BPE_SEP_CHAR
    syms = _word_symbols(word)
    s = F.concat(F.lit(sep), F.array_join(syms, sep + sep), F.lit(sep))
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(sep + a + sep + sep + b + sep),
            F.lit(sep + a + b + sep),
        )
    return F.split(F.btrim(s, F.lit(sep)), sep + sep)


def _q_bpe_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary's full segmentation table under the committed
    frozen tokenizer — what an inspection/debug surface for a released
    tokenizer shows: every distinct corpus word, its token count, and
    the tokens themselves (joined with '|' so both engines hash one
    string column). One distinct pass + row-local expressions."""
    d = read_table(spark, sf_dir, "documents")
    merges = load_frozen_bpe_merges()
    words = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    toks = bpe_segments_expr(F.col("w"), merges)
    return (
        words.select(
            "w",
            F.size(toks).cast("bigint").alias("n_toks"),
            F.array_join(toks, "|").alias("toks"),
        )
        .orderBy("w")
        .limit(300)
    )


def _bpe_segments_oracle() -> str:
    sep = _BPE_SEP
    s = _bpe_wrapped_expr("w")
    for a, b in load_frozen_bpe_merges():
        s = (
            f"replace({s}, {sep} || {_sql_quote(a)} || {sep} || {sep} || "
            f"{_sql_quote(b)} || {sep}, "
            f"{sep} || {_sql_quote(a + b)} || {sep})"
        )
    return f"""
WITH dw AS MATERIALIZED (
  SELECT DISTINCT w FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w != ''
), seg AS (
  SELECT w, string_split(trim({s}, {sep}), {sep} || {sep}) AS l FROM dw
)
SELECT w, CAST(len(l) AS BIGINT) AS n_toks, array_to_string(l, '|') AS toks
FROM seg ORDER BY w LIMIT 300
"""


QUERIES["q158_bpe_segments"] = QuerySpec(_q_bpe_segments, _bpe_segments_oracle())


# ---------------------------------------------------------------------------
# Population Stability Index source drift (q163)
# ---------------------------------------------------------------------------

_PSI_BIN_WIDTH = 50  # n_chars histogram bucket width


def psi_source_drift(
    docs: DataFrame,
    feature_col: str = "n_chars",
    group_col: str = "source",
    bin_width: int = _PSI_BIN_WIDTH,
) -> DataFrame:
    """Per-source Population Stability Index of a document feature
    against the whole-corpus profile — the drift monitor a training-
    data pipeline runs per ingest source: PSI < 0.1 is stable, 0.1-0.25
    drifting, > 0.25 a source whose distribution no longer matches the
    corpus (re-weigh or investigate before it skews the mixture).

    PSI(s) = Σ_bins (p_b − q_b)·ln(p_b / q_b), p the source's binned
    feature distribution, q the corpus-wide one, both Laplace-smoothed
    (+1 per observed bin) so an empty source bin contributes a finite
    penalty instead of ±inf. Bins are fixed-width on the raw feature —
    no quantile fitting, so the binning is a map-side expression and
    the same bin means the same thing across sources and runs.

    Determinism: the per-bin terms are ratios of integers through one
    ln each; the SUM over bins folds a bin-ORDERED collected list
    (F.aggregate over sort_array), not a shuffle-order SUM, so the
    float addition order is pinned and the oracle replays it exactly
    (the _sql_exact_dot contract, applied to an aggregate). Scale
    shape: two partial-agg groupBys (source×bin, bin) on bounded keys,
    a broadcast of the ≤#bins global profile, and a per-source fold
    over ≤#bins elements — nothing touches raw rows twice."""
    b = docs.select(
        F.col(group_col).alias("source"),
        F.floor(F.col(feature_col) / bin_width).cast("long").alias("bin"),
    )
    gbins = b.groupBy("bin").agg(F.count("*").alias("cg"))
    scounts = b.groupBy("source", "bin").agg(F.count("*").alias("cs"))
    stotals = b.groupBy("source").agg(F.count("*").alias("ns"))
    totals = b.agg(
        F.count("*").alias("n_total"), F.count_distinct("bin").alias("n_bins")
    )
    grid = (
        stotals.crossJoin(F.broadcast(gbins))
        .crossJoin(F.broadcast(totals))
        .join(scounts, ["source", "bin"], "left")
        .fillna(0, subset=["cs"])
    )
    p = (F.col("cs") + 1) / (F.col("ns") + F.col("n_bins"))
    q = (F.col("cg") + 1) / (F.col("n_total") + F.col("n_bins"))
    terms = grid.select(
        "source",
        "ns",
        "bin",
        ((p - q) * F.log(p / q)).alias("term"),
    )
    return terms.groupBy("source").agg(
        F.max("ns").alias("n_docs"),
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("bin", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ),
            6,
        ).alias("psi_r"),
    )


def _q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return psi_source_drift(docs).orderBy("source")


_PSI_ORACLE = f"""
WITH b AS MATERIALIZED (
  SELECT source, CAST(floor(n_chars / {_PSI_BIN_WIDTH}) AS BIGINT) AS bin
  FROM documents
), gbins AS MATERIALIZED (
  SELECT bin, COUNT(*) AS cg FROM b GROUP BY bin
), scounts AS MATERIALIZED (
  SELECT source, bin, COUNT(*) AS cs FROM b GROUP BY source, bin
), stotals AS MATERIALIZED (
  SELECT source, COUNT(*) AS ns FROM b GROUP BY source
), totals AS MATERIALIZED (
  SELECT COUNT(*) AS n_total, COUNT(DISTINCT bin) AS n_bins FROM b
), grid AS MATERIALIZED (
  SELECT st.source, st.ns, g.bin, g.cg, COALESCE(sc.cs, 0) AS cs,
         t.n_total, t.n_bins
  FROM stotals st CROSS JOIN gbins g CROSS JOIN totals t
  LEFT JOIN scounts sc ON sc.source = st.source AND sc.bin = g.bin
), terms AS MATERIALIZED (
  SELECT source, ns, bin,
         (CAST(cs + 1 AS DOUBLE) / (ns + n_bins)
            - CAST(cg + 1 AS DOUBLE) / (n_total + n_bins))
         * ln((CAST(cs + 1 AS DOUBLE) / (ns + n_bins))
              / (CAST(cg + 1 AS DOUBLE) / (n_total + n_bins))) AS term
  FROM grid
)
SELECT source, MAX(ns) AS n_docs,
       ROUND(list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
                         (a, x) -> a + x), 6) AS psi_r
FROM terms
GROUP BY source
ORDER BY source
"""

QUERIES["q163_psi_drift"] = QuerySpec(_q_psi_drift, _PSI_ORACLE)
