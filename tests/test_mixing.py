"""Corpus mixing/sampling/packing properties (oracle parity is covered
for all four queries by tests/test_oracle.py; these pin the semantic
properties a training pipeline relies on)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.mixing import (
    sequence_pack,
    shuffle_rank,
    stratified_sample,
    token_budget_head,
)
from wing_binlog_go_spark.tables import read_table


def test_stratified_sample_is_deterministic_and_nested(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    low = {"en": 0.2, "fr": 0.1}
    high = {"en": 0.6, "fr": 0.4}
    s1 = {r.doc_id for r in stratified_sample(docs, "lang", low, seed=7).collect()}
    s2 = {r.doc_id for r in stratified_sample(docs, "lang", low, seed=7).collect()}
    assert s1 == s2  # reproducible
    bigger = {r.doc_id for r in stratified_sample(docs, "lang", high, seed=7).collect()}
    # raising rates only ADDS rows (same seed ⇒ same draws): resumable builds
    assert s1 <= bigger
    # a different seed draws a different sample (overwhelmingly likely)
    s3 = {r.doc_id for r in stratified_sample(docs, "lang", high, seed=8).collect()}
    assert s3 != bigger


def test_stratified_sample_rate_is_roughly_honored(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    n = docs.count()
    kept = stratified_sample(docs, "lang", {"en": 0.5}, seed=42).count()
    # binomial(n, .5): allow 4 sigma
    sigma = math.sqrt(n * 0.25)
    assert abs(kept - 0.5 * n) <= 4 * sigma + 1


def test_sequence_pack_matches_sequential_recompute(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = sequence_pack(docs, capacity=512).orderBy("lang", "doc_id").collect()
    seen_tokens: dict[str, int] = {}
    for r in out:
        start = seen_tokens.get(r.lang, 0)
        assert r.pack_id == start // 512, (r.doc_id, r.lang, start)
        seen_tokens[r.lang] = start + r.n_tokens
    # pack ids are dense per shard: every pack below the max is non-empty
    per_shard: dict[str, set] = {}
    for r in out:
        per_shard.setdefault(r.lang, set()).add(r.pack_id)
    for lang, packs in per_shard.items():
        assert packs == set(range(max(packs) + 1)), lang


def test_shuffle_rank_is_a_permutation_and_seeded(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    ranked = shuffle_rank(docs, seed=17).select("doc_id", "shuffle_pos").collect()
    positions = sorted(r.shuffle_pos for r in ranked)
    assert positions == list(range(1, n + 1))
    again = shuffle_rank(docs, seed=17).select("doc_id", "shuffle_pos").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in ranked} == {
        (r.doc_id, r.shuffle_pos) for r in again
    }
    other = shuffle_rank(docs, seed=18).select("doc_id", "shuffle_pos").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in ranked} != {
        (r.doc_id, r.shuffle_pos) for r in other
    }


def test_token_budget_head_is_maximal_prefix(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    budget = 5000
    kept = token_budget_head(docs, budget).collect()
    total = sum(r.n_tokens for r in kept)
    assert total <= budget
    assert max(r.cum_tokens for r in kept) == total
    # maximality: the highest-quality EXCLUDED doc would blow the budget.
    # Recompute the quality order driver-side and find the first excluded doc.
    toks = F.split(F.lower("text"), " ")
    scored = docs.select(
        "doc_id",
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("q"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    ).collect()
    kept_ids = {r.doc_id for r in kept}
    ordered = sorted(scored, key=lambda r: (-r.q, r.doc_id))
    for r in ordered:
        if r.doc_id not in kept_ids:
            assert total + r.n_tokens > budget
            break
    # the kept set is exactly the greedy prefix
    prefix = []
    acc = 0
    for r in ordered:
        if acc + r.n_tokens > budget:
            break
        acc += r.n_tokens
        prefix.append(r.doc_id)
    assert kept_ids == set(prefix)


def test_stratified_sample_rate_one_keeps_everything(spark, sf_dir):
    """Regression: a rate >= 1.0 stratum must keep every row. The naive
    9-hex-digit threshold sorts BELOW most 8-digit keys lexicographically
    ('100000000' < 'ffffffff'), which silently dropped ~94%."""
    docs = read_table(spark, sf_dir, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()
    kept = (
        stratified_sample(docs, "lang", {"en": 1.0}, seed=3)
        .filter(F.col("lang") == "en")
        .count()
    )
    assert kept == n_en
    # rate 0 drops everything in the stratum
    none = (
        stratified_sample(docs, "lang", {"en": 0.0}, seed=3)
        .filter(F.col("lang") == "en")
        .count()
    )
    assert none == 0


def test_sequence_pack_avoids_low_cardinality_window(spark, sf_dir):
    """Scale guard: the per-shard running total must NOT window on the
    raw low-cardinality shard column alone (one task per language at
    100 TB). The plan's window partition spec must include the range
    partition id, and the frame must be preceded by a
    repartitionbyrange-style exchange rather than a hash exchange on
    the shard column only."""
    docs = read_table(spark, sf_dir, "documents")
    plan = sequence_pack(docs, capacity=512)._jdf.queryExecution().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        part = spec.split("ORDER BY")[0] if "ORDER BY" in spec else spec
        assert "_pid" in part or "spark_partition_id" in part, spec


def test_with_running_total_partitioned_matches_pandas(spark, sf_dir):
    """Per-shard running totals from the range-partitioned two-phase
    pattern must equal a driver-side sequential cumsum per shard,
    including NULL shard keys (own group, not merged)."""
    import pandas as pd
    from pyspark.sql import functions as F2

    from wing_binlog_go_spark.functions.envelope import with_running_total

    pdf = pd.DataFrame(
        {
            "k": ["a", "b", None, "a", "b", None, "a", "c"],
            "i": [1, 2, 3, 4, 5, 6, 7, 8],
            "v": [10, 20, 30, 40, 50, 60, 70, 80],
        }
    )
    df = spark.createDataFrame(pdf)
    out = with_running_total(
        df, ["i"], F2.col("v"), out="run", partition_cols=["k"]
    ).collect()
    expect = {}
    acc: dict = {}
    for k, i, v in sorted(zip(pdf.k, pdf.i, pdf.v), key=lambda t: t[1]):
        key = None if pd.isna(k) else k
        acc[key] = acc.get(key, 0) + v
        expect[i] = acc[key]
    assert {r.i: r.run for r in out} == expect


def test_source_cap_caps_every_source_and_is_nested(spark, sf_dir):
    """Per-source frequency cap: no source exceeds the cap, sources at
    or under the cap pass through untouched, and a looser cap keeps a
    superset of a tighter one (same seed ⇒ same draw order — the
    resumable-build property shared with stratified_sample)."""
    from wing_binlog_go_spark.functions.mixing import source_cap

    docs = read_table(spark, sf_dir, "documents")
    before = {r.source: r.c for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    capped = source_cap(docs, 10, seed=7)
    after = {r.source: r.c for r in capped.groupBy("source").agg(F.count("*").alias("c")).collect()}
    for src, n in before.items():
        assert after.get(src, 0) == min(n, 10), src
    # full row width survives the semi-join
    assert set(capped.columns) == set(docs.columns)
    tight = {r.doc_id for r in source_cap(docs, 5, seed=7).select("doc_id").collect()}
    loose = {r.doc_id for r in capped.select("doc_id").collect()}
    assert tight <= loose
    # deterministic across runs
    again = {r.doc_id for r in source_cap(docs, 10, seed=7).select("doc_id").collect()}
    assert loose == again


def test_context_chunks_overlap_and_ragged_tail(spark):
    """q118 semantics: strided windows share window-stride tokens of
    overlap; a ragged tail < min_tokens is dropped unless it is the
    doc's only chunk."""
    from wing_binlog_go_spark.functions.mixing import context_chunks

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "a b"),  # shorter than min_tokens → still one chunk
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_no): (r.n_tokens, r.chunk)
        for r in context_chunks(docs, window=6, stride=4, min_tokens=3).collect()
    }
    # doc 1: starts at tokens 1, 5, 9 → chunks of 6, 6, 2; the 2-token
    # tail is < min_tokens and not the only chunk → dropped
    assert out[(1, 0)] == (6, "t0 t1 t2 t3 t4 t5")
    assert out[(1, 1)] == (6, "t4 t5 t6 t7 t8 t9")  # 2-token overlap
    assert (1, 2) not in out
    assert out[(2, 0)] == (2, "a b")
    assert set(out) == {(1, 0), (1, 1), (2, 0)}


def test_deterministic_split_stability_under_recarving(spark):
    """q120 contract: rows assigned to 'train' must keep that
    assignment when the later buckets are re-carved (0.8/0.1/0.1 →
    0.8/0.05/0.15), and the whole assignment is a pure function of
    (seed, id) — rerunning yields identical splits."""
    from wing_binlog_go_spark.functions.mixing import deterministic_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {
        r.doc_id: r.split
        for r in deterministic_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id"
        ).collect()
    }
    s2 = {
        r.doc_id: r.split
        for r in deterministic_split(
            docs, {"train": 0.8, "val": 0.05, "test": 0.15}, id_col="doc_id"
        ).collect()
    }
    train1 = {k for k, v in s1.items() if v == "train"}
    assert train1 == {k for k, v in s2.items() if v == "train"}
    # val shrank: every re-carved row moved val→test, never the reverse
    assert all(s2[k] == "test" for k, v in s1.items() if v == "test")
    moved = {k for k, v in s1.items() if v == "val" and s2[k] != "val"}
    assert all(s2[k] == "test" for k in moved)
    # deterministic across runs
    again = {
        r.doc_id: r.split
        for r in deterministic_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id"
        ).collect()
    }
    assert again == s1
    # roughly proportional
    from collections import Counter

    c = Counter(s1.values())
    assert 0.75 < c["train"] / 2000 < 0.85 and c["val"] + c["test"] < 0.3 * 2000

    import pytest

    with pytest.raises(ValueError):
        deterministic_split(docs, {"train": 0.5, "val": 0.1})


def test_export_sorted_shards_global_order_and_file_bounds(spark, tmp_path):
    """Files are individually <= max_records, and reading them back in
    lexicographic filename order yields the globally sorted corpus —
    without any single-partition global sort in the plan."""
    import os

    from wing_binlog_go_spark.functions.mixing import (
        export_sorted_shards,
        shuffle_rank,
    )

    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    ranked = shuffle_rank(docs, seed=9)
    out = str(tmp_path / "corpus")
    export_sorted_shards(
        ranked, out, order_col="shuffle_pos", n_shards=4, max_records_per_file=100
    )

    files = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    assert len(files) >= 10  # 1000 rows / 100-record bound
    seen = []
    for f in files:
        vals = [r.shuffle_pos for r in spark.read.parquet(f"{out}/{f}").collect()]
        assert len(vals) <= 100
        assert vals == sorted(vals)
        if seen and vals:
            assert seen[-1] < vals[0]  # cross-file order
        seen.extend(vals)
    assert seen == list(range(1, 1001))


def test_leakage_safe_split_keeps_pairs_together(spark, sf_small):
    """q141's whole point: no near-dup pair may straddle a split
    boundary, while the per-doc split (same seed) demonstrably does
    leak on clustered corpora — and train membership is stable under
    re-carving val/test (inherited from q120, at cluster grain)."""
    from wing_binlog_go_spark.functions.mixing import leakage_safe_split
    from wing_binlog_go_spark.operators.dedup import ngram_jaccard_pairs

    docs = read_table(spark, sf_small, "documents")
    assign = {
        r.doc_id: r.split for r in leakage_safe_split(docs).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, k=5, threshold=0.1).collect()
    ]
    assert pairs, "fixture must contain near-dup pairs"
    assert all(assign[a] == assign[b] for a, b in pairs)

    recarved = {
        r.doc_id: r.split
        for r in leakage_safe_split(
            docs, {"train": 0.8, "val": 0.05, "test": 0.15}
        ).collect()
    }
    train = {d for d, s in assign.items() if s == "train"}
    assert train == {d for d, s in recarved.items() if s == "train"}


def test_weighted_sample_matches_python_reference(spark, sf_small):
    """q142 is a pure function of (seed, id, weight): the chosen set
    must equal a hashlib reference of Efraimidis-Spirakis exactly."""
    import hashlib
    import math

    from wing_binlog_go_spark.functions.mixing import weighted_sample

    docs = read_table(spark, sf_small, "documents")
    rows = [(r.doc_id, r.n_chars) for r in docs.select("doc_id", "n_chars").collect()]

    def key(doc_id, w):
        h = int(hashlib.md5(f"42:{doc_id}".encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 2**32) / w

    want = {
        d for d, _ in sorted(
            ((d, w) for d, w in rows if w and w > 0),
            key=lambda t: (-key(*t), t[0]),
        )[:25]
    }
    got = {r.doc_id for r in weighted_sample(docs, 25, "n_chars").collect()}
    assert got == want
    # reproducible across runs
    again = {r.doc_id for r in weighted_sample(docs, 25, "n_chars").collect()}
    assert again == got


def test_weighted_sample_is_proportional_to_size(spark):
    """Heavy rows (weight 100) must be drawn far more often than light
    rows (weight 1) across independent seeds — the E-S guarantee."""
    from wing_binlog_go_spark.functions.mixing import weighted_sample

    data = [(i, 100 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(data, "doc_id long, w long")
    heavy = light = 0
    for seed in range(8):
        picked = {
            r.doc_id for r in weighted_sample(df, 50, "w", seed=seed).collect()
        }
        heavy += sum(1 for d in picked if d < 50)
        light += sum(1 for d in picked if d >= 50)
    # 50 heavy rows carry 5000/5450 of the mass; expect the large
    # majority of 400 draws to be heavy (binomial noise-safe margin)
    assert heavy > 4 * light


def test_weighted_sample_plan_is_topk_not_global_sort(spark, sf_small):
    """The scale claim: global top-k must compile to
    TakeOrderedAndProject, never a full Sort + Limit of the corpus."""
    from wing_binlog_go_spark.functions.mixing import weighted_sample

    docs = read_table(spark, sf_small, "documents")
    plan = weighted_sample(docs, 25, "n_chars")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_webdataset_export_roundtrip_and_determinism(spark, tmp_path):
    """Tar shards hold every sample exactly once as adjacent members
    keyed by id (binary as-is, text utf-8, struct as JSON), keys sorted
    within a shard, and a re-export is byte-identical."""
    import hashlib
    import tarfile

    from wing_binlog_go_spark.functions.mixing import export_webdataset_shards

    rows = [
        (i, bytes([i % 251]) * (10 + i), f"text-{i}", {"lang": "en", "n": str(i)})
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, img binary, text string, meta map<string,string>"
    )
    out = tmp_path / "wds"
    export_webdataset_shards(
        df, str(out), {"bin": "img", "txt": "text", "json": "meta"}, n_shards=4
    )
    seen = {}
    for shard in sorted(out.glob("shard-*.tar")):
        with tarfile.open(shard) as t:
            names = t.getnames()
            keys = [n.rsplit(".", 1)[0] for n in names]
            # members of one sample are adjacent; keys ascend
            uniq = sorted(set(keys), key=keys.index)
            assert uniq == sorted(uniq, key=str)
            for n in names:
                seen[n] = t.extractfile(n).read()
    for i, img, text, meta in rows:
        assert seen[f"{i}.bin"] == img
        assert seen[f"{i}.txt"] == text.encode()
        assert b'"lang": "en"' in seen[f"{i}.json"]
    assert len(seen) == 120  # 40 samples x 3 members, exactly once

    out2 = tmp_path / "wds2"
    export_webdataset_shards(
        df, str(out2), {"bin": "img", "txt": "text", "json": "meta"}, n_shards=4
    )
    h = lambda p: hashlib.md5(p.read_bytes()).hexdigest()
    assert sorted((p.name, h(p)) for p in out.glob("*.tar")) == sorted(
        (p.name, h(p)) for p in out2.glob("*.tar")
    )


def test_weighted_sample_per_group_matches_reference_and_caps(spark, sf_small):
    """q144: per-group chosen sets equal the hashlib reference of
    per-stratum E-S top-k; no group exceeds k."""
    import hashlib
    import math

    from wing_binlog_go_spark.functions.mixing import weighted_sample_per_group

    docs = read_table(spark, sf_small, "documents")
    rows = [
        (r.lang, r.doc_id, r.n_chars)
        for r in docs.select("lang", "doc_id", "n_chars").collect()
    ]

    def key(doc_id, w):
        h = int(hashlib.md5(f"42:{doc_id}".encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 2**32) / w

    want = set()
    langs = {g for g, _, _ in rows}
    for g in langs:
        members = [(d, w) for gg, d, w in rows if gg == g and w and w > 0]
        members.sort(key=lambda t: (-key(*t), t[0]))
        want |= {(g, d) for d, _ in members[:10]}
    got = {
        (r.lang, r.doc_id)
        for r in weighted_sample_per_group(
            docs, 10, "n_chars", "lang"
        ).collect()
    }
    assert got == want
    from collections import Counter

    per = Counter(g for g, _ in got)
    assert all(c <= 10 for c in per.values()) and len(per) == len(langs)


def test_weighted_sample_hypothesis_vs_reference(spark):
    """Hypothesis sweep: random (id, weight) tables and k values — the
    Spark top-k set equals the hashlib/math reference every time (the
    cross-engine draw has no float-boundary pathologies)."""
    import hashlib
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from wing_binlog_go_spark.functions.mixing import weighted_sample

    row = st.tuples(
        st.integers(0, 10_000), st.integers(-2, 10_000)
    )

    @given(rows=st.lists(row, min_size=1, max_size=40, unique_by=lambda t: t[0]),
           k=st.integers(1, 12), seed=st.integers(0, 5))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows, k, seed):
        df = spark.createDataFrame(rows, "doc_id long, w long")

        def key(doc_id, w):
            h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16)
            return math.log((h + 0.5) / 2**32) / w

        eligible = [(d, w) for d, w in rows if w > 0]
        want = {
            d for d, _ in sorted(eligible, key=lambda t: (-key(*t), t[0]))[:k]
        }
        got = {r.doc_id for r in weighted_sample(df, k, "w", seed=seed).collect()}
        assert got == want

    check()
