"""Unified ANN recall audit → one per-round artifact (RECALL_r0N.json).

Round-5 verdict ask #6: the recall evidence for the approximate
regimes (hyperplane LSH, IVF, PQ/ADC, IVF-PQ) lived across several
tests; this module computes ALL of it in one place so a single test
can gate it AND record a trendable artifact next to BENCH_r0N.json.

Two evidence sets per regime:

- ``registered``: the exact configurations the driver runs rows-only
  (q38b/d/f/i), measured as recall@5 against q38's exact brute force
  on the fixture ``embeddings`` table at both test scales.
- ``zipf``: a seeded synthetic with Zipf cluster masses (the 100×
  shape — one mode holds ~30% of the mass, tail clusters are tiny,
  which is where coarse quantizers under-allocate and fixed probe
  budgets starve tail queries), measured as recall@10 avg AND min
  with the documented auto-tuner escalation; the CONVERGED parameters
  are recorded so a regression shows up as a parameter jump even
  before recall drops.
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
from pyspark.sql import SparkSession

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

#: regime → escalation ladder tried in order until avg ≥ 0.95 and
#: min ≥ 0.9 on the Zipf fixture (the measured auto-tuner behavior
#: documented in the q38 docstrings)
_ZIPF_LADDERS = {
    "ivf": [{"n_probe": 2}, {"n_probe": 4}, {"n_probe": 8}],
    "pq": [{"refine": 100}, {"refine": 200}, {"refine": 400}],
    "ivfpq": [
        {"n_probe": 4, "refine": 100},
        {"n_probe": 8, "refine": 200},
        {"n_probe": 12, "refine": 400},
    ],
    "lsh": [
        {"n_bits": 3, "n_tables": 16},
        {"n_bits": 3, "n_tables": 32},
        {"n_bits": 2, "n_tables": 32},
    ],
}


def per_query_recall(exact_rows, approx_rows) -> tuple[float, float]:
    """(avg, min) per-query recall of ``approx_rows`` against
    ``exact_rows`` (both [(query_id, vec_id, ...)] row lists)."""
    es: dict = {}
    asets: dict = {}
    for r in exact_rows:
        es.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx_rows:
        asets.setdefault(r.query_id, set()).add(r.vec_id)
    per = [len(es[q] & asets.get(q, set())) / len(es[q]) for q in es]
    return sum(per) / len(per), min(per)


def zipf_fixture(spark: SparkSession, seed: int = 17, dim: int = 64,
                 n_modes: int = 16, n_total: int = 2000):
    """(corpus, queries): overlapping Gaussian modes with Zipf masses
    (591..36 points at the defaults) and two queries per mode so the
    starved tail is always probed."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, (n_modes, dim)) * 1.5
    w = 1.0 / np.arange(1, n_modes + 1)
    sizes = np.maximum(1, (w / w.sum() * n_total).astype(int))
    rows, qrows, vid = [], [], 0
    for c in range(n_modes):
        for _ in range(sizes[c]):
            v = centers[c] + rng.normal(0, 1.0, dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        for j in range(2):
            v = centers[c] + rng.normal(0, 1.0, dim)
            qrows.append((10_000 + c * 10 + j, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"]).localCheckpoint()
    queries = spark.createDataFrame(qrows, ["query_id", "embedding"])
    return corpus, queries


def _zipf_regime(corpus, queries, exact_rows, regime: str, k: int = 10):
    """Escalate the regime's ladder until the tail holds; returns
    {recall_avg, recall_min, params, escalations}."""
    from wing_binlog_go_spark.operators.similarity import (
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )

    runners = {
        "lsh": lambda p: lsh_topk(corpus, queries, k=k, **p),
        "ivf": lambda p: ivf_topk(corpus, queries, k=k, n_centroids=16, **p),
        "pq": lambda p: pq_topk(corpus, queries, k=k, m=16, **p),
        "ivfpq": lambda p: ivfpq_topk(
            corpus, queries, k=k, n_centroids=16, m=16, **p
        ),
    }
    avg = low = 0.0
    params: dict = {}
    steps = 0
    for params in _ZIPF_LADDERS[regime]:
        steps += 1
        approx = runners[regime](params).collect()
        avg, low = per_query_recall(exact_rows, approx)
        if avg >= 0.95 and low >= 0.9:
            break
    return {
        "recall_avg": round(avg, 4),
        "recall_min": round(low, 4),
        "params": params,
        "escalations": steps,
    }


def ann_recall_report(spark: SparkSession, k_zipf: int = 10) -> dict:
    """The full audit: registered-config recall@5 at both scales plus
    Zipf-skew recall@10 per regime."""
    from wing_binlog_go_spark.operators.similarity import brute_force_topk
    from wing_binlog_go_spark.registry import all_queries

    qs = all_queries()
    registered = {}
    for scale in SCALES:
        exact = qs["q38_ann_brute_force"].spark(spark, scale).collect()
        for key, name in (
            ("lsh", "q38b_ann_lsh"),
            ("ivf", "q38d_ann_ivf"),
            ("pq", "q38f_ann_pq"),
            ("ivfpq", "q38i_ann_ivfpq"),
        ):
            approx = qs[name].spark(spark, scale).collect()
            avg, low = per_query_recall(exact, approx)
            registered[f"{key}@{os.path.basename(scale)}"] = {
                "recall_avg": round(avg, 4),
                "recall_min": round(low, 4),
                "k": 5,
                "query": name,
            }

    corpus, queries = zipf_fixture(spark)
    exact = brute_force_topk(corpus, queries, k=k_zipf).collect()
    zipf = {
        regime: _zipf_regime(corpus, queries, exact, regime, k=k_zipf)
        for regime in ("lsh", "ivf", "pq", "ivfpq")
    }
    return {
        "registered_at_k5": registered,
        "zipf_skew_at_k10": zipf,
        "incremental_store_at_k5": {
            "ivfpq@sf0.01": _incremental_store_recall(spark)
        },
        "knn_graph_at_k5": {"sf0.01": _knn_graph_recall(spark)},
    }


def _knn_graph_recall(spark: SparkSession, k: int = 5) -> dict:
    """Per-node recall of the LSH-bucketed kNN graph (r7) vs the exact
    neighbor lists on the fixture embeddings — the graph form has no
    bounded query side to broadcast, so its recall is a separate
    evidence row from lsh_topk's."""
    from pyspark.sql import functions as F

    from wing_binlog_go_spark.operators.similarity import (
        brute_force_topk,
        knn_graph,
    )
    from wing_binlog_go_spark.tables import read_table

    emb = read_table(spark, SCALES[1], "embeddings")
    # n_tables=32 measured min-recall 1.0 on the fixture (16 sat at 0.6
    # worst-node — the same per-query floor the PQ regime was held to)
    params = {"n_bits": 3, "n_tables": 32}
    got: dict = {}
    for r in knn_graph(emb, k=k, **params).collect():
        got.setdefault(r.src, set()).add(r.dst)
    # brute_force_topk already excludes self-matches, so k=k IS the
    # exact neighbor list — capping a k+1 call by collect() arrival
    # order would depend on row order, which is not a contract
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    want: dict = {}
    for r in brute_force_topk(emb, q, k=k).collect():
        want.setdefault(r.query_id, set()).add(r.vec_id)
    per = [len(want[s] & got.get(s, set())) / len(want[s]) for s in want]
    return {
        "recall_avg": round(sum(per) / len(per), 4),
        "recall_min": round(min(per), 4),
        "k": k,
        "params": params,
    }


def _incremental_store_recall(spark: SparkSession, k: int = 5) -> dict:
    """Recall through the INCREMENTALLY built IVF-PQ store (r6): train
    quantizers on the first half of the fixture embeddings, append the
    second half against the frozen pair, query via the loaded index.
    Quantizers trained on an increment assign later arrivals slightly
    worse — wider probes/refine are the documented compensation lever,
    and this row trends whether that lever keeps holding."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from wing_binlog_go_spark.operators.similarity import (
        brute_force_topk,
        incremental_ivfpq_index_apply,
        ivfpq_topk,
        load_ivfpq_index,
    )
    from wing_binlog_go_spark.tables import read_table

    emb = read_table(spark, SCALES[1], "embeddings").select("vec_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="ivfpq_recall_")
    try:
        incremental_ivfpq_index_apply(
            spark, emb.filter(F.col("vec_id") < 250), tmp, m=16
        )
        incremental_ivfpq_index_apply(
            spark, emb.filter(F.col("vec_id") >= 250), tmp, m=16
        )
        idx = load_ivfpq_index(spark, tmp)
        q = (
            emb.orderBy("vec_id").limit(10)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        exact = brute_force_topk(emb, q, k=k).collect()
        approx = ivfpq_topk(
            None, q, k=k, n_probe=14, refine=150, index=idx
        ).collect()
        avg, low = per_query_recall(exact, approx)
        return {
            "recall_avg": round(avg, 4),
            "recall_min": round(low, 4),
            "k": k,
            "params": {"n_probe": 14, "refine": 150, "m": 16},
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def current_round(repo_root: str = "/root/repo") -> int:
    """This build round = latest driver CORRECTNESS round + 1 (the
    driver writes its artifact at round end, after ours)."""
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(rounds) if rounds else 0) + 1


def write_recall_artifact(report: dict, repo_root: str = "/root/repo") -> str:
    path = os.path.join(repo_root, f"RECALL_r{current_round(repo_root):02d}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    return path
