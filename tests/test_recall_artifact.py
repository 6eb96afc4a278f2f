"""The per-round ANN recall artifact (r5 verdict ask #6): ONE test
computes every regime's recall evidence through the shared audit
module, gates it (≥ 0.9 everywhere), and records RECALL_r0N.json so
recall trends round-over-round like BENCH does.

The legacy per-test gates (two-scale registered configs, Zipf-skew
escalation) remain in test_dedup_similarity.py as fast-feedback
checks; this is the artifact of record."""

from __future__ import annotations

import json
import os

from wing_binlog_go_spark.operators.recall_audit import (
    ann_recall_report,
    write_recall_artifact,
)


def test_recall_report_gates_every_regime_and_writes_artifact(spark):
    report = ann_recall_report(spark)

    reg = report["registered_at_k5"]
    assert len(reg) == 8  # 4 regimes × 2 scales
    for key, row in reg.items():
        assert row["recall_avg"] >= 0.9, f"{key}: {row}"
        # r6 verdict #3: no regime may sit below a 0.8 per-query floor
        # (plain PQ's refine=60 registered form measured min 0.6 at
        # sf0.001; refine=100 restored the floor).
        assert row["recall_min"] >= 0.8, f"{key}: {row}"

    zipf = report["zipf_skew_at_k10"]
    assert set(zipf) == {"lsh", "ivf", "pq", "ivfpq"}
    for regime, row in zipf.items():
        assert row["recall_avg"] >= 0.95 and row["recall_min"] >= 0.9, (
            f"{regime} under Zipf skew: {row}"
        )

    inc = report["incremental_store_at_k5"]["ivfpq@sf0.01"]
    assert inc["recall_avg"] >= 0.9, inc

    kg = report["knn_graph_at_k5"]["sf0.01"]
    assert kg["recall_avg"] >= 0.9 and kg["recall_min"] >= 0.8, kg

    path = write_recall_artifact(report)
    assert os.path.exists(path)
    on_disk = json.load(open(path))
    assert on_disk == json.loads(json.dumps(report))
