"""Capture .explain("formatted") for headline queries into plans/r<N>/.

Usage:
    python tools/explain_capture.py before   # writes plans/r12/<q>_before.txt
    python tools/explain_capture.py after    # writes plans/r12/<q>_after.txt
    python tools/explain_capture.py after q16_tpch_q1 q52_tpch_q5   # subset

Planning-only (no job execution): the initial AQE plan is captured, which
is what the optimization evidence needs (Exchange count, join strategy,
PushedFilters/ReadSchema, WholeStageCodegen / Python-eval nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wing_binlog_go_spark.registry import all_queries
from wing_binlog_go_spark.session import get_spark

ROUND = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench

    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        ROUND,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    registry = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = spec.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
